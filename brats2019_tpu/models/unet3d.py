"""3D U-Net encoder-decoder (SURVEY.md C7).

Capability parity with the reference's cascade stage network
(arXiv:1810.04008 [P]; BASELINE.json:5: conv3d blocks, fused
InstanceNorm+activation, trilinear up/downsampling, skip connections,
4-channel input, softmax over tumor classes) — designed TPU-first:

* NDHWC layout, bf16 compute / fp32 params (MXU-friendly)
* trilinear (average-pool) downsample + trilinear upsample (N3) instead of
  max-pool/transposed conv — matches the reference capability and lowers to
  clean fused XLA
* static shapes everywhere; the model jits once per patch size
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import downsample2x, upsample2x
from .blocks import ConvNormAct, DoubleConv


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    num_classes: int = 4
    levels: int = 4                  # number of encoder levels incl. top
    base_features: int = 16
    max_features: int = 256
    activation: str = "relu"
    compute_dtype: str = "bfloat16"  # "bfloat16" | "float32"

    def feats(self, level: int) -> int:
        return min(self.base_features * (2 ** level), self.max_features)

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    @property
    def min_spatial(self) -> int:
        """Input spatial dims must be divisible by this."""
        return 2 ** (self.levels - 1)


class UNet3D(nn.Module):
    """Encoder-decoder with skip connections; returns logits (N,D,H,W,K)."""

    config: UNetConfig = UNetConfig()

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dt = cfg.dtype
        x = x.astype(dt)

        # encoder
        skips = []
        for lvl in range(cfg.levels):
            x = DoubleConv(
                cfg.feats(lvl), activation=cfg.activation, compute_dtype=dt
            )(x)
            if lvl < cfg.levels - 1:
                skips.append(x)
                x = downsample2x(x)

        # decoder
        for lvl in reversed(range(cfg.levels - 1)):
            x = upsample2x(x)
            x = jnp.concatenate([x, skips[lvl].astype(dt)], axis=-1)
            x = DoubleConv(
                cfg.feats(lvl), activation=cfg.activation, compute_dtype=dt
            )(x)

        # 1x1x1 head -> logits in fp32 (softmax/loss stability)
        logits = nn.Conv(
            cfg.num_classes,
            kernel_size=(1, 1, 1),
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="head",
        )(x.astype(jnp.float32))
        return logits
