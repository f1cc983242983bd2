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

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import downsample2x, upsample2x
from .blocks import DoubleConv


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    num_classes: int = 4
    levels: int = 4                  # number of encoder levels incl. top
    base_features: int = 16
    max_features: int = 256
    activation: str = "relu"
    compute_dtype: str = "bfloat16"  # "bfloat16" | "float32"
    # TPU-first stem: space-to-depth by this factor before the first conv
    # (and sub-pixel depth-to-space at the head). Trades spatial extent for
    # channel width so no conv runs below MXU-efficient channel counts —
    # measured on v5e: 32ch convs reach 12 TFLOP/s, 128ch 104, 256ch 169
    # (PERF.md). 1 = plain reference-parity topology.
    stem_downsample: int = 1
    # deep supervision: auxiliary 1x1x1 heads on the decoder levels above
    # the top (nnU-Net-style, arXiv:1809.10486 / 2110.03352) — emitted only
    # when called with deep_outputs=True (training); inference unchanged
    deep_supervision: bool = False
    # rematerialize the DoubleConv blocks of the first N (highest-res)
    # levels during backprop. Whole-apply remat LOSES at every batch size
    # (PERF.md "Remat A/B") — this SELECTIVE knob targets only the levels
    # whose activations dominate the backward working set, aiming to lift
    # the b>1 HBM cliff without paying recompute on the cheap deep levels.
    remat_levels: int = 0

    def feats(self, level: int) -> int:
        return min(self.base_features * (2 ** level), self.max_features)

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    @property
    def min_spatial(self) -> int:
        """Input spatial dims must be divisible by this."""
        return self.stem_downsample * 2 ** (self.levels - 1)


def space_to_depth(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(N, D, H, W, C) -> (N, D/r, H/r, W/r, C*r^3); free layout shuffle."""
    n, d, h, w, c = x.shape
    x = x.reshape(n, d // r, r, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(n, d // r, h // r, w // r, c * r * r * r)


def depth_to_space(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(N, D, H, W, C*r^3) -> (N, D*r, H*r, W*r, C); inverse of the above."""
    n, d, h, w, c2 = x.shape
    c = c2 // (r * r * r)
    x = x.reshape(n, d, h, w, r, r, r, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(n, d * r, h * r, w * r, c)


class UNet3D(nn.Module):
    """Encoder-decoder with skip connections; returns logits (N,D,H,W,K).

    With ``stem_downsample=r>1``, the input is space-to-depth'd by r before
    the first conv and the head emits ``num_classes * r^3`` channels followed
    by depth-to-space (sub-pixel head) — full-resolution logits with every
    conv at MXU-efficient widths.
    """

    config: UNetConfig = UNetConfig()

    @nn.compact
    def __call__(self, x, deep_outputs: bool = False, subpixel: bool = True):
        """``subpixel=False`` returns the PRE-depth-to-space head output
        (N, D/r, H/r, W/r, K*r^3) when ``stem_downsample=r>1`` — the
        inference reduce path consumes this directly: softmax/TTA-unflip/
        mean/argmax over the r^3-block channel structure are pure
        permutation algebra on d2s, and running them at low resolution on
        a 32-channel-minor tensor is ~8x cheaper on the VPU than the same
        ops on the (...,4)-minor full-res tensor (PERF.md round 3)."""
        cfg = self.config
        dt = cfg.dtype
        x = x.astype(dt)
        r = cfg.stem_downsample
        if r > 1:
            x = space_to_depth(x, r)

        # remat wrapping must keep the auto-naming sequence (DoubleConv_N)
        # so checkpoints trained with any remat_levels stay interchangeable
        blk_idx = 0

        def block(lvl, feats, x):
            nonlocal blk_idx
            cls = nn.remat(DoubleConv) if lvl < cfg.remat_levels else DoubleConv
            x = cls(
                feats, activation=cfg.activation, compute_dtype=dt,
                name=f"DoubleConv_{blk_idx}",
            )(x)
            blk_idx += 1
            return x

        # encoder
        skips = []
        for lvl in range(cfg.levels):
            x = block(lvl, cfg.feats(lvl), x)
            if lvl < cfg.levels - 1:
                skips.append(x)
                x = downsample2x(x)

        # decoder (collect per-level features for deep supervision)
        aux_logits = []
        for lvl in reversed(range(cfg.levels - 1)):
            x = upsample2x(x)
            x = jnp.concatenate([x, skips[lvl].astype(dt)], axis=-1)
            x = block(lvl, cfg.feats(lvl), x)
            if cfg.deep_supervision and deep_outputs and lvl > 0:
                aux = nn.Conv(
                    cfg.num_classes,
                    kernel_size=(1, 1, 1),
                    dtype=jnp.float32,
                    param_dtype=jnp.float32,
                    name=f"aux_head_{lvl}",
                )(x.astype(jnp.float32))
                aux_logits.append(aux)

        # head -> logits in fp32 (softmax/loss stability); sub-pixel when r>1
        logits = nn.Conv(
            cfg.num_classes * r ** 3,
            kernel_size=(1, 1, 1),
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="head",
        )(x.astype(jnp.float32))
        if r > 1 and subpixel:
            logits = depth_to_space(logits, r)
        if cfg.deep_supervision and deep_outputs:
            return logits, aux_logits
        return logits
