"""3D conv building blocks (SURVEY.md C7, N1, N2).

Layout is NDHWC throughout: channels ride the TPU's 128-lane minor dimension
and ``lax.conv_general_dilated`` with ('NDHWC','DHWIO','NDHWC') lowers to
XLA:TPU conv3d that tiles onto the MXU (N1, BASELINE.json:5 "lowers to XLA
conv3d"). Normalization+activation is the fused instance-norm op (N2).

Mixed precision: parameters are stored fp32; ``compute_dtype=bfloat16``
casts activations and conv inputs so the MXU runs bf16 while the IN
statistics stay fp32 inside the fused op.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.norm import instance_norm_act


class ConvNormAct(nn.Module):
    """conv3x3x3 -> fused InstanceNorm+activation."""

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    activation: str = "relu"
    compute_dtype: jnp.dtype = jnp.bfloat16
    use_norm: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            kernel_size=self.kernel,
            strides=self.strides,
            padding="SAME",
            use_bias=not self.use_norm,
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
        )(x)
        if self.use_norm:
            scale = self.param("in_scale", nn.initializers.ones, (self.features,))
            bias = self.param("in_bias", nn.initializers.zeros, (self.features,))
            x = instance_norm_act(x, scale, bias, activation=self.activation)
        return x


class DoubleConv(nn.Module):
    """Plain {conv -> IN+act} x2 block — the reference-style level block."""

    features: int
    activation: str = "relu"
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = ConvNormAct(
            self.features, activation=self.activation, compute_dtype=self.compute_dtype
        )(x)
        x = ConvNormAct(
            self.features, activation=self.activation, compute_dtype=self.compute_dtype
        )(x)
        return x
