"""Trilinear up/downsampling for NDHWC volumes (SURVEY.md N3).

Replaces ATen ``interpolate(mode='trilinear')``. ``jax.image.resize`` with
method='trilinear' lowers to efficient XLA gathers/convolutions on TPU; exact
2x down/upsampling get dedicated fast paths (reduce_window average for down,
which XLA maps to a single fused pass).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def resize_trilinear(x: jnp.ndarray, spatial: Sequence[int]) -> jnp.ndarray:
    """Resize the 3 spatial dims of (..., D, H, W, C) or (D, H, W, C).

    Uses half-pixel-centered linear interpolation (matches
    torch ``interpolate(mode='trilinear', align_corners=False)``).
    """
    lead = x.shape[: x.ndim - 4]
    out_shape = lead + tuple(spatial) + (x.shape[-1],)
    return jax.image.resize(x, out_shape, method="trilinear").astype(x.dtype)


def downsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Exact 2x spatial downsample via 2^3 average pooling (= trilinear at
    scale 0.5 with half-pixel centers). x: (N, D, H, W, C)."""
    ones = (1,)
    window = ones + (2, 2, 2) + ones
    summed = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add, window, window, "VALID"
    )
    return (summed * 0.125).astype(x.dtype)


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x trilinear upsample of (N, D, H, W, C)."""
    n, d, h, w, c = x.shape
    return resize_trilinear(x, (2 * d, 2 * h, 2 * w))
