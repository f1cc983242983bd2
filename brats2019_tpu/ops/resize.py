"""Trilinear up/downsampling for NDHWC volumes (SURVEY.md N3).

Replaces ATen ``interpolate(mode='trilinear')``. Two backends behind one
interface (same pattern as ops/norm.py):

* ``jnp`` — ``jax.image.resize`` / ``reduce_window``. Fine when fused into
  a surrounding graph, but measured PATHOLOGICAL standalone on TPU at the
  network's small decoder shapes (2.3 s for an 8^3x320 up+down round trip,
  PERF.md round 2).
* ``pallas`` — one-pass plane-gridded kernels with custom exact-transpose
  VJPs (ops/pallas_resize.py), consuming the native NDHWC layout (no
  repack — the round-1 ops/pallas_norm.py lesson applied).

The production default follows the A/B measurement in PERF.md.
``resize_trilinear`` (arbitrary target shapes, e.g. the cascade's
canvas->coarse-grid resize) always uses jax.image.resize — only the exact
2x hot paths have kernels.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

# Default backend: jnp. The A/B (PERF.md "Pallas trilinear resize") found
# the Pallas kernels 4-26x faster STANDALONE, but inside the fused predict
# program XLA wins (119 vs 134 ms/volume, interleaved same-session rounds)
# — the same in-graph-fusion lesson as ops/pallas_norm.py. "pallas" stays a
# tested backend for layout-controlled standalone callers; "auto" currently
# resolves to jnp everywhere.
_BACKEND = "jnp"


def set_backend(name: str) -> None:
    global _BACKEND
    assert name in ("jnp", "pallas", "auto")
    _BACKEND = name


def get_backend() -> str:
    if _BACKEND == "auto":
        return "jnp"  # measured in-graph winner on TPU too (PERF.md)
    return _BACKEND


def resize_trilinear(x: jnp.ndarray, spatial: Sequence[int]) -> jnp.ndarray:
    """Resize the 3 spatial dims of (..., D, H, W, C) or (D, H, W, C).

    Uses half-pixel-centered linear interpolation (matches
    torch ``interpolate(mode='trilinear', align_corners=False)``).
    """
    lead = x.shape[: x.ndim - 4]
    out_shape = lead + tuple(spatial) + (x.shape[-1],)
    return jax.image.resize(x, out_shape, method="trilinear").astype(x.dtype)


def downsample2x_jnp(x: jnp.ndarray) -> jnp.ndarray:
    """Exact 2x spatial downsample via 2^3 average pooling (= trilinear at
    scale 0.5 with half-pixel centers). x: (N, D, H, W, C)."""
    ones = (1,)
    window = ones + (2, 2, 2) + ones
    summed = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add, window, window, "VALID"
    )
    return (summed * 0.125).astype(x.dtype)


def upsample2x_jnp(x: jnp.ndarray) -> jnp.ndarray:
    """2x trilinear upsample of (N, D, H, W, C)."""
    n, d, h, w, c = x.shape
    return resize_trilinear(x, (2 * d, 2 * h, 2 * w))


def downsample2x(x: jnp.ndarray) -> jnp.ndarray:
    if get_backend() == "pallas" and x.ndim == 5:
        from .pallas_resize import downsample2x_pallas

        return downsample2x_pallas(x)
    return downsample2x_jnp(x)


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    if get_backend() == "pallas" and x.ndim == 5:
        from .pallas_resize import upsample2x_pallas

        return upsample2x_pallas(x)
    return upsample2x_jnp(x)
