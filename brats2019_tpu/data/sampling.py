"""On-device random 3D patch sampling (SURVEY.md C4, N4).

The reference samples random patches in NumPy workers on the host; here the
whole case volume lives in device HBM and patch extraction is a jitted
``lax.dynamic_slice`` with foreground-biased origin sampling — part of the
fused preprocessing graph (BASELINE.json:5 "random 3D patch sampling ...
fused jax.jit preprocessing graph").

All shapes are static: patch size is a config constant, and fg-bias works by
sampling an origin centered on a random foreground voxel drawn from a
fixed-size precomputed coordinate table (padded with resampled entries).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

FG_TABLE_SIZE = 4096  # fixed-size foreground coordinate table per case

# When True, sample_patch_impl emits jax.experimental.checkify checks on the
# fg-table coordinates (SURVEY.md §4.3/§5 sanitizers). INTERNAL toggle only:
# checked_sample_batch flips it around an un-jitted checkify trace, which is
# the one place the flag is guaranteed to be read at trace time. (A public
# setter would be a trap — flipping the global after any jitted sampling has
# been traced does not retrace cached programs, so the checks would silently
# never fire.)
_DEBUG_CHECKS = False


def build_fg_table_np(seg: np.ndarray, size: int = FG_TABLE_SIZE) -> np.ndarray:
    """Host: sample ``size`` foreground voxel coords (with replacement).

    Returns (size, 3) int32; falls back to the volume center when the case has
    no foreground, keeping the device-side sampler branch-free.
    """
    coords = np.argwhere(seg > 0)
    if coords.shape[0] == 0:
        center = np.array(seg.shape, dtype=np.int64) // 2
        coords = center[None, :]
    rng = np.random.default_rng(coords.shape[0])
    idx = rng.integers(0, coords.shape[0], size=size)
    return coords[idx].astype(np.int32)


def _random_origin(
    key: jax.Array,
    vol_shape: Tuple[int, int, int],
    patch: Tuple[int, int, int],
    fg_table: Optional[jnp.ndarray],
    fg_prob: float,
) -> jnp.ndarray:
    """Patch origin: uniform, or centered on a random fg voxel w.p. fg_prob."""
    k_u, k_fg, k_pick, k_bias = jax.random.split(key, 4)
    maxs = jnp.array(
        [max(v - p, 0) for v, p in zip(vol_shape, patch)], dtype=jnp.int32
    )
    uniform = jax.random.randint(k_u, (3,), jnp.zeros(3, jnp.int32), maxs + 1)
    if fg_table is None or fg_prob <= 0.0:
        return uniform
    row = jax.random.randint(k_pick, (), 0, fg_table.shape[0])
    center = fg_table[row]
    # jitter so the fg voxel lands anywhere inside the patch, not dead-center
    jitter = jax.random.randint(
        k_bias, (3,), -(jnp.array(patch) // 4), jnp.array(patch) // 4 + 1
    )
    fg_origin = jnp.clip(center - jnp.array(patch, jnp.int32) // 2 + jitter, 0, maxs)
    take_fg = jax.random.bernoulli(k_fg, fg_prob)
    return jnp.where(take_fg, fg_origin, uniform)


def sample_patch_impl(
    key: jax.Array,
    image: jnp.ndarray,          # (X, Y, Z, C)
    seg: jnp.ndarray,            # (X, Y, Z) int
    patch: Tuple[int, int, int],
    fg_table: Optional[jnp.ndarray] = None,   # (T, 3) int32 or None
    fg_prob: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Trace-level patch extraction (composable inside larger jitted graphs)."""
    vol_shape = image.shape[:3]
    # trace-time shape sanity: a patch larger than the pool canvas would
    # silently clamp to a degenerate corner slice — fail loudly instead
    for ax, (p, v) in enumerate(zip(patch, vol_shape)):
        if p > v:
            raise ValueError(
                f"patch {patch} exceeds volume {vol_shape} on axis {ax}"
            )
    if seg.shape[:3] != vol_shape:
        raise ValueError(f"seg shape {seg.shape} != image spatial {vol_shape}")
    if _DEBUG_CHECKS and fg_table is not None:
        from jax.experimental import checkify

        bounds = jnp.array(vol_shape, jnp.int32)
        checkify.check(
            jnp.all((fg_table >= 0) & (fg_table < bounds[None, :])),
            "fg table coordinate out of volume bounds (mis-sized table?)",
        )
    origin = _random_origin(key, vol_shape, patch, fg_table, fg_prob)
    img = jax.lax.dynamic_slice(
        image,
        (origin[0], origin[1], origin[2], jnp.int32(0)),
        patch + (image.shape[-1],),
    )
    sg = jax.lax.dynamic_slice(seg, (origin[0], origin[1], origin[2]), patch)
    return img, sg


sample_patch = partial(jax.jit, static_argnames=("patch", "fg_prob"))(
    sample_patch_impl
)


def sample_batch(
    key: jax.Array,
    image: jnp.ndarray,
    seg: jnp.ndarray,
    patch: Tuple[int, int, int],
    batch: int,
    fg_table: Optional[jnp.ndarray] = None,
    fg_prob: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """vmap patch sampling into a (B, *patch, C) / (B, *patch) batch."""
    keys = jax.random.split(key, batch)
    fn = lambda k: sample_patch(k, image, seg, patch, fg_table, fg_prob)
    return jax.vmap(fn)(keys)


def checked_sample_batch(
    key: jax.Array,
    image: jnp.ndarray,
    seg: jnp.ndarray,
    patch: Tuple[int, int, int],
    batch: int,
    fg_table: Optional[jnp.ndarray] = None,
    fg_prob: float = 0.5,
):
    """sample_batch with checkify bounds checks DISCHARGED: raises
    ValueError on a bad fg table instead of silently clamping. Used by the
    --debug-checks startup validation (train CLI) and tests."""
    from jax.experimental import checkify

    global _DEBUG_CHECKS
    prev = _DEBUG_CHECKS
    _DEBUG_CHECKS = True
    try:
        def fn(k):
            keys = jax.random.split(k, batch)
            one = lambda kk: sample_patch_impl(
                kk, image, seg, patch, fg_table, fg_prob
            )
            return jax.vmap(one)(keys)

        err, out = checkify.checkify(fn)(key)
    finally:
        _DEBUG_CHECKS = prev
    err.throw()
    return out
