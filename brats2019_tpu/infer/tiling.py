"""On-device sliding-window inference (SURVEY.md C14).

Reference behavior: tile the volume into overlapping patches on the host,
run the model per tile, blend overlaps with Gaussian/softmax-probability
weighting. TPU-first redesign:

* the tile grid is STATIC — computed in Python from the (static, padded)
  canvas shape, so the whole sweep compiles to one ``lax.scan`` with
  ``dynamic_slice``/read-modify-write accumulation; zero host round-trips.
* blending weights are a precomputed separable Gaussian (or uniform for
  "softmax" probability-averaging mode); weight normalization happens once
  at the end, fused by XLA.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def tile_origins(
    vol_shape: Sequence[int],
    tile: Sequence[int],
    overlap: float = 0.5,
) -> np.ndarray:
    """Static tile-origin grid (N, 3) covering ``vol_shape``.

    Origins are evenly spaced with stride <= tile*(1-overlap) and always
    include a final tile flush with the volume edge (standard BraTS
    sliding-window convention).
    """
    axes = []
    for s, t in zip(vol_shape, tile):
        if t >= s:
            axes.append(np.array([0], dtype=np.int32))
            continue
        stride = max(1, int(round(t * (1.0 - overlap))))
        n = int(np.ceil((s - t) / stride)) + 1
        pos = np.round(np.linspace(0, s - t, n)).astype(np.int32)
        axes.append(np.unique(pos))
    grid = np.stack(
        [g.ravel() for g in np.meshgrid(*axes, indexing="ij")], axis=-1
    )
    return grid.astype(np.int32)


def blend_weight(
    tile: Sequence[int], mode: str = "gaussian", sigma_frac: float = 0.125
) -> np.ndarray:
    """Per-voxel blending weight (X, Y, Z, 1).

    "gaussian": separable Gaussian centered in the tile (importance
    weighting); "softmax": uniform weights == plain probability averaging.
    """
    if mode == "softmax":
        return np.ones(tuple(tile) + (1,), dtype=np.float32)
    ws = []
    for t in tile:
        x = np.arange(t, dtype=np.float64) - (t - 1) / 2.0
        sigma = max(t * sigma_frac, 1.0)
        ws.append(np.exp(-0.5 * (x / sigma) ** 2))
    w = ws[0][:, None, None] * ws[1][None, :, None] * ws[2][None, None, :]
    w = (w / w.max()).astype(np.float32)
    # floor keeps edge voxels numerically meaningful after normalization
    return np.maximum(w, 1e-3)[..., None]


def sliding_window_probs(
    tile_probs_fn: Callable[[jnp.ndarray], jnp.ndarray],
    vol: jnp.ndarray,                    # (X, Y, Z, C)
    origins: np.ndarray,                 # (N, 3) static
    tile: Tuple[int, int, int],
    weight: jnp.ndarray,                 # (tx, ty, tz, 1)
    num_classes: int,
) -> jnp.ndarray:
    """Weighted-blend class probabilities over a static tile sweep.

    tile_probs_fn(tile (X,Y,Z,C)) -> probs (X,Y,Z,K). Returns normalized
    probs (X, Y, Z, K). Compiles to one scan; each iteration is a
    dynamic_slice -> model -> weighted accumulate.
    """
    X, Y, Z = vol.shape[:3]
    canvas = jnp.zeros((X, Y, Z, num_classes), jnp.float32)
    wsum = jnp.zeros((X, Y, Z, 1), jnp.float32)
    origins_j = jnp.asarray(origins, jnp.int32)

    def body(carry, origin):
        canvas, wsum = carry
        o = (origin[0], origin[1], origin[2], jnp.int32(0))
        patch = jax.lax.dynamic_slice(vol, o, tuple(tile) + (vol.shape[-1],))
        probs = tile_probs_fn(patch) * weight
        cur = jax.lax.dynamic_slice(
            canvas, o, tuple(tile) + (num_classes,)
        )
        canvas = jax.lax.dynamic_update_slice(canvas, cur + probs, o)
        curw = jax.lax.dynamic_slice(wsum, o, tuple(tile) + (1,))
        wsum = jax.lax.dynamic_update_slice(wsum, curw + weight, o)
        return (canvas, wsum), None

    (canvas, wsum), _ = jax.lax.scan(body, (canvas, wsum), origins_j)
    return canvas / jnp.maximum(wsum, 1e-8)
