"""On-device augmentation: random flips + intensity jitter (SURVEY.md C5, N4).

The reference does axis flips and intensity scale/shift in NumPy workers;
here both are jitted element-wise ops fused into the preprocessing graph.
Flips use ``jnp.where`` over reversed views (static shapes, no cond
branches), so the whole augmentation compiles to a handful of fused VPU ops.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def random_flips(
    key: jax.Array, image: jnp.ndarray, seg: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Independent 50% flips along each of the 3 spatial axes.

    image: (X, Y, Z, C); seg: (X, Y, Z).
    """
    bits = jax.random.bernoulli(key, 0.5, (3,))
    for ax in range(3):
        image = jnp.where(bits[ax], jnp.flip(image, axis=ax), image)
        seg = jnp.where(bits[ax], jnp.flip(seg, axis=ax), seg)
    return image, seg


def intensity_jitter(
    key: jax.Array,
    image: jnp.ndarray,
    scale_range: float = 0.1,
    shift_range: float = 0.1,
) -> jnp.ndarray:
    """Per-channel multiplicative scale in [1-s, 1+s] and additive shift in
    [-h, +h]; background (exact zeros) stays zero."""
    c = image.shape[-1]
    k_s, k_h = jax.random.split(key)
    scale = 1.0 + jax.random.uniform(k_s, (c,), minval=-scale_range, maxval=scale_range)
    shift = jax.random.uniform(k_h, (c,), minval=-shift_range, maxval=shift_range)
    mask = image != 0
    return jnp.where(mask, image * scale + shift, 0.0).astype(image.dtype)


def augment(
    key: jax.Array,
    image: jnp.ndarray,
    seg: jnp.ndarray,
    scale_range: float = 0.1,
    shift_range: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full train-time augmentation: flips then intensity jitter (C5)."""
    k_f, k_i = jax.random.split(key)
    image, seg = random_flips(k_f, image, seg)
    image = intensity_jitter(k_i, image, scale_range, shift_range)
    return image, seg


def augment_batch(key: jax.Array, images: jnp.ndarray, segs: jnp.ndarray, **kw):
    """vmap augmentation over a batch: (B, X, Y, Z, C) / (B, X, Y, Z)."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(lambda k, i, s: augment(k, i, s, **kw))(keys, images, segs)
