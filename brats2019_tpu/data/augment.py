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


def random_rot90_axial(
    key: jax.Array, image: jnp.ndarray, seg: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Uniform k*90-degree rotation in the axial (X, Y) plane — exact (a
    transpose + flip, no resampling), valid because training patches are
    cubic. The nnU-Net-family extension beyond the reference's flips;
    off by default in the judged presets (TrainConfig.rot90_axial)."""
    assert image.shape[0] == image.shape[1], "rot90 needs a square plane"
    k = jax.random.randint(key, (), 0, 4)

    def rots(x, axes):
        r1 = jnp.flip(jnp.swapaxes(x, *axes), axis=axes[0])
        r2 = jnp.flip(jnp.flip(x, axis=axes[0]), axis=axes[1])
        r3 = jnp.flip(jnp.swapaxes(x, *axes), axis=axes[1])
        # a where-chain keeps static shapes (no data-dependent cond)
        out = jnp.where(k == 1, r1, x)
        out = jnp.where(k == 2, r2, out)
        return jnp.where(k == 3, r3, out)

    return rots(image, (0, 1)), rots(seg, (0, 1))


def gamma_jitter(
    key: jax.Array, image: jnp.ndarray, gamma_range: float
) -> jnp.ndarray:
    """Per-channel gamma on the min-max-normalized patch (nnU-Net-style),
    rescaled back; background (exact zeros) stays zero. gamma is sampled
    in [1/(1+r), 1+r] — symmetric in log space around 1."""
    c = image.shape[-1]
    hi = 1.0 + gamma_range
    log_g = jax.random.uniform(
        key, (c,), minval=-jnp.log(hi), maxval=jnp.log(hi)
    )
    gamma = jnp.exp(log_g)
    x = image.astype(jnp.float32)
    lo = jnp.min(x, axis=(0, 1, 2))
    span = jnp.max(x, axis=(0, 1, 2)) - lo + 1e-6
    xn = jnp.clip((x - lo) / span, 0.0, 1.0)
    xg = xn ** gamma * span + lo
    return jnp.where(image != 0, xg, 0.0).astype(image.dtype)


def augment(
    key: jax.Array,
    image: jnp.ndarray,
    seg: jnp.ndarray,
    scale_range: float = 0.1,
    shift_range: float = 0.1,
    rot90: bool = False,
    gamma_range: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full train-time augmentation: flips (+ optional axial rot90), then
    intensity jitter (+ optional gamma) (C5)."""
    k_f, k_r, k_i, k_g = jax.random.split(key, 4)
    image, seg = random_flips(k_f, image, seg)
    if rot90:
        image, seg = random_rot90_axial(k_r, image, seg)
    image = intensity_jitter(k_i, image, scale_range, shift_range)
    if gamma_range > 0:
        image = gamma_jitter(k_g, image, gamma_range)
    return image, seg


def augment_batch(key: jax.Array, images: jnp.ndarray, segs: jnp.ndarray, **kw):
    """vmap augmentation over a batch: (B, X, Y, Z, C) / (B, X, Y, Z)."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(lambda k, i, s: augment(k, i, s, **kw))(keys, images, segs)
