"""Pallas trilinear resize kernels vs the jnp/jax.image oracle (N3).

Runs in interpreter mode on the CPU test mesh; the TPU A/B numbers live in
PERF.md."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brats2019_tpu.ops import pallas_resize
from brats2019_tpu.ops.resize import downsample2x_jnp, upsample2x_jnp

pallas_resize._INTERPRET = True


SHAPES = [
    (1, 4, 4, 4, 8),
    (2, 5, 6, 7, 16),   # odd spatial dims
    (1, 1, 8, 8, 8),    # degenerate D=1
    (2, 8, 8, 8, 32),
]


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_upsample_matches_oracle(shape, dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape), dtype)
    ref = upsample2x_jnp(x.astype(jnp.float32))
    out = pallas_resize.upsample2x_pallas(x)
    assert out.shape == ref.shape and out.dtype == dtype
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=tol
    )


@pytest.mark.parametrize("shape", [(1, 4, 4, 4, 8), (2, 8, 6, 4, 16)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_downsample_matches_oracle(shape, dtype):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=shape), dtype)
    ref = downsample2x_jnp(x.astype(jnp.float32)).astype(dtype)
    out = pallas_resize.downsample2x_pallas(x)
    assert out.shape == ref.shape and out.dtype == dtype
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=tol
    )


@pytest.mark.parametrize("shape", [(1, 4, 4, 4, 8), (1, 1, 4, 6, 8)])
def test_upsample_vjp_matches_oracle_ad(shape):
    """The hand-written transpose must equal AD through the jnp oracle."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    ct = jnp.asarray(
        rng.normal(size=(shape[0], 2 * shape[1], 2 * shape[2], 2 * shape[3], shape[4])),
        jnp.float32,
    )

    def loss_ref(v):
        return jnp.sum(upsample2x_jnp(v) * ct)

    def loss_ker(v):
        return jnp.sum(pallas_resize.upsample2x_pallas(v) * ct)

    g_ref = jax.grad(loss_ref)(x)
    g_ker = jax.grad(loss_ker)(x)
    np.testing.assert_allclose(
        np.asarray(g_ker), np.asarray(g_ref), rtol=1e-4, atol=1e-4
    )


def test_downsample_vjp_matches_oracle_ad():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 8)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=(1, 2, 2, 2, 8)), jnp.float32)

    g_ref = jax.grad(lambda v: jnp.sum(downsample2x_jnp(v) * ct))(x)
    g_ker = jax.grad(
        lambda v: jnp.sum(pallas_resize.downsample2x_pallas(v) * ct)
    )(x)
    np.testing.assert_allclose(
        np.asarray(g_ker), np.asarray(g_ref), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("shape", [(1, 1, 1, 1, 8), (1, 2, 1, 4, 8), (1, 1, 2, 2, 8)])
def test_degenerate_small_planes(shape):
    """Size-1 spatial axes (hit by tiny model-init shapes) must not break
    the kernels and must still match the oracle."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    ref = upsample2x_jnp(x)
    out = pallas_resize.upsample2x_pallas(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    ct = jnp.asarray(rng.normal(size=ref.shape), jnp.float32)
    g_ref = jax.grad(lambda v: jnp.sum(upsample2x_jnp(v) * ct))(x)
    g_ker = jax.grad(
        lambda v: jnp.sum(pallas_resize.upsample2x_pallas(v) * ct)
    )(x)
    np.testing.assert_allclose(np.asarray(g_ker), np.asarray(g_ref), atol=1e-4)
