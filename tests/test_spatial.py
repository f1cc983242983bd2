"""Spatial sharding (halo-exchange conv, distributed tile sweep) vs
single-device oracles, on the 8-virtual-CPU mesh (SURVEY.md §2.2, §4.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brats2019_tpu.infer.tiling import (
    blend_weight,
    sliding_window_probs,
    tile_origins,
)
from brats2019_tpu.parallel.mesh import make_mesh
from brats2019_tpu.parallel.spatial import (
    distributed_tile_sweep,
    make_sharded_conv3d,
)


@pytest.fixture(scope="module")
def env():
    return make_mesh()


def test_sharded_conv_matches_unsharded(env):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (32, 8, 8, 3))  # X=32 shards over 8 devices
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 3, 5)) * 0.2

    ref = jax.lax.conv_general_dilated(
        x[None], w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )[0]
    fn = make_sharded_conv3d(env)
    got = fn(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_sharded_conv_1x1_kernel_no_halo(env):
    x = jax.random.normal(jax.random.PRNGKey(2), (16, 4, 4, 2))
    w = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 1, 2, 2))
    ref = jax.lax.conv_general_dilated(
        x[None], w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )[0]
    got = make_sharded_conv3d(env)(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_distributed_tile_sweep_matches_single_device(env):
    # position-dependent "model": echoes intensities, so blending errors
    # anywhere show up
    def tile_probs(patch):
        v = patch[..., :1]
        return jnp.concatenate([v, -v, v * 0 + 1, v * 0], axis=-1)

    vol_shape = (24, 16, 8)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=vol_shape + (4,)), jnp.float32
    )
    origins = tile_origins(vol_shape, (8, 8, 8), overlap=0.5)
    w = blend_weight((8, 8, 8), "gaussian")

    ref = sliding_window_probs(
        tile_probs, x, origins, (8, 8, 8), jnp.asarray(w), 4
    )
    fn = distributed_tile_sweep(
        tile_probs, env, vol_shape, origins, (8, 8, 8), w, 4
    )
    got = fn(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_distributed_tile_sweep_pads_work_items(env):
    # 3 tiles over 8 devices: padding must not corrupt the blend
    def tile_probs(patch):
        p = jnp.zeros(patch.shape[:3] + (4,), jnp.float32)
        return p.at[..., 1].set(1.0)

    vol_shape = (12, 8, 8)
    x = jnp.zeros(vol_shape + (4,), jnp.float32)
    origins = tile_origins(vol_shape, (8, 8, 8), overlap=0.5)
    assert origins.shape[0] < 8
    w = blend_weight((8, 8, 8), "gaussian")
    fn = distributed_tile_sweep(tile_probs, env, vol_shape, origins, (8, 8, 8), w, 4)
    got = np.asarray(fn(x))
    np.testing.assert_allclose(got[..., 1], 1.0, atol=1e-5)
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-5)


def test_distributed_tile_sweep_with_flips(env):
    """flips x tiles striped over the mesh == single-device 8-flip TTA mean
    of blended sweeps (the flagship serving decomposition)."""
    def tile_probs(patch):
        v = patch[..., :1]
        return jnp.concatenate([v, -v, v * 0 + 1, v * 0], axis=-1)

    vol_shape = (16, 16, 8)
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=vol_shape + (4,)), jnp.float32
    )
    origins = tile_origins(vol_shape, (8, 8, 8), overlap=0.5)
    w = blend_weight((8, 8, 8), "gaussian")

    # oracle: mean over the 8 flips of flip->sweep->unflip
    refs = []
    for f in range(8):
        fx, fy, fz = f & 1, (f >> 1) & 1, (f >> 2) & 1
        flip = lambda a: jnp.flip(
            jnp.flip(jnp.flip(a, 0) if fx else a, 1)
            if fy else (jnp.flip(a, 0) if fx else a),
            2,
        ) if fz else (
            jnp.flip(jnp.flip(a, 0) if fx else a, 1)
            if fy else (jnp.flip(a, 0) if fx else a)
        )
        xf = flip(x)
        sw = sliding_window_probs(
            tile_probs, xf, origins, (8, 8, 8), jnp.asarray(w), 4
        )
        refs.append(flip(sw))
    ref = jnp.mean(jnp.stack(refs), axis=0)

    fn = distributed_tile_sweep(
        tile_probs, env, vol_shape, origins, (8, 8, 8), w, 4, n_flips=8
    )
    got = fn(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_distributed_tile_sweep_roi_restricted(env):
    """Origins covering only a sub-box: probs outside the ROI stay zero and
    inside match the oracle (the psum is ROI-sized, VERDICT weak #8)."""
    def tile_probs(patch):
        v = patch[..., :1]
        return jnp.concatenate([v, -v, v * 0 + 1, v * 0], axis=-1)

    vol_shape = (32, 16, 8)
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=vol_shape + (4,)), jnp.float32
    )
    # sweep only the x in [8, 24) slab
    origins = np.array([[8, 0, 0], [16, 8, 0], [12, 4, 0]], np.int32)
    w = blend_weight((8, 8, 8), "gaussian")
    ref = sliding_window_probs(
        tile_probs, x, origins, (8, 8, 8), jnp.asarray(w), 4
    )
    fn = distributed_tile_sweep(
        tile_probs, env, vol_shape, origins, (8, 8, 8), w, 4
    )
    got = np.asarray(fn(x))
    np.testing.assert_allclose(got, np.asarray(ref), atol=1e-5)
    assert (got[:8] == 0).all() and (got[24:] == 0).all()


def test_distributed_tile_sweep_params_argument_mode(env):
    """params=... mode: tile_probs_fn(params, patch) with the params pytree
    as a replicated runtime ARGUMENT (not jit constants) must match the
    closure mode exactly."""
    scale = jnp.float32(2.5)
    prm = {"w": scale}

    def probs_closure(patch):
        v = patch[..., :1] * scale
        return jnp.concatenate([v, -v, v * 0 + 1, v * 0], axis=-1)

    def probs_params(p, patch):
        v = patch[..., :1] * p["w"]
        return jnp.concatenate([v, -v, v * 0 + 1, v * 0], axis=-1)

    vol_shape = (24, 16, 8)
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=vol_shape + (4,)), jnp.float32
    )
    origins = tile_origins(vol_shape, (8, 8, 8), overlap=0.5)
    w = blend_weight((8, 8, 8), "gaussian")
    ref = distributed_tile_sweep(
        probs_closure, env, vol_shape, origins, (8, 8, 8), w, 4, n_flips=2
    )(x)
    got = distributed_tile_sweep(
        probs_params, env, vol_shape, origins, (8, 8, 8), w, 4, n_flips=2,
        params=prm,
    )(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
