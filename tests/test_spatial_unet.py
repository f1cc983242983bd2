"""Spatially-sharded whole-volume UNet forward vs the unsharded oracle
(SURVEY.md §7.4 — halo-exchange CP analog), on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brats2019_tpu.models import UNet3D, UNetConfig
from brats2019_tpu.parallel.mesh import make_mesh
from brats2019_tpu.parallel.spatial_unet import make_spatial_unet


@pytest.fixture(scope="module")
def env():
    return make_mesh()


@pytest.mark.parametrize(
    "cfg",
    [
        UNetConfig(levels=2, base_features=4, compute_dtype="float32"),
        UNetConfig(levels=2, base_features=4, compute_dtype="float32",
                   stem_downsample=2),
        UNetConfig(levels=3, base_features=4, compute_dtype="float32"),
        # non-relu activation: the sharded IN+act must honor
        # UNetConfig.activation, not hardcode relu
        UNetConfig(levels=2, base_features=4, compute_dtype="float32",
                   activation="leaky_relu"),
    ],
    ids=["plain-l2", "s2d-l2", "plain-l3", "leaky-l2"],
)
def test_sharded_forward_matches_unsharded(env, cfg):
    model = UNet3D(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 16, 16, 4))
    params = model.init(jax.random.PRNGKey(1), x[None])
    ref = np.asarray(model.apply(params, x[None])[0])

    fn = make_spatial_unet(env, cfg)
    got = np.asarray(fn(params, x))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_sharded_forward_trained_params_consistency(env):
    # logits argmax must agree voxel-for-voxel away from ties
    cfg = UNetConfig(levels=2, base_features=8, compute_dtype="float32")
    model = UNet3D(cfg)
    x = jax.random.normal(jax.random.PRNGKey(3), (32, 16, 16, 4)) * 2.0
    params = model.init(jax.random.PRNGKey(4), x[None])
    ref = np.asarray(model.apply(params, x[None])[0])
    got = np.asarray(make_spatial_unet(env, cfg)(params, x))
    rm, gm = ref.argmax(-1), got.argmax(-1)
    margin = np.sort(ref, axis=-1)
    tie = (margin[..., -1] - margin[..., -2]) < 1e-4
    assert (rm == gm)[~tie].all()


def test_spatially_sharded_training_grads_match_unsharded(env):
    from brats2019_tpu.parallel.spatial_unet import make_spatial_train_grad

    cfg = UNetConfig(levels=2, base_features=4, compute_dtype="float32")
    model = UNet3D(cfg)
    x = jax.random.normal(jax.random.PRNGKey(5), (32, 16, 16, 4))
    y = jax.random.randint(jax.random.PRNGKey(6), (32, 16, 16), 0, 4)
    params = model.init(jax.random.PRNGKey(7), x[None])

    # unsharded reference: CE mean over the whole volume
    def ref_loss(p):
        logits = model.apply(p, x[None])[0]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        onehot = jax.nn.one_hot(y, 4, dtype=jnp.float32)
        return -jnp.mean(jnp.sum(onehot * logp, axis=-1))

    ref_l, ref_g = jax.value_and_grad(ref_loss)(params)
    fn = make_spatial_train_grad(env, cfg)
    got_l, got_g = fn(params, x, y)
    np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(got_g), jax.tree_util.tree_leaves(ref_g)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-3
        )
