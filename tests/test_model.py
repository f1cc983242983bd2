"""U-Net forward/backward sanity (SURVEY.md §4.3)."""

import jax
import jax.numpy as jnp
import numpy as np

from brats2019_tpu.models import UNet3D, UNetConfig
from brats2019_tpu.train.loss import segmentation_loss

CFG = UNetConfig(levels=3, base_features=4, compute_dtype="float32")


def test_forward_shape():
    model = UNet3D(CFG)
    x = jnp.zeros((2, 16, 16, 16, 4))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (2, 16, 16, 16, 4)
    assert y.dtype == jnp.float32


def test_forward_nonsquare_shape():
    model = UNet3D(CFG)
    x = jnp.zeros((1, 16, 32, 8, 4))
    params = model.init(jax.random.PRNGKey(0), x)
    assert model.apply(params, x).shape == (1, 16, 32, 8, 4)


def test_bfloat16_compute_fp32_params():
    cfg = UNetConfig(levels=2, base_features=4, compute_dtype="bfloat16")
    model = UNet3D(cfg)
    x = jnp.zeros((1, 8, 8, 8, 4))
    params = model.init(jax.random.PRNGKey(0), x)
    leaves = jax.tree_util.tree_leaves(params)
    assert all(l.dtype == jnp.float32 for l in leaves)
    y = model.apply(params, x)
    assert y.dtype == jnp.float32  # head promotes to fp32


def test_grads_finite_and_nonzero():
    model = UNet3D(CFG)
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (1, 16, 16, 16, 4))
    labels = jnp.zeros((1, 16, 16, 16), dtype=jnp.int32)
    params = model.init(key, x)

    def loss_fn(p):
        logits = model.apply(p, x)
        l, _ = segmentation_loss(logits, labels)
        return l

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_space_to_depth_roundtrip():
    from brats2019_tpu.models.unet3d import depth_to_space, space_to_depth

    x = jnp.asarray(np.arange(2 * 8 * 8 * 8 * 3).reshape(2, 8, 8, 8, 3), jnp.float32)
    y = space_to_depth(x, 2)
    assert y.shape == (2, 4, 4, 4, 24)
    np.testing.assert_array_equal(np.asarray(depth_to_space(y, 2)), np.asarray(x))


def test_stem_downsample_model():
    cfg = UNetConfig(
        levels=2, base_features=8, stem_downsample=2, compute_dtype="float32"
    )
    model = UNet3D(cfg)
    x = jnp.zeros((1, 16, 16, 16, 4))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 16, 16, 16, 4)  # sub-pixel head restores full res
    assert cfg.min_spatial == 4

    # grads flow
    def loss_fn(p):
        logits = model.apply(p, jnp.ones((1, 8, 8, 8, 4)))
        return jnp.sum(logits ** 2)

    g = jax.grad(loss_fn)(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g))


def test_param_count_reasonable():
    model = UNet3D(UNetConfig(levels=4, base_features=16))
    x = jnp.zeros((1, 32, 32, 32, 4))
    params = model.init(jax.random.PRNGKey(0), x)
    n = sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(params))
    assert 1e5 < n < 1e8


def test_reference_parity_preset_forward():
    from brats2019_tpu.configs import get_preset

    exp = get_preset("reference_parity")
    model = UNet3D(exp.unet)
    m = exp.unet.min_spatial
    x = jnp.zeros((1, m, m, m, 4))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, m, m, m, 4)


def test_pre_subpixel_logits_match_d2s():
    """apply(subpixel=False) must be the exact pre-depth-to-space head
    output: depth_to_space of it equals the normal full-res logits (the
    low-res TTA reduce path builds on this, PERF.md round 3)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from brats2019_tpu.models import UNet3D
    from brats2019_tpu.models.unet3d import UNetConfig, depth_to_space

    cfg = UNetConfig(levels=2, base_features=4, max_features=8,
                     compute_dtype="float32", stem_downsample=2)
    model = UNet3D(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 16, 4))
    params = model.init(jax.random.PRNGKey(1), x)
    full = model.apply(params, x)
    low = model.apply(params, x, subpixel=False)
    assert low.shape == (1, 8, 8, 8, cfg.num_classes * 8)
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(low, 2)), np.asarray(full)
    )
    # stem=1 nets ignore the flag
    cfg1 = UNetConfig(levels=2, base_features=4, compute_dtype="float32")
    m1 = UNet3D(cfg1)
    p1 = m1.init(jax.random.PRNGKey(2), x)
    np.testing.assert_array_equal(
        np.asarray(m1.apply(p1, x, subpixel=False)),
        np.asarray(m1.apply(p1, x)),
    )
