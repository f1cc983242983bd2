"""Deep supervision + region-Dice loss (nnU-Net-style training extras)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from brats2019_tpu.configs.presets import TrainConfig
from brats2019_tpu.data.preprocess import zscore_np
from brats2019_tpu.data.sampling import build_fg_table_np
from brats2019_tpu.data.synthetic import make_case_arrays
from brats2019_tpu.models import UNet3D, UNetConfig
from brats2019_tpu.parallel.mesh import make_mesh
from brats2019_tpu.train.loss import region_soft_dice_loss, segmentation_loss
from brats2019_tpu.train.step import make_train_step

DS_CFG = UNetConfig(
    levels=3, base_features=4, max_features=16,
    compute_dtype="float32", deep_supervision=True,
)


def test_model_emits_aux_heads_only_when_asked():
    model = UNet3D(DS_CFG)
    x = jnp.zeros((1, 16, 16, 16, 4))
    params = model.init(jax.random.PRNGKey(0), x, deep_outputs=True)
    out = model.apply(params, x, deep_outputs=True)
    assert isinstance(out, tuple)
    logits, auxs = out
    assert logits.shape == (1, 16, 16, 16, 4)
    assert len(auxs) == 1  # levels=3 -> aux at lvl 1 only
    assert auxs[0].shape == (1, 8, 8, 8, 4)
    # inference call path: plain logits, extra params unused but harmless
    plain = model.apply(params, x)
    assert plain.shape == (1, 16, 16, 16, 4)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(logits), atol=1e-6)


def test_segmentation_loss_with_aux():
    labels = jnp.zeros((1, 16, 16, 16), jnp.int32)
    logits = jnp.zeros((1, 16, 16, 16, 4))
    aux = [jnp.zeros((1, 8, 8, 8, 4))]
    l_plain, _ = segmentation_loss(logits, labels)
    l_ds, auxd = segmentation_loss(logits, labels, aux_logits=aux, aux_weight=0.5)
    # identical (uniform) predictions at all scales -> same normalized loss
    np.testing.assert_allclose(float(l_ds), float(l_plain), rtol=1e-5)


def test_region_loss_perfect_prediction():
    labels = np.zeros((1, 8, 8, 8), dtype=np.int32)
    labels[0, :4] = 3
    logits = jax.nn.one_hot(labels, 4) * 100.0
    assert float(region_soft_dice_loss(jnp.asarray(logits), jnp.asarray(labels))) < 1e-3


def test_region_loss_penalizes_region_errors():
    labels = np.zeros((1, 8, 8, 8), dtype=np.int32)
    labels[0, :4] = 3  # ET
    wrong = np.where(labels == 3, 2, 0)  # predicted ED instead (WT ok!)
    logits = jax.nn.one_hot(wrong, 4) * 100.0
    l = float(region_soft_dice_loss(jnp.asarray(logits), jnp.asarray(labels)))
    assert l > 0.5  # TC and ET both fully missed


def test_train_step_with_deep_supervision_and_region_loss():
    env = make_mesh()
    cfg = TrainConfig(
        patch=(16, 16, 16), pool_shape=(32, 32, 32), pool_cases_per_device=1,
        batch_per_device=1, steps=4, warmup_steps=0, lr=1e-3,
        region_weight=0.5,
    )
    model = UNet3D(DS_CFG)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 4)), deep_outputs=True
    )
    apply_fn = lambda p, x: model.apply(p, x, deep_outputs=True)
    step = make_train_step(apply_fn, cfg, env)
    opt = step.tx.init(params)
    params = jax.device_put(params, env.replicated())
    opt = jax.device_put(opt, env.replicated())

    imgs, segs, fgs = [], [], []
    for i in range(env.n_data):
        img, seg = make_case_arrays(seed=i, shape=(32, 32, 32))
        imgs.append(zscore_np(img)); segs.append(seg)
        fgs.append(build_fg_table_np(seg, 32))
    sh = env.data_sharded()
    pool = (jax.device_put(jnp.asarray(np.stack(imgs)), sh),
            jax.device_put(jnp.asarray(np.stack(segs)), sh),
            jax.device_put(jnp.asarray(np.stack(fgs)), sh))

    losses = []
    for s in range(4):
        params, opt, aux = step.fn(params, opt, *pool, jnp.int32(s))
        aux = jax.device_get(aux)
        assert np.isfinite(aux["loss"]) and "region_dice_loss" in aux
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0]


def test_restore_template_includes_aux_heads():
    """params_like_for must mirror what training saved: with
    deep_supervision=True the checkpoint carries aux_head_* params and the
    restore template needs the same pytree structure (ADVICE round-1 low)."""
    import jax
    import jax.numpy as jnp

    from brats2019_tpu.cli.common import params_like_for
    from brats2019_tpu.models.unet3d import UNet3D, UNetConfig

    cfg = UNetConfig(levels=2, base_features=4, deep_supervision=True)
    model = UNet3D(cfg)
    trained = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16, 16, 16, 4)),
        deep_outputs=True,  # how train/step.py calls it during training
    )
    template = params_like_for(cfg, patch=(16, 16, 16))
    assert jax.tree_util.tree_structure(trained) == jax.tree_util.tree_structure(
        template
    )
