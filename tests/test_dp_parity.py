"""DP gradient parity: the shard_map step's pmean'd update must equal the
mean of per-device gradients computed independently (SURVEY.md §4.3
"gradient all-reduce math").

Reconstructs each device's sampled batch on the host (same fold_in key
derivation as train/step.py), computes per-device grads with plain jax.grad,
averages, applies the same optax update — and compares against the 8-device
shard_map step bit-for-bit (small fp tolerance for reduction order).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from brats2019_tpu.configs.presets import TrainConfig
from brats2019_tpu.data.augment import augment
from brats2019_tpu.data.sampling import build_fg_table_np, sample_patch_impl
from brats2019_tpu.data.preprocess import zscore_np
from brats2019_tpu.data.synthetic import make_case_arrays
from brats2019_tpu.models import UNet3D, UNetConfig
from brats2019_tpu.parallel.mesh import make_mesh
from brats2019_tpu.train.loss import segmentation_loss
from brats2019_tpu.train.step import make_optimizer, make_train_step

CFG = TrainConfig(
    patch=(8, 8, 8), pool_shape=(16, 16, 16), pool_cases_per_device=1,
    batch_per_device=2, steps=4, warmup_steps=0, lr=1e-2, augment=True,
    fg_prob=0.5,
)
UCFG = UNetConfig(levels=1, base_features=4, compute_dtype="float32")


def _host_device_batch(cfg, d, step, pool_img_d, pool_seg_d, fg_d):
    """Replicates sample_local_batch for device index d on the host."""
    key = jax.random.PRNGKey(cfg.seed)
    key = jax.random.fold_in(key, jnp.int32(step))
    key = jax.random.fold_in(key, jnp.int32(d))
    keys = jax.random.split(key, cfg.batch_per_device)
    imgs, segs = [], []
    for k in keys:
        k_case, k_patch, k_aug = jax.random.split(k, 3)
        ci = int(jax.random.randint(k_case, (), 0, pool_img_d.shape[0]))
        pi, ps = sample_patch_impl(
            k_patch, pool_img_d[ci], pool_seg_d[ci], cfg.patch, fg_d[ci], cfg.fg_prob
        )
        pi, ps = augment(
            k_aug, pi, ps,
            scale_range=cfg.intensity_scale, shift_range=cfg.intensity_shift,
        )
        imgs.append(pi)
        segs.append(ps)
    return jnp.stack(imgs), jnp.stack(segs).astype(jnp.int32)


def test_dp_grads_equal_mean_of_device_grads():
    env = make_mesh()
    n = env.n_data
    model = UNet3D(UCFG)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8, 4)))
    apply_fn = lambda p, x: model.apply(p, x)
    step = make_train_step(apply_fn, CFG, env)
    opt_state = step.tx.init(params)

    imgs, segs, fgs = [], [], []
    for i in range(n):
        img, seg = make_case_arrays(seed=i, shape=(16, 16, 16))
        imgs.append(zscore_np(img)); segs.append(seg)
        fgs.append(build_fg_table_np(seg, 32))
    pool_img = np.stack(imgs); pool_seg = np.stack(segs); pool_fg = np.stack(fgs)

    # --- shard_map result
    sh = env.data_sharded()
    p1, o1, aux = step.fn(
        jax.device_put(jax.tree_util.tree_map(jnp.copy, params), env.replicated()),
        jax.device_put(jax.tree_util.tree_map(jnp.copy, opt_state), env.replicated()),
        jax.device_put(jnp.asarray(pool_img), sh),
        jax.device_put(jnp.asarray(pool_seg), sh),
        jax.device_put(jnp.asarray(pool_fg), sh),
        jnp.int32(0),
    )

    # --- host reference: mean of per-device grads
    def loss_fn(p, x, y):
        logits = apply_fn(p, x)
        l, _ = segmentation_loss(
            logits, y, dice_weight=CFG.dice_weight, ce_weight=CFG.ce_weight
        )
        return l

    grads_sum = None
    for d in range(n):
        x_d, y_d = _host_device_batch(
            CFG, d, 0,
            jnp.asarray(pool_img[d : d + 1]),
            jnp.asarray(pool_seg[d : d + 1]),
            jnp.asarray(pool_fg[d : d + 1]),
        )
        g = jax.grad(loss_fn)(params, x_d, y_d)
        grads_sum = g if grads_sum is None else jax.tree_util.tree_map(
            jnp.add, grads_sum, g
        )
    grads_mean = jax.tree_util.tree_map(lambda g: g / n, grads_sum)
    tx = make_optimizer(CFG)
    updates, _ = tx.update(grads_mean, opt_state, params)
    p_ref = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
