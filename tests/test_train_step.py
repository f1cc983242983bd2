"""DP train step over the 8-virtual-device mesh (SURVEY.md §4.3
"Distributed without a cluster")."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brats2019_tpu.configs.presets import TrainConfig
from brats2019_tpu.data.synthetic import make_case_arrays
from brats2019_tpu.data.preprocess import zscore_np
from brats2019_tpu.data.sampling import build_fg_table_np
from brats2019_tpu.models import UNet3D, UNetConfig
from brats2019_tpu.parallel.mesh import make_mesh
from brats2019_tpu.train.step import make_eval_step, make_optimizer, make_train_step

CFG = TrainConfig(
    patch=(16, 16, 16),
    pool_shape=(32, 32, 32),
    pool_cases_per_device=1,
    batch_per_device=1,
    steps=10,
    warmup_steps=2,
    lr=1e-3,
    fg_prob=0.5,
)
UCFG = UNetConfig(levels=2, base_features=4, compute_dtype="float32")


@pytest.fixture(scope="module")
def setup():
    env = make_mesh()
    model = UNet3D(UCFG)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 4))
    )
    tx = make_optimizer(CFG)
    opt_state = tx.init(params)
    repl = env.replicated()
    params = jax.device_put(params, repl)
    opt_state = jax.device_put(opt_state, repl)

    k = env.n_data  # one case per device
    imgs, segs, fgs = [], [], []
    for i in range(k):
        img, seg = make_case_arrays(seed=i, shape=(32, 32, 32))
        imgs.append(zscore_np(img))
        segs.append(seg)
        fgs.append(build_fg_table_np(seg, 64))
    sharded = env.data_sharded()
    pool_img = jax.device_put(jnp.asarray(np.stack(imgs)), sharded)
    pool_seg = jax.device_put(jnp.asarray(np.stack(segs)), sharded)
    pool_fg = jax.device_put(jnp.asarray(np.stack(fgs)), sharded)

    apply_fn = lambda p, x: UNet3D(UCFG).apply(p, x)
    step = make_train_step(apply_fn, CFG, env)
    return env, apply_fn, step, params, opt_state, (pool_img, pool_seg, pool_fg)


def test_mesh_has_8_devices(setup):
    env = setup[0]
    assert env.n_data == 8


def test_step_runs_and_updates(setup):
    env, apply_fn, step, params, opt_state, pool = setup
    p0 = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), params)
    p = jax.tree_util.tree_map(jnp.copy, params)
    o = jax.tree_util.tree_map(jnp.copy, opt_state)
    params2, opt2, aux = step.fn(p, o, *pool, jnp.int32(0))
    aux = jax.device_get(aux)
    assert np.isfinite(aux["loss"])
    assert np.isfinite(aux["grad_norm"]) and aux["grad_norm"] > 0
    # params actually moved
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()), params2, p0
    )
    assert max(jax.tree_util.tree_leaves(diffs)) > 0


def test_step_deterministic(setup):
    env, apply_fn, step, params, opt_state, pool = setup

    def run():
        p = jax.tree_util.tree_map(jnp.copy, params)
        o = jax.tree_util.tree_map(jnp.copy, opt_state)
        p, o, aux = step.fn(p, o, *pool, jnp.int32(7))
        return jax.device_get(aux)["loss"]

    assert run() == run()


def test_outputs_replicated(setup):
    env, apply_fn, step, params, opt_state, pool = setup
    p = jax.tree_util.tree_map(jnp.copy, params)
    o = jax.tree_util.tree_map(jnp.copy, opt_state)
    p2, o2, aux = step.fn(p, o, *pool, jnp.int32(1))
    leaf = jax.tree_util.tree_leaves(p2)[0]
    assert leaf.sharding.is_fully_replicated


def test_loss_decreases_over_steps(setup):
    env, apply_fn, step, params, opt_state, pool = setup
    p = jax.tree_util.tree_map(jnp.copy, params)
    o = jax.tree_util.tree_map(jnp.copy, opt_state)
    losses = []
    for s in range(10):
        p, o, aux = step.fn(p, o, *pool, jnp.int32(s))
        losses.append(float(jax.device_get(aux)["loss"]))
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_eval_step(setup):
    env, apply_fn, step, params, opt_state, pool = setup
    eval_step = make_eval_step(apply_fn)
    img, _ = make_case_arrays(seed=99, shape=(32, 32, 32))
    pred = np.asarray(eval_step(params, jnp.asarray(zscore_np(img))))
    assert pred.shape == (32, 32, 32)
    assert pred.dtype == np.uint8
    assert set(np.unique(pred)) <= {0, 1, 2, 3}


def test_grad_accumulation_matches_mean_of_microbatches(setup):
    env, apply_fn, _, params, opt_state, pool = setup
    cfg2 = dataclasses.replace(CFG, grad_accum_steps=2)
    step2 = make_train_step(apply_fn, cfg2, env)
    p = jax.tree_util.tree_map(jnp.copy, params)
    o = jax.tree_util.tree_map(jnp.copy, opt_state)
    p2, o2, aux2 = step2.fn(p, o, *pool, jnp.int32(3))
    aux2 = jax.device_get(aux2)
    assert np.isfinite(aux2["loss"])

    # reference: two k=1 steps at the accumulation micro keys, grads averaged
    cfg1 = dataclasses.replace(CFG, grad_accum_steps=1)
    step1 = make_train_step(apply_fn, cfg1, env)
    losses = []
    for micro in (6, 7):  # step*k + i with step=3, k=2
        pa = jax.tree_util.tree_map(jnp.copy, params)
        oa = jax.tree_util.tree_map(jnp.copy, opt_state)
        _, _, aux1 = step1.fn(pa, oa, *pool, jnp.int32(micro))
        losses.append(float(jax.device_get(aux1)["loss"]))
    np.testing.assert_allclose(
        float(aux2["loss"]), np.mean(losses), rtol=1e-5
    )


def test_params_ema_tracker_math():
    """EMA transform: updates pass through unchanged; ema follows
    decay*ema + (1-decay)*(params+updates); get_ema_params finds the
    state inside a full chain (and returns None without one)."""
    import optax

    from brats2019_tpu.train.step import (
        get_ema_params,
        params_ema_tracker,
    )

    tx = params_ema_tracker(0.9)
    params = {"w": jnp.array([1.0, 2.0])}
    state = tx.init(params)
    np.testing.assert_array_equal(
        np.asarray(get_ema_params(state)["w"]), [1.0, 2.0]
    )
    updates = {"w": jnp.array([0.5, -0.5])}
    out_updates, state = tx.update(updates, state, params)
    np.testing.assert_array_equal(np.asarray(out_updates["w"]), [0.5, -0.5])
    # ema = 0.9 * init + 0.1 * (params + updates)
    np.testing.assert_allclose(
        np.asarray(get_ema_params(state)["w"]),
        0.9 * np.array([1.0, 2.0]) + 0.1 * np.array([1.5, 1.5]),
        rtol=1e-6,
    )
    # embedded in the full optimizer chain
    cfg = dataclasses.replace(CFG, ema_decay=0.99)
    full = make_optimizer(cfg)
    st = full.init(params)
    assert get_ema_params(st) is not None
    assert get_ema_params(make_optimizer(CFG).init(params)) is None


def test_train_step_tracks_ema(setup):
    """The compiled DP step updates the in-optimizer EMA exactly as the
    recurrence over the emitted params sequence predicts."""
    from brats2019_tpu.train.step import get_ema_params

    env, apply_fn, _, params, _, pools = setup
    decay = 0.5
    cfg = dataclasses.replace(CFG, ema_decay=decay)
    step = make_train_step(apply_fn, cfg, env)
    opt_state = jax.device_put(
        step.tx.init(params), env.replicated()
    )
    p, s = params, opt_state
    ema_ref = jax.tree_util.tree_map(np.asarray, params)
    for i in range(2):
        p, s, _ = step.fn(p, s, *pools, jnp.int32(i))
        ema_ref = jax.tree_util.tree_map(
            lambda e, q: decay * e + (1 - decay) * np.asarray(q), ema_ref, p
        )
    got = get_ema_params(s)
    for a, b in zip(
        jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(ema_ref)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7
        )
