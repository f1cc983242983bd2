"""Knowledge-distillation trainer (SURVEY.md C18)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brats2019_tpu.configs.presets import TrainConfig
from brats2019_tpu.data.preprocess import zscore_np
from brats2019_tpu.data.sampling import build_fg_table_np
from brats2019_tpu.data.synthetic import make_case_arrays
from brats2019_tpu.models import UNet3D, UNetConfig
from brats2019_tpu.parallel.mesh import make_mesh
from brats2019_tpu.train.distill import (
    KDConfig,
    ensemble_teacher_probs,
    kd_loss,
    make_kd_train_step,
)

CFG = TrainConfig(
    patch=(16, 16, 16), pool_shape=(32, 32, 32), pool_cases_per_device=1,
    batch_per_device=1, steps=8, warmup_steps=0, lr=1e-3,
)
S_CFG = UNetConfig(levels=2, base_features=4, compute_dtype="float32")
T_CFG = UNetConfig(levels=2, base_features=8, compute_dtype="float32")


def test_kd_loss_zero_when_matching():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 4, 4, 4)))
    probs_t = jax.nn.softmax(logits / 2.0, axis=-1)
    assert float(kd_loss(logits, probs_t, 2.0)) < 1e-5


def test_kd_loss_positive_when_differing():
    logits = jnp.zeros((1, 4, 4, 4, 4))
    probs_t = jax.nn.one_hot(jnp.ones((1, 4, 4, 4), jnp.int32), 4)
    assert float(kd_loss(logits, probs_t, 1.0)) > 0.5


def test_ensemble_probs_average():
    x = jnp.zeros((1, 8, 8, 8, 4))
    m = UNet3D(S_CFG)
    p1 = m.init(jax.random.PRNGKey(0), x)
    p2 = m.init(jax.random.PRNGKey(1), x)
    apply_fn = lambda p, v: m.apply(p, v)
    pe = ensemble_teacher_probs([apply_fn, apply_fn], [p1, p2], x, 1.0)
    i1 = jax.nn.softmax(m.apply(p1, x), -1)
    i2 = jax.nn.softmax(m.apply(p2, x), -1)
    np.testing.assert_allclose(np.asarray(pe), np.asarray((i1 + i2) / 2), atol=1e-5)


def test_kd_step_trains_student_toward_teacher():
    env = make_mesh()
    student = UNet3D(S_CFG)
    teacher = UNet3D(T_CFG)
    sp = student.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 4)))
    tp = teacher.init(jax.random.PRNGKey(7), jnp.zeros((1, 16, 16, 16, 4)))
    s_apply = lambda p, v: student.apply(p, v)
    t_apply = lambda p, v: teacher.apply(p, v)

    step = make_kd_train_step(
        s_apply, [t_apply], [tp], CFG, KDConfig(kd_weight=1.0), env
    )
    opt_state = step.tx.init(sp)
    repl = env.replicated()
    sp = jax.device_put(sp, repl)
    opt_state = jax.device_put(opt_state, repl)

    k = env.n_data
    imgs, segs, fgs = [], [], []
    for i in range(k):
        img, seg = make_case_arrays(seed=i, shape=(32, 32, 32))
        imgs.append(zscore_np(img)); segs.append(seg)
        fgs.append(build_fg_table_np(seg, 64))
    sh = env.data_sharded()
    pool = (
        jax.device_put(jnp.asarray(np.stack(imgs)), sh),
        jax.device_put(jnp.asarray(np.stack(segs)), sh),
        jax.device_put(jnp.asarray(np.stack(fgs)), sh),
    )

    kd_losses = []
    p, o = sp, opt_state
    for s in range(8):
        p, o, aux = step.fn(p, o, *pool, jnp.int32(s))
        aux = jax.device_get(aux)
        assert np.isfinite(aux["loss"])
        kd_losses.append(float(aux["kd_loss"]))
    assert np.mean(kd_losses[-3:]) < np.mean(kd_losses[:3])
