"""Pallas fused InstanceNorm+activation vs the jnp oracle (SURVEY.md §4.3
"Kernel tests"). Runs in TPU-interpret mode on the CPU test mesh; the same
kernel executes compiled on real TPU (exercised by bench/profile runs)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from brats2019_tpu.ops.norm import instance_norm_act_jnp
from brats2019_tpu.ops.pallas_norm import instance_norm_act_pallas, supports

# S = D*H*W must divide the 2048 block: (16,16,8) -> 2048
SHAPE = (2, 16, 16, 8, 8)


def _data(dtype=jnp.float32, seed=0):
    k = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(k, 3)
    x = jax.random.normal(k1, SHAPE, dtype) * 3.0 + 1.0
    gamma = jax.random.normal(k2, (SHAPE[-1],), jnp.float32) * 0.5 + 1.0
    beta = jax.random.normal(k3, (SHAPE[-1],), jnp.float32) * 0.2
    return x, gamma, beta


def test_supports():
    assert supports(SHAPE, "relu")
    assert not supports((1, 15, 16, 8, 8), "relu")   # ragged S
    assert not supports(SHAPE, "gelu")


@pytest.mark.parametrize("activation", ["relu", "leaky_relu", "none"])
def test_forward_matches_jnp(activation):
    x, gamma, beta = _data()
    ref = instance_norm_act_jnp(x, gamma, beta, activation=activation)
    with pltpu.force_tpu_interpret_mode():
        got = instance_norm_act_pallas(x, gamma, beta, activation=activation)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_forward_bf16():
    x, gamma, beta = _data(jnp.bfloat16)
    ref = instance_norm_act_jnp(x, gamma, beta, activation="relu")
    with pltpu.force_tpu_interpret_mode():
        got = instance_norm_act_pallas(x, gamma, beta, activation="relu")
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=0.05
    )


@pytest.mark.parametrize("activation", ["relu", "none"])
def test_gradients_match_jnp(activation):
    x, gamma, beta = _data()
    cot = jax.random.normal(jax.random.PRNGKey(9), SHAPE)

    def loss_ref(x, g, b):
        return jnp.sum(
            instance_norm_act_jnp(x, g, b, activation=activation) * cot
        )

    def loss_pal(x, g, b):
        return jnp.sum(
            instance_norm_act_pallas(x, g, b, activation=activation) * cot
        )

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_pal, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b, name in zip(gr, gp, ("dx", "dgamma", "dbeta")):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, err_msg=name
        )


def test_fallback_on_ragged_shape():
    # ragged spatial size silently uses the jnp path and still matches
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 7, 3, 4))
    gamma = jnp.ones((4,))
    beta = jnp.zeros((4,))
    ref = instance_norm_act_jnp(x, gamma, beta, activation="relu")
    got = instance_norm_act_pallas(x, gamma, beta, activation="relu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_no_scale_bias():
    x, _, _ = _data()
    ref = instance_norm_act_jnp(x, None, None, activation="relu")
    with pltpu.force_tpu_interpret_mode():
        got = instance_norm_act_pallas(x, None, None, activation="relu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
