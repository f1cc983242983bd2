"""ops/pallas_winograd.py: the VMEM-resident Winograd F(2,3) conv3d
(non-default backend; PERF.md round 4 records the decisive XLA-wins
kill-test — 0.54-0.93x at every flagship shape, VPU-transform-bound).
Correctness vs the XLA conv in interpret mode on CPU, including the
h-blocked geometry that fixed the 64^3 scoped-VMEM overflow
(27.44 MB vs the 16 MB limit)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from brats2019_tpu.ops.pallas_winograd import (
    _VMEM_BUDGET,
    _pick_thb,
    _vmem_bytes,
    conv3d_winograd,
    transform_weights,
)

DIMS = ("NDHWC", "DHWIO", "NDHWC")


def _ref(x, w):
    return lax.conv_general_dilated(
        x.astype(jnp.float32), w, (1, 1, 1), "SAME",
        dimension_numbers=DIMS)


@pytest.mark.parametrize("shape,co", [
    ((1, 8, 8, 8, 8), 16),
    ((2, 8, 16, 8, 4), 8),
])
def test_winograd_matches_xla_f32(shape, co):
    # f32 end to end: F(2,3)'s matrices are exact in binary fp, so the
    # decomposition itself should agree with the direct conv tightly.
    B, D, H, W, CI = shape
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, CI, co),
                          jnp.float32) / np.sqrt(27 * CI)
    got = conv3d_winograd(x, w, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_ref(x, w)), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("thb", [4, 2, 1])
def test_winograd_h_blocking_exact(thb):
    # Every h-block geometry must produce the identical decomposition
    # (the blocked windows only re-tile the grid; no numerics change).
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 16, 8, 4),
                          jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 3, 4, 8),
                          jnp.float32) / np.sqrt(27 * 4)
    full = conv3d_winograd(x, w, interpret=True, thb=8)
    blocked = conv3d_winograd(x, w, interpret=True, thb=thb)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(blocked))
    np.testing.assert_allclose(
        np.asarray(blocked), np.asarray(_ref(x, w)), rtol=1e-4, atol=1e-4)


def test_winograd_bf16_rounding_class():
    # bf16 path stays within a small multiple of XLA's own bf16 error.
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 8, 8),
                          jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 8, 8),
                          jnp.float32) / np.sqrt(27 * 8)
    ref = _ref(x, w)
    e_xla = float(jnp.max(jnp.abs(
        lax.conv_general_dilated(
            x, w.astype(jnp.bfloat16), (1, 1, 1), "SAME",
            dimension_numbers=DIMS).astype(jnp.float32) - ref)))
    for acc_bf16 in (False, True):
        y = conv3d_winograd(x, w, interpret=True, acc_bf16=acc_bf16)
        e = float(jnp.max(jnp.abs(y.astype(jnp.float32) - ref)))
        assert e <= 8 * max(e_xla, 1e-3), (acc_bf16, e, e_xla)


def test_weight_transform_shape_and_constant_response():
    # U has one row per Winograd point; an all-ones 1-channel kernel on
    # a constant input must reproduce the direct conv exactly.
    w = jnp.ones((3, 3, 3, 1, 1), jnp.float32)
    assert transform_weights(w).shape == (64, 1, 1)
    x = jnp.ones((1, 4, 4, 4, 1), jnp.float32)
    got = conv3d_winograd(x, w, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_ref(x, w)), rtol=1e-5, atol=1e-5)


def test_pick_thb_respects_budget_and_divisibility():
    for th, tw, ci, co in [(32, 32, 32, 64), (32, 32, 64, 64),
                           (16, 16, 64, 128), (16, 16, 128, 128)]:
        thb = _pick_thb(th, tw, ci, co, False)
        assert th % thb == 0
        assert _vmem_bytes(thb, tw, ci, co, False) <= _VMEM_BUDGET
    # The flagship 64^3 shapes MUST block (the unblocked plane measured
    # 27.44 MB scoped VMEM on the compiler); 32^3 stays unblocked.
    assert _pick_thb(32, 32, 32, 64, False) < 32
    assert _pick_thb(16, 16, 64, 128, False) == 16


def test_winograd_rejects_odd_dims():
    x = jnp.zeros((1, 7, 8, 8, 4), jnp.float32)
    w = jnp.zeros((3, 3, 3, 4, 8), jnp.float32)
    with pytest.raises(AssertionError):
        conv3d_winograd(x, w, interpret=True)
