"""ops/pallas_conv.py: the Mosaic direct conv3d (non-default backend;
PERF.md round 3 records the decisive XLA-wins A/B). Correctness vs the
XLA conv in interpret mode on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from brats2019_tpu.ops.pallas_conv import conv3d_pallas

DIMS = ("NDHWC", "DHWIO", "NDHWC")


@pytest.mark.parametrize("shape", [(1, 8, 8, 8, 8), (2, 8, 16, 8, 4)])
def test_conv3d_pallas_matches_xla(shape):
    B, D, H, W, CI = shape
    CO = 16
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, CI, CO),
                          jnp.float32)
    ref = lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME", dimension_numbers=DIMS
    )
    got = conv3d_pallas(x, w, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_conv3d_pallas_rejects_bad_shapes():
    x = jnp.zeros((1, 8, 12, 8, 4))  # H % 8 != 0
    w = jnp.zeros((3, 3, 3, 4, 8))
    with pytest.raises(AssertionError):
        conv3d_pallas(x, w, interpret=True)
