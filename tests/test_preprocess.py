"""Preprocess ops vs NumPy oracles (SURVEY.md §4.3)."""

import jax
import jax.numpy as jnp
import numpy as np

from brats2019_tpu.data import preprocess as pp
from brats2019_tpu.data.synthetic import make_case_arrays


def test_zscore_matches_numpy_oracle(rng):
    img = rng.normal(size=(10, 12, 8, 4)).astype(np.float32)
    img[img < -0.5] = 0.0  # background
    ref = pp.zscore_np(img)
    got = np.asarray(jax.jit(pp.zscore)(jnp.asarray(img)))
    np.testing.assert_allclose(got, ref, atol=1e-4)
    # zeros stay exactly zero
    assert (got[img == 0] == 0).all()


def test_zscore_stats(rng):
    img, _ = make_case_arrays(seed=3, shape=(40, 40, 24))
    z = np.asarray(jax.jit(pp.zscore)(jnp.asarray(img)))
    for c in range(4):
        vals = z[..., c][img[..., c] != 0]
        assert abs(vals.mean()) < 1e-2
        assert abs(vals.std() - 1.0) < 1e-2


def test_bbox_crop_uncrop(rng):
    img = np.zeros((20, 22, 24, 2), dtype=np.float32)
    img[3:10, 5:15, 7:20, :] = 1.0
    bbox = pp.brain_bbox_np(img)
    assert bbox.lo == (3, 5, 7)
    assert bbox.hi == (10, 15, 20)
    cropped = pp.crop_np(img, bbox)
    assert cropped.shape == (7, 10, 13, 2)
    back = pp.uncrop_np(cropped, bbox)
    np.testing.assert_array_equal(back, img)


def test_bbox_margin_and_empty():
    img = np.zeros((10, 10, 10, 1), dtype=np.float32)
    bbox = pp.brain_bbox_np(img)
    assert bbox.lo == (0, 0, 0) and bbox.hi == (10, 10, 10)
    img[5, 5, 5, 0] = 1.0
    bbox = pp.brain_bbox_np(img, margin=2)
    assert bbox.lo == (3, 3, 3) and bbox.hi == (8, 8, 8)


def test_mask_bbox_center():
    mask = np.zeros((16, 16, 16), dtype=bool)
    mask[4:8, 2:10, 6:7] = True
    c = np.asarray(jax.jit(pp.mask_bbox_center)(jnp.asarray(mask)))
    np.testing.assert_array_equal(c, [6, 6, 6])  # ((4+7+1)//2, (2+9+1)//2, 6)
    empty = np.zeros((16, 16, 16), dtype=bool)
    c = np.asarray(jax.jit(pp.mask_bbox_center)(jnp.asarray(empty)))
    np.testing.assert_array_equal(c, [8, 8, 8])


def test_centered_crop_start_clamps():
    center = jnp.array([2, 60, 32], dtype=jnp.int32)
    start = np.asarray(
        pp.centered_crop_start(center, (32, 32, 32), (64, 64, 64))
    )
    np.testing.assert_array_equal(start, [0, 32, 16])


def test_pad_to_multiple():
    vol = np.ones((50, 60, 33, 4), dtype=np.float32)
    padded, orig = pp.pad_to_multiple_np(vol, (32, 32, 32))
    assert padded.shape == (64, 64, 64, 4)
    assert orig == (50, 60, 33)
    assert padded[50:].sum() == 0
