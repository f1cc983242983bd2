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


def test_brain_bbox_fast_matches_oracle():
    """Strided+refined bbox must equal the full-scan oracle whenever the
    structure is >= stride thick along every axis (serving-path contract)."""
    from brats2019_tpu.data.preprocess import brain_bbox_fast_np, brain_bbox_np

    rng = np.random.default_rng(0)
    for seed in range(5):
        img, _ = make_case_arrays(seed=seed, shape=(64, 56, 48))
        exact = brain_bbox_np(img)
        fast = brain_bbox_fast_np(img)
        assert fast.lo == exact.lo and fast.hi == exact.hi

    # awkward offsets: structure deliberately not aligned to the stride grid
    img = np.zeros((40, 40, 40, 2), np.float32)
    img[7:29, 5:31, 9:27, :] = 1.0
    exact = brain_bbox_np(img)
    fast = brain_bbox_fast_np(img, stride=4)
    assert fast.lo == exact.lo and fast.hi == exact.hi

    # structure touching the volume edges
    img = np.zeros((33, 31, 37, 1), np.float32)
    img[0:33, 2:31, 1:37, :] = 1.0
    exact = brain_bbox_np(img)
    fast = brain_bbox_fast_np(img, stride=4)
    assert fast.lo == exact.lo and fast.hi == exact.hi

    # empty volume falls back to the exact scan's convention
    img = np.zeros((16, 16, 16, 4), np.float32)
    exact = brain_bbox_np(img)
    fast = brain_bbox_fast_np(img)
    assert fast.lo == exact.lo and fast.hi == exact.hi

    # thin structure (< stride): must still be correct via the fallback
    img = np.zeros((32, 32, 32, 1), np.float32)
    img[5:7, :, :, :] = 1.0  # 2 voxels thick along x, misses the s=4 grid? no:
    # x=5,6 -> neither is a multiple of 4... sub grid samples x=4? no, 4 is 0.
    # x in {5,6}: [::4] samples {0,4,8,...} -> misses -> fallback path
    exact = brain_bbox_np(img)
    fast = brain_bbox_fast_np(img, stride=4)
    assert fast.lo == exact.lo and fast.hi == exact.hi


def test_crop_cast_fit_matches_three_pass():
    import ml_dtypes

    from brats2019_tpu.data.pipeline import fit_to_canvas
    from brats2019_tpu.data.preprocess import (
        brain_bbox_np,
        crop_cast_fit_np,
        crop_np,
    )

    for shape, canvas in [
        ((48, 40, 32), (40, 40, 40)),   # mixed pad/crop per axis
        ((24, 24, 24), (32, 32, 32)),   # pure pad
        ((48, 48, 48), (32, 32, 32)),   # pure crop
    ]:
        img, _ = make_case_arrays(seed=1, shape=shape)
        bbox = brain_bbox_np(img)
        ref = fit_to_canvas(
            crop_np(img, bbox).astype(ml_dtypes.bfloat16), canvas
        )
        fused = crop_cast_fit_np(img, bbox, canvas)
        np.testing.assert_array_equal(
            np.asarray(ref, np.float32), np.asarray(fused, np.float32)
        )


def test_crop_cast_bucket_embed_matches_fit():
    """Bucketed transfer split (crop_cast_bucket_np + canvas embed) must be
    bitwise-identical to crop_cast_fit_np — the serving transfer path ships
    only the bucketed bbox and embeds on-device (Predictor._embed)."""
    from brats2019_tpu.data.preprocess import (
        brain_bbox_np,
        crop_cast_bucket_np,
        crop_cast_fit_np,
    )

    for shape, canvas, bucket in [
        ((48, 40, 32), (40, 40, 40), 16),  # mixed pad/crop per axis
        ((24, 24, 24), (32, 32, 32), 16),  # pure pad
        ((48, 48, 48), (32, 32, 32), 8),   # pure crop (trim)
        ((31, 29, 27), (32, 32, 32), 16),  # bucket clamps at canvas edge
        ((32, 32, 32), (32, 32, 32), 16),  # exact fit
    ]:
        img, _ = make_case_arrays(seed=2, shape=shape)
        bbox = brain_bbox_np(img)
        ref = crop_cast_fit_np(img, bbox, canvas)
        small, dst = crop_cast_bucket_np(img, bbox, canvas, bucket)
        # numpy-embed small into a zero canvas at dst
        out = np.zeros_like(ref)
        sl = tuple(
            slice(d, d + n) for d, n in zip(dst, small.shape[:3])
        )
        out[sl] = small
        np.testing.assert_array_equal(
            np.asarray(ref, np.float32), np.asarray(out, np.float32)
        )
        assert all(
            d + n <= c for d, n, c in zip(dst, small.shape[:3], canvas)
        )
