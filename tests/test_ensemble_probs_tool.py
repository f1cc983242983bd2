"""Offline probability-map ensembling tool (tools/ensemble_probs.py):
the cross-machine half of the ensembling story — average saved
``<case>_probs.npz`` artifacts into a final mask."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)
import ensemble_probs  # noqa: E402

from brats2019_tpu.utils.nifti import read_nifti, write_nifti  # noqa: E402


def _save_npz(path, probs):
    np.savez_compressed(
        path,
        probs=probs.astype(np.float16),
        classes=np.array([0, 1, 2, 4], np.int32),
    )


def test_ensemble_probs_npz_weighted_mean(tmp_path):
    a = np.random.default_rng(0).random((4, 4, 2, 4)).astype(np.float32)
    b = np.random.default_rng(1).random((4, 4, 2, 4)).astype(np.float32)
    pa, pb = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
    _save_npz(pa, a)
    _save_npz(pb, b)
    a16 = a.astype(np.float16).astype(np.float32)
    b16 = b.astype(np.float16).astype(np.float32)
    m = ensemble_probs.ensemble_probs_npz([pa, pb])
    np.testing.assert_allclose(m, (a16 + b16) / 2, rtol=1e-6)
    # weighted: 3:1
    mw = ensemble_probs.ensemble_probs_npz([pa, pb], weights=[3.0, 1.0])
    np.testing.assert_allclose(mw, 0.75 * a16 + 0.25 * b16, rtol=1e-6)


def test_ensemble_probs_npz_errors(tmp_path):
    a = np.zeros((2, 2, 1, 4), np.float32)
    pa = str(tmp_path / "a.npz")
    _save_npz(pa, a)
    pb = str(tmp_path / "b.npz")
    np.savez_compressed(
        pb, probs=a.astype(np.float16),
        classes=np.array([0, 2, 1, 4], np.int32),  # different order
    )
    with pytest.raises(ValueError):
        ensemble_probs.ensemble_probs_npz([pa, pb])
    pc = str(tmp_path / "c.npz")
    _save_npz(pc, np.zeros((3, 2, 1, 4), np.float32))  # different shape
    with pytest.raises(ValueError):
        ensemble_probs.ensemble_probs_npz([pa, pc])
    with pytest.raises(ValueError):
        ensemble_probs.ensemble_probs_npz([pa], weights=[1.0, 2.0])
    with pytest.raises(ValueError):
        ensemble_probs.ensemble_probs_npz([pa], weights=[0.0])


def test_ensemble_probs_main_writes_mask(tmp_path):
    shape = (8, 8, 4)
    rng = np.random.default_rng(7)
    a = rng.random(shape + (4,)).astype(np.float32)
    b = rng.random(shape + (4,)).astype(np.float32)
    pa, pb = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
    _save_npz(pa, a)
    _save_npz(pb, b)
    like = str(tmp_path / "flair.nii.gz")
    write_nifti(like, np.zeros(shape, np.float32))
    out = str(tmp_path / "pred.nii.gz")
    rc = ensemble_probs.main([
        pa, pb, "--like", like, "--out", out,
        "--min-component-voxels", "0", "--et-min-voxels", "0",
    ])
    assert rc == 0
    seg, _ = read_nifti(out, apply_scaling=False)
    a16 = a.astype(np.float16).astype(np.float32)
    b16 = b.astype(np.float16).astype(np.float32)
    want_internal = np.argmax((a16 + b16) / 2, -1)
    from brats2019_tpu.data.constants import internal_to_disk

    np.testing.assert_array_equal(seg, internal_to_disk(want_internal))
    # class-order mismatch surfaces as exit code 2, not a wrong mask
    pbad = str(tmp_path / "bad.npz")
    np.savez_compressed(
        pbad, probs=a.astype(np.float16),
        classes=np.array([0, 2, 1, 4], np.int32),
    )
    assert ensemble_probs.main(
        [pa, pbad, "--like", like, "--out", out]
    ) == 2
