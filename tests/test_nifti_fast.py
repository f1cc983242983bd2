"""Native fast loader vs pure-python reader (SURVEY.md C6 native path)."""

import numpy as np
import pytest

from brats2019_tpu.data import synthetic
from brats2019_tpu.data.case import load_case, modality_paths
from brats2019_tpu.data.preprocess import brain_bbox_np
from brats2019_tpu.utils import nifti_fast


pytestmark = pytest.mark.skipif(
    not nifti_fast.available(), reason="libfastnifti.so not built"
)


@pytest.fixture(scope="module")
def case_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("fastnifti")
    return synthetic.write_case(str(root / "BraTS19_F_1"), shape=(48, 40, 32))


def test_matches_python_reader(case_dir):
    paths = modality_paths(case_dir)
    res = nifti_fast.load_volumes_fast(paths)
    assert res is not None
    fast, meta = res
    ref = load_case(case_dir, load_seg=False).image
    assert fast.shape == ref.shape
    np.testing.assert_allclose(fast, ref, atol=1e-4)


def test_mismatched_modality_dims_rejected(tmp_path):
    """A case whose modalities disagree on shape must fail cleanly, not
    write out of bounds (ADVICE round-1 high: heap corruption repro)."""
    from brats2019_tpu.utils.nifti import write_nifti

    a = tmp_path / "vol_a.nii.gz"
    b = tmp_path / "vol_b.nii.gz"  # larger than a: OOB if trusted blindly
    write_nifti(str(a), np.ones((16, 16, 16), np.int16))
    write_nifti(str(b), np.ones((64, 64, 64), np.int16))
    assert nifti_fast.load_volumes_fast([str(a), str(b)]) is None
    # python path reads the true (differing) shapes for the same files
    from brats2019_tpu.utils.nifti import read_nifti

    assert read_nifti(str(a))[0].shape != read_nifti(str(b))[0].shape


def test_nan_scl_slope_matches_python_reader(tmp_path):
    """NaN scl_slope/inter mean 'unset'; native and python backends must
    agree (ADVICE round-1 low: native used to produce all-NaN volumes)."""
    import struct

    from brats2019_tpu.utils.nifti import read_nifti, write_nifti

    p = tmp_path / "nanscl.nii"
    data = (np.arange(4 * 4 * 4, dtype=np.int16)).reshape(4, 4, 4)
    write_nifti(str(p), data)
    raw = bytearray(p.read_bytes())
    struct.pack_into("<2f", raw, 112, float("nan"), float("nan"))
    p.write_bytes(bytes(raw))

    fast, _ = nifti_fast.load_volumes_fast([str(p)])
    ref, _hdr = read_nifti(str(p), apply_scaling=True)
    assert np.isfinite(fast).all()
    np.testing.assert_allclose(fast[..., 0], ref.astype(np.float32))


def test_stats_and_bbox_match(case_dir):
    paths = modality_paths(case_dir)
    fast, meta = nifti_fast.load_volumes_fast(paths)
    for c in range(4):
        vals = fast[..., c][fast[..., c] != 0]
        np.testing.assert_allclose(meta["mean"][c], vals.mean(), rtol=1e-5)
        np.testing.assert_allclose(meta["std"][c], vals.std(), rtol=1e-4)
    bbox = brain_bbox_np(fast)
    np.testing.assert_array_equal(meta["bbox_lo"], bbox.lo)
    np.testing.assert_array_equal(meta["bbox_hi"], bbox.hi)


def _corrupt(tmp_path, name, mutate):
    """Write a small valid .nii then apply ``mutate(bytearray)``."""
    import struct

    from brats2019_tpu.utils.nifti import write_nifti

    p = tmp_path / name
    write_nifti(str(p), np.ones((4, 4, 4), np.int16))
    raw = bytearray(p.read_bytes())
    mutate(raw, struct)
    p.write_bytes(bytes(raw))
    return str(p)


def test_negative_dim_fails_cleanly(tmp_path):
    """dim[1] = -1 used to wrap the truncation check (size_t) and throw
    bad_alloc across the C ABI -> std::terminate of the host process. Must
    be an ordinary failure (None), process alive."""
    p = _corrupt(
        tmp_path, "negdim.nii",
        lambda raw, struct: struct.pack_into("<h", raw, 42, -1),
    )
    assert nifti_fast.load_volumes_fast([p]) is None


def test_bad_vox_offset_fails_cleanly(tmp_path):
    p = _corrupt(
        tmp_path, "voxoff.nii",
        lambda raw, struct: struct.pack_into("<f", raw, 108, 100.0),
    )
    assert nifti_fast.load_volumes_fast([p]) is None


def test_gzip_garbage_fails_cleanly(tmp_path):
    p = str(tmp_path / "junk.nii.gz")
    with open(p, "wb") as f:
        f.write(b"\x1f\x8b" + b"\x00" * 64)
    assert nifti_fast.load_volumes_fast([p]) is None


def test_truncated_data_fails_cleanly(tmp_path):
    from brats2019_tpu.utils.nifti import write_nifti

    p = tmp_path / "trunc.nii"
    write_nifti(str(p), np.ones((8, 8, 8), np.int16))
    p.write_bytes(p.read_bytes()[:-32])
    assert nifti_fast.load_volumes_fast([str(p)]) is None
