"""NIfTI-1 reader/writer round-trip tests (SURVEY.md §4.3 "Unit")."""

import gzip
import os
import struct

import numpy as np
import pytest

from brats2019_tpu.utils import nifti


@pytest.mark.parametrize("ext", [".nii", ".nii.gz"])
@pytest.mark.parametrize(
    "dtype", [np.uint8, np.int16, np.int32, np.float32, np.float64, np.uint16]
)
def test_roundtrip(tmp_path, ext, dtype):
    rng = np.random.default_rng(1)
    data = rng.integers(0, 100, size=(7, 9, 5)).astype(dtype)
    p = str(tmp_path / f"x{ext}")
    affine = np.array(
        [[-1.0, 0, 0, 3.5], [0, 2.0, 0, -1.0], [0, 0, 1.5, 0.0], [0, 0, 0, 1]]
    )
    nifti.write_nifti(p, data, affine=affine)
    back, hdr = nifti.read_nifti(p)
    np.testing.assert_array_equal(back, data)
    assert hdr.dim == (7, 9, 5)
    np.testing.assert_allclose(hdr.affine(), affine, atol=1e-6)


def test_fortran_order_semantics(tmp_path):
    # voxel [x, y, z] must survive the round trip positionally
    data = np.zeros((4, 5, 6), dtype=np.int16)
    data[1, 2, 3] = 42
    p = str(tmp_path / "a.nii")
    nifti.write_nifti(p, data)
    back, _ = nifti.read_nifti(p)
    assert back[1, 2, 3] == 42
    assert back.sum() == 42


def test_scl_scaling_applied(tmp_path):
    data = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    p = str(tmp_path / "s.nii")
    nifti.write_nifti(p, data)
    # patch in slope=2.0, inter=10.0
    with open(p, "rb") as f:
        raw = bytearray(f.read())
    struct.pack_into("<2f", raw, 112, 2.0, 10.0)
    with open(p, "wb") as f:
        f.write(raw)
    scaled, hdr = nifti.read_nifti(p)
    assert scaled.dtype == np.float32
    np.testing.assert_allclose(scaled, data * 2.0 + 10.0)
    unscaled, _ = nifti.read_nifti(p, apply_scaling=False)
    np.testing.assert_array_equal(unscaled, data)


def test_write_like_preserves_affine(tmp_path):
    rng = np.random.default_rng(2)
    vol = rng.normal(size=(6, 7, 8)).astype(np.float32)
    affine = np.diag([2.0, 2.0, 2.0, 1.0])
    affine[:3, 3] = [1.0, 2.0, 3.0]
    src = str(tmp_path / "src.nii.gz")
    nifti.write_nifti(src, vol, affine=affine)
    _, hdr = nifti.read_nifti(src)

    seg = rng.integers(0, 5, size=(6, 7, 8)).astype(np.uint8)
    dst = str(tmp_path / "seg.nii.gz")
    nifti.write_nifti(dst, seg, like=hdr)
    back, back_hdr = nifti.read_nifti(dst)
    np.testing.assert_array_equal(back, seg)
    np.testing.assert_allclose(back_hdr.affine(), affine, atol=1e-6)
    assert back_hdr.datatype == 2  # uint8


def test_big_endian_read(tmp_path):
    # hand-build a minimal big-endian header + payload
    data = np.arange(8, dtype=np.int16).reshape(2, 2, 2)
    raw = bytearray(348)
    struct.pack_into(">i", raw, 0, 348)
    struct.pack_into(">8h", raw, 40, 3, 2, 2, 2, 1, 1, 1, 1)
    struct.pack_into(">2h", raw, 70, 4, 16)
    struct.pack_into(">8f", raw, 76, 1, 1, 1, 1, 1, 1, 1, 1)
    struct.pack_into(">f", raw, 108, 352.0)
    raw[344:348] = b"n+1\x00"
    p = str(tmp_path / "be.nii")
    with open(p, "wb") as f:
        f.write(bytes(raw) + b"\x00" * 4)
        f.write(data.byteswap().tobytes(order="F"))
    back, hdr = nifti.read_nifti(p)
    assert hdr.byteswapped
    np.testing.assert_array_equal(back, data)


def test_gzip_detection_and_determinism(tmp_path):
    data = np.ones((3, 3, 3), dtype=np.uint8)
    p1, p2 = str(tmp_path / "a.nii.gz"), str(tmp_path / "b.nii.gz")
    nifti.write_nifti(p1, data)
    nifti.write_nifti(p2, data)
    assert open(p1, "rb").read() == open(p2, "rb").read()  # mtime=0 determinism
    with gzip.open(p1, "rb") as f:
        assert f.read(4) == struct.pack("<i", 348)


def test_singleton_fourth_dim_squeezed(tmp_path):
    # common in the wild: dim[0]=4 with a trailing singleton time axis
    data = np.random.default_rng(5).integers(0, 50, (6, 5, 4)).astype(np.int16)
    p = str(tmp_path / "t4.nii")
    nifti.write_nifti(p, data[..., None])  # write as (6,5,4,1)
    back, hdr = nifti.read_nifti(p)
    assert back.shape == (6, 5, 4)
    np.testing.assert_array_equal(back, data)


# --- malformed-input robustness (SURVEY.md §7.3 hard part #1: the reader
# must fail LOUDLY on corrupt files, never crash or mis-read silently) ---


def _valid_bytes() -> bytearray:
    import tempfile

    data = np.arange(24, dtype=np.int16).reshape(2, 3, 4)

    with tempfile.NamedTemporaryFile(suffix=".nii", delete=False) as f:
        path = f.name
    nifti.write_nifti(path, data)
    raw = bytearray(open(path, "rb").read())
    os.unlink(path)
    return raw


def _write(tmp_path, raw, name="bad.nii"):
    p = str(tmp_path / name)
    with open(p, "wb") as f:
        f.write(raw)
    return p


def test_truncated_header_raises(tmp_path):
    raw = _valid_bytes()[:100]
    with pytest.raises(ValueError, match="truncated"):
        nifti.read_nifti(_write(tmp_path, raw))


def test_bad_magic_sizeof_hdr_raises(tmp_path):
    raw = _valid_bytes()
    struct.pack_into("<i", raw, 0, 999)  # sizeof_hdr wrong in both endians
    with pytest.raises(ValueError, match="Not a NIfTI-1"):
        nifti.read_nifti(_write(tmp_path, raw))


def test_bad_ndim_raises(tmp_path):
    raw = _valid_bytes()
    struct.pack_into("<h", raw, 40, 0)  # dim[0] = 0
    with pytest.raises(ValueError, match="ndim"):
        nifti.read_nifti(_write(tmp_path, raw))


def test_negative_dim_raises(tmp_path):
    raw = _valid_bytes()
    struct.pack_into("<h", raw, 42, -2)  # dim[1] = -2
    with pytest.raises(ValueError, match="positive"):
        nifti.read_nifti(_write(tmp_path, raw))


def test_unsupported_datatype_raises(tmp_path):
    raw = _valid_bytes()
    struct.pack_into("<h", raw, 70, 1)  # DT_BINARY — unsupported
    with pytest.raises(ValueError, match="datatype"):
        nifti.read_nifti(_write(tmp_path, raw))


def test_bad_vox_offset_raises(tmp_path):
    raw = _valid_bytes()
    struct.pack_into("<f", raw, 108, 100.0)  # points inside the header
    with pytest.raises(ValueError, match="vox_offset"):
        nifti.read_nifti(_write(tmp_path, raw))


def test_truncated_data_raises(tmp_path):
    raw = _valid_bytes()
    with pytest.raises(ValueError, match="truncated"):
        nifti.read_nifti(_write(tmp_path, raw[:-10]))


def test_gzip_garbage_raises(tmp_path):
    p = str(tmp_path / "junk.nii.gz")
    with open(p, "wb") as f:
        f.write(b"\x1f\x8b" + b"\x00" * 64)  # gzip magic, garbage stream
    with pytest.raises((OSError, EOFError, ValueError)):
        nifti.read_nifti(p)


def test_write_unsupported_dtype_raises(tmp_path):
    with pytest.raises(ValueError, match="dtype"):
        nifti.write_nifti(
            str(tmp_path / "c.nii"), np.zeros((2, 2, 2), dtype=np.complex64)
        )
