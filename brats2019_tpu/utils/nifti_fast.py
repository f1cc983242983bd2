"""ctypes binding for the native case loader (csrc/fastnifti.cpp).

``load_case_fast`` decodes all modalities of a BraTS case in parallel native
threads — gunzip + parse + F->C reorder + channel interleave + one-pass
nonzero stats & brain bbox — replacing four NumPy passes on the host hot
path (SURVEY.md C6). Falls back to None when the shared library hasn't been
built (``make -C csrc``); callers then use the pure-NumPy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "csrc",
    "libfastnifti.so",
)


class _FNInfo(ctypes.Structure):
    _fields_ = [
        ("dims", ctypes.c_int64 * 3),
        ("sum", ctypes.c_double),
        ("sumsq", ctypes.c_double),
        ("nonzero", ctypes.c_int64),
        ("bbox_lo", ctypes.c_int64 * 3),
        ("bbox_hi", ctypes.c_int64 * 3),
        ("ok", ctypes.c_int32),
        ("err", ctypes.c_char * 256),
    ]


_lib = None
_tried = False


def _ensure_lib():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    # Always run make: it is a no-op when the .so is current, and it prevents
    # loading a stale library against these argtypes after fastnifti.cpp
    # changes (the ABI gained an expect-dims parameter). The build is
    # serialized under an flock so concurrent first-users (multi-process
    # slice, parallel pytest) cannot dlopen a half-written .so — g++ writes
    # the output in place, and a torn write in a sibling process would at
    # best silently degrade it to the slow loader, at worst execute garbage.
    try:
        lock_path = _LIB_PATH + ".build.lock"
        with open(lock_path, "w") as lock_f:
            import fcntl

            fcntl.flock(lock_f, fcntl.LOCK_EX)
            try:
                subprocess.run(
                    ["make", "-C", os.path.dirname(_LIB_PATH)],
                    capture_output=True, timeout=120, check=True,
                )
            finally:
                fcntl.flock(lock_f, fcntl.LOCK_UN)
    except Exception:
        if not os.path.exists(_LIB_PATH):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    # ABI handshake: a stale .so (make failed above but an old build
    # exists) must never be called through these argtypes — signature
    # drift corrupts memory. Missing symbol or version mismatch -> pure-
    # Python fallback.
    _ABI_VERSION = 2  # keep in sync with FN_ABI_VERSION in fastnifti.cpp
    try:
        lib.fn_abi_version.restype = ctypes.c_int
        if lib.fn_abi_version() != _ABI_VERSION:
            return None
    except AttributeError:
        return None
    lib.fn_probe.argtypes = [ctypes.c_char_p, ctypes.c_int64 * 3]
    lib.fn_probe.restype = ctypes.c_int
    lib.fn_read_case.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64 * 3,
        ctypes.POINTER(_FNInfo),
        ctypes.c_int32,
    ]
    lib.fn_read_case.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _ensure_lib() is not None


def load_volumes_fast(
    paths: List[str],
) -> Optional[Tuple[np.ndarray, dict]]:
    """Decode N NIfTI files into one (X, Y, Z, N) float32 array natively.

    Returns (array, meta) or None when the native library is unavailable.
    meta carries per-volume nonzero stats and the union brain bbox:
    {"mean": (N,), "std": (N,), "bbox_lo": (3,), "bbox_hi": (3,)}.
    """
    lib = _ensure_lib()
    if lib is None:
        return None
    dims = (ctypes.c_int64 * 3)()
    if lib.fn_probe(paths[0].encode(), dims) != 0:
        return None
    shape = (dims[0], dims[1], dims[2], len(paths))
    out = np.empty(shape, dtype=np.float32)
    infos = (_FNInfo * len(paths))()
    c_paths = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    rc = lib.fn_read_case(
        c_paths,
        len(paths),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dims,
        infos,
        0,
    )
    if rc != 0:
        return None
    # Defense in depth: the native side already rejects dims mismatches
    # before writing, but never trust the buffer unless every decoded header
    # matched what we allocated for.
    for info in infos:
        if tuple(info.dims[:]) != (dims[0], dims[1], dims[2]):
            return None
    means, stds = [], []
    lo = np.array([dims[0], dims[1], dims[2]], np.int64)
    hi = np.zeros(3, np.int64)
    for info in infos:
        n = max(int(info.nonzero), 1)
        mu = info.sum / n
        var = max(info.sumsq / n - mu * mu, 0.0)
        means.append(mu)
        stds.append(var ** 0.5)
        if info.nonzero:
            lo = np.minimum(lo, np.array(info.bbox_lo[:], np.int64))
            hi = np.maximum(hi, np.array(info.bbox_hi[:], np.int64))
    if (hi <= lo).any():
        lo = np.zeros(3, np.int64)
        hi = np.array([dims[0], dims[1], dims[2]], np.int64)
    meta = {
        "mean": np.array(means, np.float64),
        "std": np.array(stds, np.float64),
        "bbox_lo": lo,
        "bbox_hi": hi,
    }
    return out, meta
