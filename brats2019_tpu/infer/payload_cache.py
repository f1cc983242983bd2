"""On-disk transfer-payload cache for the serving/predict path (VERDICT r3
#5; SURVEY.md C6's cache idea applied to inference).

Round 3 gave the TRAIN pool refresh a prep cache (2099 -> 33 ms/case,
``data/pipeline.py``); serve/predict kept re-decoding every arrival from
gzip NIfTI. This module caches the post-bbox *transfer payload* — the exact
bytes ``Predictor._encode_host`` would ship across the host->device link
(bucketed brain crop in bf16 or int8, its canvas offset, and the brain
bbox) — keyed by the case's input-file signature and every prep parameter
that determines the encoding. A hit skips gzip inflate, the brain-bbox
scan, and crop/cast/quantize; the payload is bitwise what the uncached
path ships, so the resulting masks are identical (tests/test_payload_cache.py).

Entry lifecycle mirrors the train prep cache: atomic tmp+rename writes
(concurrent serve shards may share a cache dir), corrupt entries are
discarded and rebuilt, and superseded entries for the same case+params
(older signature or version) are pruned so re-uploads never leak orphans.
"""

from __future__ import annotations

import os
import sys
from typing import Optional, Tuple

import numpy as np

import ml_dtypes

from ..data.pipeline import _case_signature_hash
from ..data.preprocess import BBox

BF16 = np.dtype(ml_dtypes.bfloat16)

# bump when the payload semantics change (stale entries become unreadable
# by construction: the version is part of the filename)
PAYLOAD_CACHE_VERSION = 1

Payload = Tuple[np.ndarray, Optional[np.ndarray], BBox]


def payload_cache_path(
    cache_dir: str,
    case_dir: str,
    canvas: Tuple[int, int, int],
    bucket: Optional[int],
    transfer_dtype: str,
) -> str:
    """Cache filename keyed by everything that determines the payload:
    version, canvas, transfer bucket, transfer dtype, and the (mtime_ns,
    size) signature of the case's modality files (seg files are ignored —
    prediction never reads them, so uploading labels next to an already
    cached case must not invalidate it). The case identity component is
    basename PLUS a short hash of the absolute directory, so two roots
    holding same-named copies of a case (fold0/X, fold1/X) never evict
    each other's entries via _prune_superseded."""
    import hashlib

    h = _case_signature_hash(case_dir, with_seg=False)
    norm = os.path.normpath(os.path.abspath(case_dir))
    dirh = hashlib.sha1(norm.encode()).hexdigest()[:8]
    base = f"{os.path.basename(norm)}-{dirh}"
    c = "x".join(map(str, canvas))
    b = f"b{bucket}" if bucket else "b0"
    return os.path.join(
        cache_dir,
        f"{base}.pv{PAYLOAD_CACHE_VERSION}.c{c}.{b}.{transfer_dtype}.{h}.npz",
    )


def load_payload(path: str) -> Optional[Payload]:
    """Read a payload entry; None on miss, corrupt entries are discarded
    (the caller rebuilds and overwrites)."""
    if not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            small = z["small"]
            if small.dtype == np.uint16:  # bf16 stored as its bit pattern
                small = small.view(BF16)
            dst = z["dst"] if z["has_dst"] else None
            bbox = BBox(
                tuple(int(v) for v in z["bbox_lo"]),
                tuple(int(v) for v in z["bbox_hi"]),
                tuple(int(v) for v in z["full_shape"]),
            )
            return small, dst, bbox
    except Exception as e:  # noqa: BLE001 — corrupt entry: rebuild
        print(f"[payload-cache] discarding corrupt entry {path}: {e}",
              file=sys.stderr, flush=True)
        return None


def store_payload(
    path: str, small: np.ndarray, dst: Optional[np.ndarray], bbox: BBox
) -> None:
    """Atomic (tmp+rename) uncompressed-npz write + prune of superseded
    entries for the same case+params. Write failures degrade to uncached
    operation — serving must never die because a cache volume filled up."""
    import threading

    cache_dir = os.path.dirname(path)
    small = np.asarray(small)
    if small.dtype == BF16:  # bf16 has no stable npz encoding
        small = small.view(np.uint16)
    # pid AND thread id: serving_depth>1 prep threads in one process may
    # miss the same case concurrently — a shared tmp name would interleave
    # their writes and publish a corrupt entry
    tmp = f"{path}.{os.getpid()}.{threading.get_ident()}.tmp"
    try:
        os.makedirs(cache_dir, exist_ok=True)
        # uncompressed: the point is to beat gzip-decode time; savez gets a
        # FILE OBJECT so it cannot append its own .npz suffix to the name
        with open(tmp, "wb") as f:
            np.savez(
                f,
                small=small,
                has_dst=dst is not None,
                dst=np.zeros(3, np.int32) if dst is None else np.asarray(dst),
                bbox_lo=np.asarray(bbox.lo, np.int32),
                bbox_hi=np.asarray(bbox.hi, np.int32),
                full_shape=np.asarray(bbox.full_shape, np.int32),
            )
        os.replace(tmp, path)
        _prune_superseded(cache_dir, os.path.basename(path))
    except OSError as e:
        print(f"[payload-cache] write failed ({e}); continuing uncached",
              file=sys.stderr, flush=True)
        try:
            os.remove(tmp)
        except OSError:
            pass


def _entry_key(fn: str):
    """(base, canvas, bucket, dtype) from
    ``base.pvN.cC.bB.DTYPE.hash.npz`` — version and signature hash are
    deliberately NOT part of the key, so a bumped version or re-uploaded
    case supersedes (and prunes) the old entry."""
    parts = fn.rsplit(".", 6)
    if len(parts) != 7 or not parts[1].startswith("pv"):
        return None
    return (parts[0], parts[2], parts[3], parts[4])


def _prune_superseded(cache_dir: str, mine: str) -> None:
    """Remove same-key entries older than the one just written. Entries
    with a NEWER mtime are left alone: with two serve shards racing on a
    re-uploaded case, the later writer must win regardless of deletion
    order (lookups self-validate via the signature hash in the filename,
    so the worst case of any remaining race is one wasted re-encode, never
    a wrong payload)."""
    key = _entry_key(mine)
    if key is None:
        return
    try:
        my_mtime = os.path.getmtime(os.path.join(cache_dir, mine))
    except OSError:
        return
    for fn in os.listdir(cache_dir):
        if fn.endswith(".npz") and fn != mine and _entry_key(fn) == key:
            p = os.path.join(cache_dir, fn)
            try:
                if os.path.getmtime(p) <= my_mtime:
                    os.remove(p)
            except OSError:
                pass
