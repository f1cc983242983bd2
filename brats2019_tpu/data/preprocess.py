"""Preprocessing: per-modality z-score + brain-bbox crop (SURVEY.md C2, C3, N4).

Two implementations of each op:

* ``*_np`` — host NumPy, used once per case at ingest (data-dependent crop
  shapes live on the host; SURVEY.md §7.3.2) and as the oracle in tests.
* jnp versions — shape-static, jit-able, fused into the on-device
  preprocessing graph (N4: replaces the reference's NumPy/CPU notebook
  loaders, BASELINE.json:5). Nonzero (brain) statistics are computed with
  masked reductions so the whole graph stays static-shaped.

Convention: image is channels-last ``(X, Y, Z, C)``; background voxels are
exactly zero in raw BraTS volumes (skull-stripped [B]) and stay exactly zero
after normalization (C2 "background stays 0").
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# z-score over nonzero voxels, per modality (C2)
# ---------------------------------------------------------------------------

def zscore_np(image: np.ndarray, eps: float = 1e-6) -> np.ndarray:
    """Per-channel z-score over nonzero voxels; zeros stay zero."""
    out = np.zeros_like(image, dtype=np.float32)
    for c in range(image.shape[-1]):
        vol = image[..., c]
        mask = vol != 0
        if mask.any():
            vals = vol[mask].astype(np.float64)
            mu = vals.mean()
            sd = vals.std()
            out[..., c][mask] = ((vol[mask] - mu) / (sd + eps)).astype(np.float32)
    return out


def zscore(image: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """jit-able per-channel z-score over nonzero voxels (masked reductions).

    image: (..., C) — statistics reduce over all leading (spatial) axes.
    """
    axes = tuple(range(image.ndim - 1))
    mask = image != 0
    n = jnp.maximum(jnp.sum(mask, axis=axes, dtype=jnp.float32), 1.0)
    s = jnp.sum(jnp.where(mask, image, 0.0), axis=axes, dtype=jnp.float32)
    mu = s / n
    sq = jnp.sum(jnp.where(mask, (image - mu) ** 2, 0.0), axis=axes, dtype=jnp.float32)
    sd = jnp.sqrt(sq / n)
    z = (image - mu) / (sd + eps)
    return jnp.where(mask, z, 0.0).astype(jnp.float32)


# ---------------------------------------------------------------------------
# brain bounding box + crop (C3)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class BBox:
    """Half-open 3D bounding box with the original volume shape for un-crop."""

    lo: Tuple[int, int, int]
    hi: Tuple[int, int, int]
    full_shape: Tuple[int, int, int]

    @property
    def shape(self) -> Tuple[int, int, int]:
        return tuple(h - l for l, h in zip(self.lo, self.hi))


def brain_bbox_np(image: np.ndarray, margin: int = 0) -> BBox:
    """Nonzero bounding box over all channels (any-channel nonzero)."""
    mask = np.any(image != 0, axis=-1) if image.ndim == 4 else image != 0
    full = mask.shape
    if not mask.any():
        return BBox((0, 0, 0), full, full)
    lo, hi = [], []
    for ax in range(3):
        other = tuple(a for a in range(3) if a != ax)
        prof = mask.any(axis=other)
        idx = np.where(prof)[0]
        lo.append(max(0, int(idx[0]) - margin))
        hi.append(min(full[ax], int(idx[-1]) + 1 + margin))
    return BBox(tuple(lo), tuple(hi), full)


def brain_bbox_fast_np(
    image: np.ndarray, stride: int = 4, margin: int = 0
) -> BBox:
    """Fast exact brain bbox: strided pre-scan + walk-out slab refinement.

    The full-resolution scan in ``brain_bbox_np`` reads the whole volume
    (143 MB for a BraTS case — ~165 ms on this 1-core host). This version
    scans ``image[::stride,::stride,::stride]`` (~5 ms) to bracket each
    face, then reads full-cross-section boundary slabs, walking outward one
    stride at a time until the extreme occupied plane lies strictly inside
    the scanned region — recovering the EXACT per-axis extents (~15 ms).

    Exactness contract: identical to ``brain_bbox_np`` whenever every
    connected foreground component contains at least one voxel on the
    ``stride``^3 sample grid (always true for skull-stripped brains; a
    detached speck thinner than ``stride`` in any axis may be missed).
    Nothing detected on the grid at all -> exact full-scan fallback.
    Tested against the oracle in tests/test_preprocess.py.
    """
    full = image.shape[:3]
    sub = image[::stride, ::stride, ::stride]
    sub_mask = np.any(sub != 0, axis=-1) if image.ndim == 4 else sub != 0
    if not sub_mask.any():
        return brain_bbox_np(image, margin=margin)  # thin/empty: exact scan

    def axis_any(mask: np.ndarray, ax: int) -> np.ndarray:
        other = tuple(a for a in range(3) if a != ax)
        return mask.any(axis=other)

    def occupied_planes(ax: int, start: int, end: int) -> np.ndarray:
        """Full-cross-section axis profile of image[start:end) along ax."""
        sl = [slice(None)] * 3
        sl[ax] = slice(start, end)
        slab = image[tuple(sl)]
        m = np.any(slab != 0, axis=-1) if image.ndim == 4 else slab != 0
        return axis_any(m, ax)

    lo, hi = [], []
    for ax in range(3):
        prof = axis_any(sub_mask, ax)
        idx = np.where(prof)[0]
        anchor_lo = int(idx[0]) * stride       # known-occupied plane
        anchor_hi = int(idx[-1]) * stride      # known-occupied plane
        # lo side: scan [start, anchor_lo]; extend outward while the first
        # occupied plane sits on the slab edge (structure continues out)
        start = max(0, anchor_lo - stride)
        while True:
            p = occupied_planes(ax, start, anchor_lo + 1)
            first = start + int(np.where(p)[0][0])
            if first > start or start == 0:
                break
            start = max(0, start - stride)
        # hi side: scan [anchor_hi, end); extend while last plane on edge
        end = min(full[ax], anchor_hi + stride + 1)
        while True:
            p = occupied_planes(ax, anchor_hi, end)
            last = anchor_hi + int(np.where(p)[0][-1])
            if last < end - 1 or end == full[ax]:
                break
            end = min(full[ax], end + stride)
        lo.append(max(0, first - margin))
        hi.append(min(full[ax], last + 1 + margin))
    return BBox(tuple(lo), tuple(hi), full)


def center_fit_axis(s: int, t: int) -> Tuple[int, int, slice]:
    """Center-fit a length-``s`` axis into a length-``t`` axis: copy
    ``src[src_start : src_start + copy_len]`` into ``dst[dst_slice]``
    (center-pad when s <= t, center-crop when s > t). Returns
    ``(src_start, copy_len, dst_slice)``.

    THE one definition of the center-fit placement — ``fit_to_canvas``,
    ``crop_cast_fit_np``, ``crop_cast_bucket_np`` and
    ``uncrop_from_canvas_np`` (the inverse) all derive their slices from
    it, so the crop and un-crop arithmetic cannot drift apart."""
    if s <= t:
        off = (t - s) // 2
        return 0, s, slice(off, off + s)
    off = (s - t) // 2
    return off, t, slice(0, t)


def crop_cast_fit_np(
    image: np.ndarray,
    bbox: BBox,
    canvas: Tuple[int, int, int],
    dtype=None,
) -> np.ndarray:
    """One-pass crop -> dtype cast -> center-fit-to-canvas.

    Equivalent to ``fit_to_canvas(crop_np(image, bbox).astype(dtype),
    canvas)`` but touches each voxel once (the serving hot path: three host
    passes -> one, ~64 ms -> ~20 ms per BraTS volume)."""
    import ml_dtypes

    dtype = dtype or np.dtype(ml_dtypes.bfloat16)
    cshape = bbox.shape
    out = np.zeros(tuple(canvas) + image.shape[3:], dtype=dtype)
    src_sl, dst_sl = [], []
    for ax in range(3):
        start, n, dst = center_fit_axis(cshape[ax], canvas[ax])
        src_sl.append(slice(bbox.lo[ax] + start, bbox.lo[ax] + start + n))
        dst_sl.append(dst)
    out[tuple(dst_sl)] = image[tuple(src_sl)]
    return out


def crop_cast_bucket_np(
    image: np.ndarray,
    bbox: BBox,
    canvas: Tuple[int, int, int],
    bucket: int = 16,
    dtype=None,
) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """Bucketed-crop half of the split canvas fit (serving transfer path).

    Returns ``(small, dst)`` such that embedding ``small`` into a zero
    canvas at offset ``dst`` reproduces ``crop_cast_fit_np(image, bbox,
    canvas, dtype)`` bitwise. ``small``'s extents are the bbox extents
    rounded up to ``bucket`` (clamped to stay inside the canvas), so only
    the brain region crosses the host->device link (~40%% fewer bytes on a
    BraTS brain vs shipping the whole canvas) while the jit cache sees at
    most a handful of distinct small-shapes. The device side is
    ``lax.dynamic_update_slice`` into a zero canvas (Predictor._embed).
    """
    import ml_dtypes

    dtype = dtype or np.dtype(ml_dtypes.bfloat16)
    shape, dst, src_sl, copy_len = [], [], [], []
    for ax in range(3):
        s, t = bbox.shape[ax], canvas[ax]
        start, n, dst_slice = center_fit_axis(s, t)
        src_sl.append(slice(bbox.lo[ax] + start, bbox.lo[ax] + start + n))
        dst.append(dst_slice.start)
        copy_len.append(n)
        # bucket-rounded extent, clamped to stay inside the canvas (when
        # the bbox is wider than the canvas, n == t and this reduces to t)
        shape.append(min(-(-n // bucket) * bucket, t - dst_slice.start))
    small = np.zeros(tuple(shape) + image.shape[3:], dtype=dtype)
    small[: copy_len[0], : copy_len[1], : copy_len[2]] = image[tuple(src_sl)]
    return small, (dst[0], dst[1], dst[2])


def quantize_int8_per_modality(small: np.ndarray) -> np.ndarray:
    """Lossy int8 transfer encoding: scale each modality to [-127, 127] by
    its max magnitude and round. Halves the host->device bytes vs bf16.

    No scale factor needs to travel with the data: the device-side
    per-modality masked z-score (C2) is invariant to any positive
    per-modality scale, so dequantization is just a cast. Zeros (background)
    stay exactly zero. Error = intensity quantization at ~0.8% of each
    modality's max — NOT bitwise-identical to the bf16 path; opt-in via
    ``InferenceConfig.transfer_dtype="int8"`` for link-bound serving
    (measured mask agreement in PERF.md)."""
    m = np.abs(small.reshape(-1, small.shape[-1]).astype(np.float32)).max(axis=0)
    m[m == 0] = 1.0
    scale = (127.0 / m).astype(np.float32)
    return np.rint(small.astype(np.float32) * scale).astype(np.int8)


def crop_np(vol: np.ndarray, bbox: BBox) -> np.ndarray:
    sl = tuple(slice(l, h) for l, h in zip(bbox.lo, bbox.hi))
    return vol[sl]


def uncrop_np(vol: np.ndarray, bbox: BBox, fill=0) -> np.ndarray:
    """Paste a cropped volume back into the full canvas (C16 un-crop)."""
    out = np.full(bbox.full_shape + vol.shape[3:], fill, dtype=vol.dtype)
    sl = tuple(slice(l, h) for l, h in zip(bbox.lo, bbox.hi))
    out[sl] = vol
    return out


def uncrop_from_canvas_np(
    labels_canvas: np.ndarray,
    cropped_shape: Tuple[int, int, int],
    bbox: BBox,
    canvas: Tuple[int, int, int],
) -> np.ndarray:
    """Invert ``crop_cast_fit_np`` (center-fit to canvas) + the bbox crop
    back to the full original volume — the un-crop placement, shared by
    the single-device Predictor and the multichip paths (C16 un-crop) and
    derived from the SAME ``center_fit_axis`` as the forward fit (src/dst
    swap roles on the way back out)."""
    src_sl, dst_sl = [], []
    for ax in range(3):
        start, n, fit_dst = center_fit_axis(cropped_shape[ax], canvas[ax])
        src_sl.append(fit_dst)                    # read where fit wrote
        dst_sl.append(slice(start, start + n))    # write where fit read
    extra = labels_canvas.shape[3:]  # trailing dims (e.g. class probs) ride along
    cropped = np.zeros(tuple(cropped_shape) + extra, dtype=labels_canvas.dtype)
    cropped[tuple(dst_sl)] = labels_canvas[tuple(src_sl)]
    out = np.zeros(tuple(bbox.full_shape) + extra, dtype=labels_canvas.dtype)
    sl = tuple(slice(l, h) for l, h in zip(bbox.lo, bbox.hi))
    out[sl] = cropped
    return out


def pad_to_multiple_np(
    vol: np.ndarray, multiple: Tuple[int, int, int], fill=0
) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """Pad spatial dims up to a multiple (for static tile grids); returns
    (padded, original_shape)."""
    orig = vol.shape[:3]
    target = tuple(-(-s // m) * m for s, m in zip(orig, multiple))
    pads = [(0, t - s) for s, t in zip(orig, target)]
    pads += [(0, 0)] * (vol.ndim - 3)
    return np.pad(vol, pads, constant_values=fill), orig


# ---------------------------------------------------------------------------
# on-device tumor/foreground bbox for the cascade handoff (C8)
# ---------------------------------------------------------------------------

def mask_bbox_center(mask: jnp.ndarray) -> jnp.ndarray:
    """jit-able: center (x,y,z) int32 of the bounding box of a boolean mask.

    Static-shaped: returns the volume center when the mask is empty. Used for
    the coarse->fine crop handoff, where the fine stage takes a fixed-size ROI
    around the tumor center (SURVEY.md §7.2 M3).
    """
    shape = mask.shape
    centers = []
    for ax in range(3):
        other = tuple(a for a in range(3) if a != ax)
        prof = jnp.any(mask, axis=other)
        idx = jnp.arange(shape[ax], dtype=jnp.int32)
        big = jnp.int32(shape[ax])
        lo = jnp.min(jnp.where(prof, idx, big))
        hi = jnp.max(jnp.where(prof, idx, jnp.int32(-1)))
        empty = hi < lo
        c = jnp.where(empty, jnp.int32(shape[ax] // 2), (lo + hi + 1) // 2)
        centers.append(c)
    return jnp.stack(centers)


def centered_crop_start(
    center: jnp.ndarray, roi: Tuple[int, int, int], full: Tuple[int, int, int]
) -> jnp.ndarray:
    """Clamp a fixed-size ROI around ``center`` inside the volume; returns
    start indices (int32) usable with ``lax.dynamic_slice``."""
    starts = []
    for ax in range(3):
        s = center[ax] - roi[ax] // 2
        s = jnp.clip(s, 0, max(full[ax] - roi[ax], 0))
        starts.append(s.astype(jnp.int32))
    return jnp.stack(starts)
