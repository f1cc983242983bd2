"""Postprocessing: argmax -> connected components -> un-crop -> label remap
(SURVEY.md C16).

Connected-component filtering lives behind one interface with two backends
(SURVEY.md §7.3.3):

* "scipy" — host ``scipy.ndimage.label`` (26-connectivity), once per volume
* "device" — iterative on-device max-label propagation
  (``brats2019_tpu.ops.connected_components``), for fully host-free serving

Filters implemented (standard BraTS postprocessing, matching the reference's
capability surface):
  1. drop small foreground components (< min_component_voxels)
  2. relabel tiny total ET (< et_min_voxels) to NCR — removes spurious
     enhancing-tumor false positives that dominate the ET Dice penalty
"""

from __future__ import annotations

import numpy as np

_STRUCT26 = np.ones((3, 3, 3), dtype=bool)


def filter_small_components_np(
    labels: np.ndarray, min_voxels: int
) -> np.ndarray:
    """Zero out connected foreground (any class) components smaller than
    ``min_voxels``. 26-connectivity on the whole-tumor mask.

    Labeling runs on the foreground bounding box only — the tumor occupies a
    small fraction of the 240^3 volume, and this is on the serving host's
    critical path (PERF.md)."""
    if min_voxels <= 1:
        return labels
    from scipy import ndimage

    fg = labels > 0
    if not fg.any():
        return labels
    sl = tuple(
        slice(int(idx.min()), int(idx.max()) + 1)
        for idx in (np.where(fg.any(axis=(1, 2)))[0],
                    np.where(fg.any(axis=(0, 2)))[0],
                    np.where(fg.any(axis=(0, 1)))[0])
    )
    sub = labels[sl]
    comp, n = ndimage.label(sub > 0, structure=_STRUCT26)
    if n == 0:
        return labels
    sizes = np.bincount(comp.ravel())
    kill = np.zeros(n + 1, dtype=bool)
    kill[1:] = sizes[1:] < min_voxels
    out = labels.copy()
    region = out[sl]
    region[kill[comp]] = 0
    out[sl] = region
    return out


def suppress_tiny_et_np(labels: np.ndarray, et_min_voxels: int) -> np.ndarray:
    """If total ET (internal class 3) volume is below threshold, relabel ET
    voxels as NCR (class 1) — the common BraTS ET false-positive guard."""
    if et_min_voxels <= 0:
        return labels
    et = labels == 3
    if 0 < et.sum() < et_min_voxels:
        out = labels.copy()
        out[et] = 1
        return out
    return labels


def postprocess_labels(
    labels: np.ndarray,
    *,
    min_component_voxels: int = 16,
    et_min_voxels: int = 32,
    backend: str = "scipy",
) -> np.ndarray:
    """Full label cleanup on internal labels {0..3}."""
    if backend == "device":
        from ..ops.connected_components import filter_small_components_device

        labels = filter_small_components_device(labels, min_component_voxels)
    else:
        labels = filter_small_components_np(labels, min_component_voxels)
    labels = suppress_tiny_et_np(labels, et_min_voxels)
    return labels
