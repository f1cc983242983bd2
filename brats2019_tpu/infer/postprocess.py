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

from typing import Optional

import numpy as np

_STRUCT26 = np.ones((3, 3, 3), dtype=bool)


def filter_small_components_np(
    labels: np.ndarray, min_voxels: int
) -> np.ndarray:
    """Zero out connected foreground (any class) components smaller than
    ``min_voxels``. 26-connectivity on the whole-tumor mask."""
    if min_voxels <= 1:
        return labels
    from scipy import ndimage

    fg = labels > 0
    comp, n = ndimage.label(fg, structure=_STRUCT26)
    if n == 0:
        return labels
    sizes = np.bincount(comp.ravel())
    kill = np.zeros(n + 1, dtype=bool)
    kill[1:] = sizes[1:] < min_voxels
    out = labels.copy()
    out[kill[comp]] = 0
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
