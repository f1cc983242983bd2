"""BraTS case-directory discovery and modality stacking (SURVEY.md C1).

A BraTS case directory looks like::

    BraTS19_XXX_1/
      BraTS19_XXX_1_t1.nii.gz
      BraTS19_XXX_1_t1ce.nii.gz
      BraTS19_XXX_1_t2.nii.gz
      BraTS19_XXX_1_flair.nii.gz
      BraTS19_XXX_1_seg.nii.gz      (training cases only)

``load_case`` stacks the four modalities channel-last -> (X, Y, Z, 4) float32,
which is the TPU-friendly layout (channels on the 128-lane minor axis once
reshaped to NDHWC for conv3d).
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import numpy as np

from .constants import MODALITIES, disk_to_internal
from ..utils.nifti import NiftiHeader, read_nifti


@dataclasses.dataclass
class Case:
    """One loaded BraTS case."""

    name: str
    image: np.ndarray                 # (X, Y, Z, 4) float32, raw intensities
    seg: Optional[np.ndarray]         # (X, Y, Z) uint8 internal labels, or None
    header: NiftiHeader               # header of the first modality (for write-back)
    # native-loader byproducts (brain bbox computed during decode); None when
    # the pure-python reader was used
    meta: Optional[dict] = None


def modality_paths(case_dir: str) -> List[str]:
    base = os.path.basename(os.path.normpath(case_dir))
    paths = []
    for m in MODALITIES:
        for ext in (".nii.gz", ".nii"):
            p = os.path.join(case_dir, f"{base}_{m}{ext}")
            if os.path.exists(p):
                paths.append(p)
                break
        else:
            raise FileNotFoundError(f"Missing modality '{m}' in {case_dir}")
    return paths


def seg_path(case_dir: str) -> Optional[str]:
    base = os.path.basename(os.path.normpath(case_dir))
    for ext in (".nii.gz", ".nii"):
        p = os.path.join(case_dir, f"{base}_seg{ext}")
        if os.path.exists(p):
            return p
    return None


def is_case_dir(path: str) -> bool:
    try:
        modality_paths(path)
        return True
    except (FileNotFoundError, NotADirectoryError):
        return False


def discover_cases(root: str) -> List[str]:
    """Scan ``root`` for BraTS case directories (root itself, or children).
    A missing/non-directory path yields [] (CLIs report it as an error)."""
    if not os.path.isdir(root):
        return []
    if is_case_dir(root):
        return [root]
    out = []
    for entry in sorted(os.listdir(root)):
        p = os.path.join(root, entry)
        if os.path.isdir(p) and is_case_dir(p):
            out.append(p)
    return out


def kfold_split(cases, folds: int, fold: int):
    """Deterministic K-fold split over an ordered case list: fold ``fold``
    (round-robin assignment on the sorted order discover_cases returns)
    is validation, the rest train — the standard way ensemble members are
    trained on disjoint validation folds (docs/ENSEMBLING.md). Same
    (cases, folds) always yields the same partition on every host.
    Returns ``(train_dirs, val_dirs)``."""
    if folds < 2:
        raise ValueError(f"folds must be >= 2, got {folds}")
    if not 0 <= fold < folds:
        raise ValueError(f"fold must be in [0, {folds}), got {fold}")
    val = [c for i, c in enumerate(cases) if i % folds == fold]
    train = [c for i, c in enumerate(cases) if i % folds != fold]
    return (train or list(cases)), val


def load_case(case_dir: str, *, load_seg: bool = True, backend: str = "auto") -> Case:
    """Load 4 modalities (+ optional seg) from a case directory.

    backend: "auto" uses the native threaded decoder (csrc/fastnifti) when
    built, else the pure-NumPy reader; "python" forces the NumPy path.

    The returned header is the t1 modality's — used to write the predicted
    segmentation with a matching affine (C1 "preserving header/affine").
    """
    paths = modality_paths(case_dir)
    image = None
    header: Optional[NiftiHeader] = None
    if backend in ("auto", "native"):
        from ..utils import nifti_fast
        from ..utils.nifti import read_header

        res = nifti_fast.load_volumes_fast(paths) if nifti_fast.available() else None
        meta = None
        if res is not None:
            image, meta = res
            header = read_header(paths[0])
        elif backend == "native":
            raise RuntimeError("native loader requested but unavailable")
    if image is None:
        meta = None
        vols = []
        for p in paths:
            arr, hdr = read_nifti(p, dtype=np.float32)
            if header is None:
                header = hdr
            if vols and arr.shape != vols[0].shape:
                raise ValueError(f"Inconsistent modality shapes in {case_dir}")
            vols.append(arr)
        image = np.stack(vols, axis=-1)  # (X, Y, Z, 4)

    seg = None
    if load_seg:
        sp = seg_path(case_dir)
        if sp is not None:
            seg_arr, _ = read_nifti(sp, apply_scaling=False)
            seg = disk_to_internal(seg_arr).astype(np.uint8)

    assert header is not None
    return Case(
        name=os.path.basename(os.path.normpath(case_dir)),
        image=image,
        seg=seg,
        header=header,
        meta=meta,
    )
