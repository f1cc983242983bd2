"""Offline probability-map ensembling: average saved ``<case>_probs.npz``
artifacts (predict --save-probs, possibly from different machines/models)
into a final segmentation NIfTI.

Usage:
    python tools/ensemble_probs.py CASE_probs.npz [MORE.npz ...] \
        --like CASE/CASE_flair.nii.gz --out CASE_pred.nii.gz \
        [--weights W1 W2 ...] [--min-component-voxels N] [--et-min-voxels N]

This is the cross-machine half of the ensembling story: the in-process
half (predict/serve --ensemble) needs every member's checkpoint on one
host; this tool only needs the probability artifacts. Probabilities are
(optionally weighted) averaged in f32, argmaxed, postprocessed with the
same C16 connected-component rules as predict, and written with the
header/affine of ``--like``.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from brats2019_tpu.data.constants import internal_to_disk  # noqa: E402
from brats2019_tpu.infer.postprocess import postprocess_labels  # noqa: E402
from brats2019_tpu.utils.nifti import read_nifti, write_nifti  # noqa: E402


def ensemble_probs_npz(paths, weights=None) -> np.ndarray:
    """Weighted f32 mean of saved probability canvases. All members must
    share the volume shape and the class-channel order (the npz carries
    ``classes`` naming it; a mismatch is an error, not a silent misread)."""
    if weights is None:
        weights = [1.0] * len(paths)
    if len(weights) != len(paths):
        raise ValueError(
            f"{len(paths)} probability files but {len(weights)} weights"
        )
    total = float(sum(weights))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    acc, classes0 = None, None
    for path, w in zip(paths, weights):
        z = np.load(path)
        probs = np.asarray(z["probs"], np.float32)
        classes = tuple(int(c) for c in z["classes"])
        if classes0 is None:
            classes0 = classes
        elif classes != classes0:
            raise ValueError(
                f"{path}: class order {classes} != {classes0}"
            )
        if acc is None:
            acc = probs * (w / total)
        elif probs.shape != acc.shape:
            raise ValueError(
                f"{path}: shape {probs.shape} != {acc.shape}"
            )
        else:
            acc += probs * (w / total)
    return acc


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("probs", nargs="+", help="member <case>_probs.npz files")
    ap.add_argument("--like", required=True,
                    help="NIfTI whose header/affine the output reuses "
                         "(any modality of the case)")
    ap.add_argument("--out", required=True, help="output segmentation path")
    ap.add_argument("--weights", type=float, nargs="+", default=None,
                    help="per-member weights (default: uniform)")
    ap.add_argument("--min-component-voxels", type=int, default=100)
    ap.add_argument("--et-min-voxels", type=int, default=50)
    args = ap.parse_args(argv)

    try:
        mean = ensemble_probs_npz(args.probs, args.weights)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    labels = np.argmax(mean, axis=-1).astype(np.uint8)  # internal classes
    labels = postprocess_labels(
        labels,
        min_component_voxels=args.min_component_voxels,
        et_min_voxels=args.et_min_voxels,
    )
    _, header = read_nifti(args.like, apply_scaling=False)
    disk = internal_to_disk(labels).astype(np.uint8)
    write_nifti(args.out, disk, like=header)
    print(f"[ensemble_probs] {len(args.probs)} member(s) -> {args.out}",
          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
