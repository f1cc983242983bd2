"""One-shot real-data parity harness (VERDICT round-1 missing #3).

When real BraTS19 data (and/or reference-produced masks) become available,
run THIS to settle the parity claims that are unmeasurable on this machine
(BASELINE.json:2,5):

    python tools/parity_harness.py <brats_root> --workdir <ckpt_workdir> \
        [--preset cascade] [--reference-masks <dir>] [--out parity.json]
    # or with the reference repo's own trained torch weights:
    python tools/parity_harness.py <brats_root> --preset reference_parity \
        --torch-checkpoint <ref_ckpt.pt> [--reference-masks <dir>]

It (1) predicts every case under <brats_root>, (2) scores Dice WT/TC/ET
against ground-truth ``*_seg`` labels where present, (3) if a directory of
reference-produced masks is given (files named ``<case>*.nii[.gz]``),
computes exact-mask agreement (voxel match fraction + identical-mask bool)
per case, and (4) writes one JSON verdict comparing the measured mean Dice
to the recalled paper numbers in BASELINE.md:14-16 (stored here as
*unverified* approximations, never as assertions).

Tested on synthetic stand-ins by tests/test_parity_harness.py — the harness
must be ready to fire the day the data mount is populated.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

# Recalled from arXiv:2002.03688 — UNVERIFIED approximations (SURVEY.md §6);
# the verdict reports distance from these, it does not assert them.
APPROX_PAPER_DICE = {"WT": 0.905, "TC": 0.845, "ET": 0.78}
DICE_TOLERANCE = 0.02  # "within noise" acceptance band (SURVEY.md §6)


def find_reference_mask(ref_dir: str, case_name: str):
    if not ref_dir:
        return None
    for fn in sorted(os.listdir(ref_dir)):
        if fn.startswith(case_name) and (
            fn.endswith(".nii") or fn.endswith(".nii.gz")
        ):
            return os.path.join(ref_dir, fn)
    return None


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("root", help="BraTS root of case directories")
    p.add_argument("--preset", default="cascade")
    p.add_argument("--workdir", default=None, help="trained checkpoint workdir")
    p.add_argument(
        "--reference-masks",
        default=None,
        help="dir of reference-produced segmentation NIfTIs for exact-agreement",
    )
    p.add_argument(
        "--torch-checkpoint",
        default=None,
        help="run the sweep with REFERENCE torch weights imported on the "
             "fly (utils/torch_import.py) instead of a trained workdir — "
             "the definitive reference-weights -> this-engine parity check "
             "(requires a plain-stem preset, e.g. reference_parity)",
    )
    p.add_argument("--out", default="parity.json")
    args = p.parse_args(argv)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from brats2019_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import dataclasses

    from brats2019_tpu.cli.common import load_stage_params, resolve_experiment
    from brats2019_tpu.data.case import discover_cases, load_case
    from brats2019_tpu.data.constants import disk_to_internal
    from brats2019_tpu.infer.predictor import Predictor
    from brats2019_tpu.train.metrics import region_dice_np
    from brats2019_tpu.utils.nifti import read_nifti

    ns = argparse.Namespace(preset=args.preset, workdir=args.workdir)
    exp = resolve_experiment(ns)
    cases = discover_cases(args.root)
    if not cases:
        print(f"error: no cases under {args.root}", file=sys.stderr)
        return 2

    if args.torch_checkpoint:
        from brats2019_tpu.cli.common import _stage_param_template
        from brats2019_tpu.utils.torch_import import (
            import_torch_params,
            load_torch_state,
        )

        if exp.unet.stem_downsample != 1:
            print(
                f"error: preset {exp.name!r} uses the s2d stem; import "
                "reference weights into a plain-stem preset "
                "(--preset reference_parity)",
                file=sys.stderr,
            )
            return 2
        params_fine, notes = import_torch_params(
            load_torch_state(args.torch_checkpoint),
            _stage_param_template(exp, "fine"),
        )
        for n in notes:
            print(f"[parity] import note: {n}", file=sys.stderr)
        print(f"[parity] fine stage = imported torch weights "
              f"({args.torch_checkpoint})", flush=True)
    else:
        params_fine = load_stage_params(exp, "fine")
    params_coarse = None
    if exp.infer.cascade and exp.coarse_unet is not None:
        try:
            params_coarse = load_stage_params(exp, "coarse")
        except FileNotFoundError:
            exp = dataclasses.replace(
                exp, infer=dataclasses.replace(exp.infer, cascade=False)
            )
    predictor = Predictor(exp, params_fine, params_coarse)

    per_case, agreements = {}, {}
    for d in cases:
        case = load_case(d)
        pred, _stats = predictor.predict_case(case)
        entry = {}
        if case.seg is not None:
            entry["dice"] = {
                k: round(float(v), 5)
                for k, v in region_dice_np(pred, case.seg).items()
            }
        ref_mask_path = find_reference_mask(args.reference_masks, case.name)
        if ref_mask_path:
            ref_disk, _ = read_nifti(ref_mask_path, apply_scaling=False)
            ref = disk_to_internal(ref_disk.astype(np.uint8))
            match = float(np.mean(pred == ref))
            entry["exact_agreement"] = {
                "voxel_match_fraction": round(match, 6),
                "identical": bool(match == 1.0),
                "reference_mask": ref_mask_path,
            }
            agreements[case.name] = match
        per_case[case.name] = entry
        print(f"[parity] {case.name}: {entry}", flush=True)

    dice_cases = [c["dice"] for c in per_case.values() if "dice" in c]
    verdict = {
        "n_cases": len(per_case),
        "per_case": per_case,
        "expected_paper_dice": dict(APPROX_PAPER_DICE, unverified=True),
        "dice_tolerance": DICE_TOLERANCE,
    }
    if dice_cases:
        mean = {
            k: round(float(np.mean([c[k] for c in dice_cases])), 5)
            for k in ("WT", "TC", "ET")
        }
        verdict["mean_dice"] = mean
        verdict["within_paper_tolerance"] = {
            k: bool(mean[k] >= APPROX_PAPER_DICE[k] - DICE_TOLERANCE)
            for k in ("WT", "TC", "ET")
        }
    if agreements:
        verdict["mean_voxel_agreement"] = round(
            float(np.mean(list(agreements.values()))), 6
        )
        verdict["all_masks_identical"] = bool(
            all(a == 1.0 for a in agreements.values())
        )
    with open(args.out, "w") as f:
        json.dump(verdict, f, indent=2)
    print(f"[parity] wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
