"""``evaluate`` entry point (SURVEY.md C11 / §3.5).

Usage:
    python -m brats2019_tpu.cli.evaluate <root> [--preset cascade]
        [--workdir DIR] [--use-existing] [--out metrics.json]
        [--folds K --fold I] [--ensemble WORKDIR ...]

Runs prediction over every case under <root> that has ground-truth labels
(``*_seg``) and reports per-case and mean Dice for the BraTS regions
WT/TC/ET — the offline stand-in for the official online evaluator [B].
``--use-existing`` scores previously written ``*_pred`` files instead of
re-predicting.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

from ..configs.presets import PRESETS
from ..data.case import discover_cases, load_case, seg_path
from ..data.constants import disk_to_internal
from ..train.metrics import region_dice_np
from .common import load_stage_params, resolve_experiment


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="brats2019_tpu.evaluate", description=__doc__)
    p.add_argument("root", help="BraTS root (or one case dir) with *_seg labels")
    p.add_argument("--preset", default="cascade", choices=sorted(PRESETS))
    p.add_argument("--workdir", default=None)
    p.add_argument("--use-existing", action="store_true",
                   help="score existing *_pred.nii.gz instead of predicting")
    p.add_argument("--out", default=None, help="write JSON metrics here")
    p.add_argument("--hd95", action="store_true",
                   help="also report Hausdorff95 (mm) per region — the BraTS "
                        "challenge's second official metric; an empty-vs-"
                        "nonempty region scores the volume diagonal "
                        "(the online evaluator's 373.13 mm convention)")
    p.add_argument("--sens-spec", action="store_true",
                   help="also report per-region sensitivity/specificity "
                        "(completes the BraTS online evaluator's metric set)")
    p.add_argument("--folds", type=int, default=None,
                   help="score only fold I of a deterministic K-way split "
                        "(the SAME partition train --folds uses, so a "
                        "fold-trained member evaluates on ITS validation "
                        "fold); requires --fold")
    p.add_argument("--fold", type=int, default=None)
    p.add_argument("--ensemble", default=None, nargs="+", metavar="WORKDIR",
                   help="evaluate the checkpoint ensemble of the primary "
                        "--workdir model and each listed workdir's model "
                        "(mean probabilities, as predict --ensemble)")
    p.add_argument("--shard", default=None, metavar="I/N",
                   help="process only the cases whose stable name-hash "
                        "lands in shard I of N (scale-out batch runs; "
                        "same assignment as serve --shard)")
    p.add_argument("--min-component-voxels", type=int, default=None,
                   help="override the preset's C16 small-component filter "
                        "(0 disables); measured benefit: docs/ACCURACY.md")
    p.add_argument("--et-min-voxels", type=int, default=None,
                   help="override the preset's empty-ET relabel threshold "
                        "(tiny ET -> NCR; 0 disables). The largest "
                        "measured accuracy lever on the hard benchmark: "
                        "+0.17-0.33 ET Dice (docs/ACCURACY.md) — sweep it "
                        "on YOUR validation split with this flag")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--multichip", default=None,
                   choices=["cascade", "spatial", "sweep"],
                   help="re-predict each case over a mesh of ALL local "
                        "devices (same decompositions as predict "
                        "--multichip; 'cascade' produces flagship-parity "
                        "masks). Mesh-parallel validation sweeps")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from ..utils.jax_setup import setup_jax

    setup_jax()
    exp = resolve_experiment(args)
    cases = discover_cases(args.root)
    if args.folds is not None or args.fold is not None:
        if args.folds is None or args.fold is None:
            print("error: --folds and --fold must be given together",
                  file=sys.stderr)
            return 2
        from ..data.case import kfold_split

        try:
            # partition the UNFILTERED discover_cases list — the same
            # indexing train --folds uses — and only then drop unlabelled
            # cases; filtering first would shift every case after an
            # unlabelled one into a different fold than it trained in
            _, cases = kfold_split(cases, args.folds, args.fold)
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        print(f"[evaluate] fold {args.fold}/{args.folds}: "
              f"{len(cases)} case(s)", flush=True)
    if args.shard:
        if args.folds is not None:
            print("error: --shard and --folds are different partitions of "
                  "the same list; use one", file=sys.stderr)
            return 2
        from .common import filter_shard

        try:
            cases = filter_shard(cases, args.shard)
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        print(f"[evaluate] shard {args.shard}: {len(cases)} case(s)",
              flush=True)
    cases = [d for d in cases if seg_path(d)]
    if not cases:
        print(f"error: no labelled cases under {args.root}"
              + (f" in fold {args.fold}/{args.folds}"
                 if args.folds is not None else ""),
              file=sys.stderr)
        return 2
    if args.ensemble and args.use_existing:
        print("error: --ensemble re-predicts; it cannot be combined with "
              "--use-existing", file=sys.stderr)
        return 2
    if args.multichip and args.use_existing:
        print("error: --multichip re-predicts; it cannot be combined with "
              "--use-existing", file=sys.stderr)
        return 2
    if args.multichip and args.ensemble and args.multichip != "cascade":
        print("error: --ensemble composes only with --multichip cascade "
              "(spatial/sweep are single-stage whole-canvas programs)",
              file=sys.stderr)
        return 2

    predictor = None
    if not args.use_existing:
        try:
            params_fine = load_stage_params(exp, "fine")
        except FileNotFoundError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        params_coarse = None
        if exp.infer.cascade and exp.coarse_unet is not None:
            try:
                params_coarse = load_stage_params(exp, "coarse")
            except FileNotFoundError:
                import dataclasses

                exp = dataclasses.replace(
                    exp, infer=dataclasses.replace(exp.infer, cascade=False)
                )
        members = None
        if args.ensemble:
            from .common import load_ensemble_members

            try:
                members = load_ensemble_members(
                    exp, args.ensemble, (params_fine, params_coarse)
                )
            except FileNotFoundError as e:
                print(f"error: {e}", file=sys.stderr)
                return 2
        if args.multichip:
            from ..infer.multichip import MultichipPredictor
            from .common import multichip_mode_notes

            multichip_mode_notes(args.multichip, exp)
            try:
                predictor = MultichipPredictor(
                    exp, params_fine, mode=args.multichip,
                    params_coarse=params_coarse, members=members,
                )
            except ValueError as e:
                print(f"error: {e}", file=sys.stderr)
                return 2
            print(f"[evaluate] multichip mode={args.multichip} over "
                  f"{predictor.env.n_data} devices"
                  + (f", ensemble of {predictor.num_members} members"
                     if members else ""), flush=True)
        elif members is not None:
            from ..infer.ensemble import EnsemblePredictor

            predictor = EnsemblePredictor(exp, members)
            print(f"[evaluate] ensemble of {predictor.num_members} members",
                  flush=True)
        else:
            from ..infer.predictor import Predictor

            predictor = Predictor(exp, params_fine, params_coarse)

    per_case = {}
    for d in cases:
        case = load_case(d)
        assert case.seg is not None
        if args.use_existing:
            from ..utils.nifti import read_nifti

            pred_path = os.path.join(d, f"{case.name}_pred.nii.gz")
            if not os.path.exists(pred_path):
                print(f"warning: missing {pred_path}; skipping", file=sys.stderr)
                continue
            pred_disk, _ = read_nifti(pred_path, apply_scaling=False)
            pred = disk_to_internal(pred_disk)
        else:
            pred, _ = predictor.predict_case(case)
        d_scores = region_dice_np(pred, case.seg)
        per_case[case.name] = {k: round(float(v), 5) for k, v in d_scores.items()}
        if args.hd95:
            from ..train.metrics import region_hd95_np

            spacing = tuple(case.header.pixdim[1:4]) if case.header else (1.0,) * 3
            spacing = tuple(s if s > 0 else 1.0 for s in spacing)
            hd = region_hd95_np(pred, case.seg, spacing)
            # empty-vs-nonempty -> the volume diagonal (BraTS convention)
            diag = float(np.linalg.norm(np.asarray(pred.shape) * spacing))
            hd = {k: (diag if np.isinf(v) else v) for k, v in hd.items()}
            per_case[case.name].update(
                {f"HD95_{k}": round(float(v), 3) for k, v in hd.items()}
            )
        if args.sens_spec:
            from ..train.metrics import region_sens_spec_np

            per_case[case.name].update(
                {k: round(float(v), 5)
                 for k, v in region_sens_spec_np(pred, case.seg).items()}
            )
        print(f"[evaluate] {case.name}: " +
              " ".join(f"{k}={v:.4f}" for k, v in per_case[case.name].items()),
              flush=True)

    if not per_case:
        print("error: nothing evaluated", file=sys.stderr)
        return 2
    metric_keys = next(iter(per_case.values())).keys()
    mean = {
        k: round(float(np.mean([c[k] for c in per_case.values()])), 5)
        for k in metric_keys
    }
    print(f"[evaluate] mean over {len(per_case)} case(s): " +
          " ".join(f"{k}={v:.4f}" for k, v in mean.items()), flush=True)
    result = {"mean": mean, "per_case": per_case, "n_cases": len(per_case)}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
        print(f"[evaluate] wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
