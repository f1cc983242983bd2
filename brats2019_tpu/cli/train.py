"""``train`` entry point (SURVEY.md C10; BASELINE.json:5 "train").

Usage:
    python -m brats2019_tpu.cli.train --data <BraTS_root> [--preset cascade]
        [--val-frac 0.2 | --folds K --fold I] [--steps N] [--workdir DIR]
        [--stage all|fine|coarse]
        [--synthetic N]  # generate N synthetic cases when no data exists

Keeps the reference's CLI shape (a train command over a BraTS root) while
every knob lives in the frozen preset dataclasses (SURVEY.md §5 config).
"""

from __future__ import annotations

import argparse
import os
import sys

from ..configs.presets import PRESETS
from ..data.case import discover_cases
from ..parallel.mesh import initialize_distributed
from .common import resolve_experiment


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="brats2019_tpu.train", description=__doc__)
    p.add_argument("--data", help="BraTS root (dir of case dirs)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="generate N synthetic cases under --data instead of reading real ones")
    p.add_argument("--synthetic-shape", type=int, nargs=3, default=(96, 96, 80),
                   help="synthetic volume shape (use 240 240 155 for realistic runs)")
    p.add_argument("--synthetic-hard", action="store_true",
                   help="generate v2 (hard) synthetic cases: irregular "
                        "multi-component tumors, low-contrast ET rims, "
                        "bias fields, empty-ET cases — the discriminating "
                        "accuracy benchmark (data/synthetic.py "
                        "make_hard_case_arrays)")
    p.add_argument("--preset", default="cascade", choices=sorted(PRESETS))
    p.add_argument("--stage", default="all", choices=("all", "fine", "coarse"))
    p.add_argument("--val-frac", type=float, default=0.2)
    p.add_argument("--folds", type=int, default=None,
                   help="K-fold mode: deterministic K-way split of the "
                        "case list; requires --fold. Overrides --val-frac. "
                        "The standard way to train ensemble members on "
                        "disjoint validation folds (docs/ENSEMBLING.md)")
    p.add_argument("--fold", type=int, default=None,
                   help="which fold [0, K) is THIS run's validation set")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--checkpoint-every", type=int, default=None)
    p.add_argument("--eval-every", type=int, default=None)
    p.add_argument("--log-every", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--workdir", default=None)
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of steps 10-20")
    p.add_argument("--distill-from", nargs="*", default=None, metavar="WORKDIR",
                   help="teacher experiment workdir(s): train the fine stage "
                        "as a KD student of those fine checkpoints (C18)")
    p.add_argument("--kd-weight", type=float, default=1.0)
    p.add_argument("--kd-temperature", type=float, default=2.0)
    p.add_argument("--ema-decay", type=float, default=None,
                   help="track an exponential moving average of the "
                        "weights (e.g. 0.999) inside the optimizer state; "
                        "export it with `export --ema`")
    p.add_argument("--rot90", dest="rot90_axial", action="store_true",
                   default=None,
                   help="augmentation extra: exact axial 90-degree patch "
                        "rotations (nnU-Net-style; cubic patches)")
    p.add_argument("--gamma", dest="gamma_range", type=float, default=None,
                   metavar="R",
                   help="augmentation extra: per-channel gamma jitter on "
                        "the normalized patch, gamma in [1/(1+R), 1+R] "
                        "(0 disables; nnU-Net uses ~0.3)")
    p.add_argument("--init-from", default=None, metavar="PATH",
                   help="warm-start the trained stage's params from an "
                        "exported params.{npz,safetensors} or a reference "
                        "torch checkpoint (.pt/.pth, imported via "
                        "utils/torch_import) — fine-tune migrated weights. "
                        "Fresh optimizer state; an existing resumable "
                        "checkpoint wins. Requires an explicit --stage "
                        "fine|coarse (one file cannot seed both stages)")
    p.add_argument("--prep-cache", dest="prep_cache_dir", default=None,
                   metavar="DIR",
                   help="on-disk cache of prepped cases: skips gzip "
                        "decode + z-score + bbox when the pool revisits a "
                        "case (entries keyed by input mtime/size + prep "
                        "params; ~1 canvas-sized npz per case)")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans (SURVEY.md §5 sanitizers)")
    p.add_argument("--debug-checks", action="store_true",
                   help="checkify-validate pool/patch-gather bounds at "
                        "startup (SURVEY.md §5 sanitizers)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from ..utils.jax_setup import setup_jax

    if args.ema_decay is not None and not 0.0 < args.ema_decay < 1.0:
        print(f"error: --ema-decay must be in (0, 1), got {args.ema_decay} "
              "(1.0 would freeze the EMA at the random init; >1 diverges)",
              file=sys.stderr)
        return 2
    setup_jax(debug_nans=args.debug_nans)
    initialize_distributed()
    exp = resolve_experiment(args)
    if exp.train.rot90_axial and (
        exp.train.patch[0] != exp.train.patch[1]
        or exp.train.coarse_patch[0] != exp.train.coarse_patch[1]
    ):
        print("error: --rot90 needs square (X, Y) patch planes "
              f"(patch={exp.train.patch}, coarse={exp.train.coarse_patch})",
              file=sys.stderr)
        return 2

    if not args.data:
        print("error: --data is required (point it at a BraTS root, or use "
              "--synthetic N --data <dir> to generate data)", file=sys.stderr)
        return 2
    if args.synthetic > 0:
        from ..data.synthetic import write_dataset

        os.makedirs(args.data, exist_ok=True)
        write_dataset(args.data, args.synthetic, shape=tuple(args.synthetic_shape),
                      hard=args.synthetic_hard)
    cases = discover_cases(args.data)
    if not cases:
        print(f"error: no BraTS cases found under {args.data}", file=sys.stderr)
        return 2
    if args.folds is not None or args.fold is not None:
        if args.folds is None or args.fold is None:
            print("error: --folds and --fold must be given together",
                  file=sys.stderr)
            return 2
        from ..data.case import kfold_split

        try:
            train_dirs, val_dirs = kfold_split(cases, args.folds, args.fold)
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        split = f"fold {args.fold}/{args.folds}"
    else:
        n_val = max(1, int(len(cases) * args.val_frac)) if len(cases) > 1 else 0
        val_dirs = cases[:n_val]
        train_dirs = cases[n_val:] or cases
        split = f"val-frac {args.val_frac}"
    print(f"[train] {len(train_dirs)} train / {len(val_dirs)} val cases "
          f"({split}); preset={exp.name} workdir={exp.workdir}", flush=True)

    from ..train.loop import train_stage

    kd_teachers = None
    kd_config = None
    if args.distill_from:
        import dataclasses as _dc

        from ..models.unet3d import UNet3D
        from ..train.distill import KDConfig
        from .common import load_stage_params

        kd_teachers = []
        for wd in args.distill_from:
            t_exp = _dc.replace(exp, workdir=wd)
            t_params = load_stage_params(t_exp, "fine")
            t_model = UNet3D(exp.unet)
            kd_teachers.append((lambda p, x, m=t_model: m.apply(p, x), t_params))
        kd_config = KDConfig(
            kd_weight=args.kd_weight, temperature=args.kd_temperature
        )
        print(f"[train] distilling from {len(kd_teachers)} teacher(s)", flush=True)

    stages = []
    if args.stage in ("all", "coarse") and exp.coarse_unet is not None:
        stages.append("coarse")
    if args.stage in ("all", "fine"):
        stages.append("fine")
    if args.init_from and len(stages) != 1:
        print("error: --init-from requires an explicit --stage "
              "fine|coarse (one weights file cannot seed both cascade "
              "stages)", file=sys.stderr)
        return 2
    from ..parallel.mesh import make_mesh

    env = make_mesh()
    for stage in stages:
        res = train_stage(
            exp, train_dirs, stage=stage, val_dirs=val_dirs, env=env,
            profile=args.profile,
            kd_teachers=kd_teachers if stage == "fine" else None,
            kd_config=kd_config,
            init_from=args.init_from,
        )
        if res.preempted:
            print(
                f"[train] stage {stage} PREEMPTED (SIGTERM): resumable "
                "checkpoint saved; rerun the same command to continue",
                flush=True,
            )
            return 3  # distinct from success (0) and usage errors (2)
        print(f"[train] stage {stage} done: {res.final_metrics}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
