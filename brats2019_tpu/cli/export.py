"""``export`` entry point (SURVEY.md §5 checkpoint/export).

Usage:
    python -m brats2019_tpu.cli.export --preset cascade [--workdir DIR]
        [--stage fine|coarse|all] [--format npz|safetensors]

Exports inference-only parameters from the stage checkpoints to
``<workdir>/<stage>/params.{npz,safetensors}`` — flat interchange formats
the predict/serve CLIs load fastest (no orbax restore machinery at serving
time). safetensors (SURVEY.md §5) is zero-copy mmap'd; npz is
dependency-free.
"""

from __future__ import annotations

import argparse
import os
import sys

from ..configs.presets import PRESETS
from ..train.checkpoint import export_params
from .common import (
    average_stage_params,
    ema_stage_params,
    load_stage_params,
    resolve_experiment,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="brats2019_tpu.export", description=__doc__)
    p.add_argument("--preset", default="cascade", choices=sorted(PRESETS))
    p.add_argument("--workdir", default=None)
    p.add_argument("--stage", default="all", choices=("all", "fine", "coarse"))
    p.add_argument("--format", default="npz", choices=("npz", "safetensors"))
    p.add_argument("--average", type=int, default=None, metavar="K",
                   help="export the uniform weight average of the last K "
                        "retained step checkpoints (SWA-style checkpoint "
                        "averaging: one averaged model, one serving-time "
                        "forward pass) instead of the best/latest params")
    p.add_argument("--stablehlo", action="store_true",
                   help="ALSO export the predict program as serialized "
                        "StableHLO modules (+ manifest.json) under "
                        "<workdir>/stablehlo/ — a weight-agnostic "
                        "deployment artifact any PJRT runtime can "
                        "deserialize without this package "
                        "(infer/export_hlo.py)")
    p.add_argument("--stablehlo-check", action="store_true",
                   help="after --stablehlo, deserialize the modules and "
                        "assert exact label equality with the live "
                        "program on a synthetic canvas (costs a compile)")
    p.add_argument("--ema", action="store_true",
                   help="export the weight EMA recorded by a "
                        "`train --ema-decay` run (rides in the optimizer "
                        "state of the latest full checkpoint) instead of "
                        "the best/latest params")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from ..utils.jax_setup import setup_jax

    setup_jax()
    exp = resolve_experiment(args)
    stages = []
    if args.stage in ("all", "fine"):
        stages.append("fine")
    if args.stage in ("all", "coarse") and exp.coarse_unet is not None:
        stages.append("coarse")
    if not stages:
        # --stage coarse on a cascade-less preset: exporting nothing while
        # exiting 0 would read as success
        print(
            f"error: preset '{exp.name}' has no coarse stage to export",
            file=sys.stderr,
        )
        return 2
    if args.average is not None and args.average < 1:
        print("error: --average must be >= 1", file=sys.stderr)
        return 2
    if args.average and args.ema:
        print("error: --average and --ema are mutually exclusive",
              file=sys.stderr)
        return 2
    rc = 0
    for stage in stages:
        try:
            if args.ema:
                params = ema_stage_params(exp, stage)
            elif args.average:
                params = average_stage_params(exp, stage, args.average)
            else:
                # never read a previous export here: re-export must
                # reflect the CURRENT checkpoint, not shadow it with
                # stale weights
                params = load_stage_params(
                    exp, stage, from_checkpoint_only=True
                )
        except FileNotFoundError as e:
            print(f"warning: {e}", file=sys.stderr)
            rc = 1
            continue
        out = os.path.join(exp.workdir, stage, f"params.{args.format}")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        export_params(out, params)
        print(f"[export] {stage} -> {out}", flush=True)
    if args.stablehlo and rc == 0:
        from ..infer.export_hlo import export_predict_stablehlo
        from ..infer.predictor import Predictor
        from .common import load_serving_params

        try:
            exp, pf, pc = load_serving_params(exp)
        except FileNotFoundError as e:
            print(f"warning: --stablehlo skipped: {e}", file=sys.stderr)
            return 1
        written = export_predict_stablehlo(
            Predictor(exp, pf, pc),
            os.path.join(exp.workdir, "stablehlo"),
            check=args.stablehlo_check,
        )
        for w in written:
            print(f"[export] stablehlo -> {w}", flush=True)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
