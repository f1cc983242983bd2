"""``predict <case_dir>`` entry point (SURVEY.md C17; BASELINE.json:5).

Usage:
    python -m brats2019_tpu.cli.predict <case_dir_or_root> [--preset cascade]
        [--workdir DIR] [--output PATH] [--no-tta] [--no-cascade]
        [--transfer-dtype bfloat16|int8] [--postproc host|device]
        [--profile DIR]

Points at a BraTS case directory (or a root of several), loads the trained
stage checkpoints, and writes ``<case>_pred.nii.gz`` with BraTS disk labels
{0,1,2,4}, preserving the input header/affine (C1, C16).
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time

from ..configs.presets import PRESETS
from ..data.case import discover_cases
from .common import (
    load_ensemble_members,
    load_stage_params,
    multichip_mode_notes,
    resolve_experiment,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="brats2019_tpu.predict", description=__doc__)
    p.add_argument("case_dir", help="BraTS case directory (or root of cases)")
    p.add_argument("--preset", default="cascade", choices=sorted(PRESETS))
    p.add_argument("--workdir", default=None)
    p.add_argument("--output", default=None,
                   help="output path (single-case mode only)")
    p.add_argument("--no-tta", action="store_true")
    p.add_argument("--no-cascade", action="store_true")
    p.add_argument("--transfer-dtype", default=None,
                   choices=("bfloat16", "int8"),
                   help="host->device encoding: int8 halves link bytes "
                        "(lossy, ~99.999%% mask agreement; PERF.md)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of the predict "
                        "run into DIR (view with tensorboard)")
    p.add_argument("--postproc", default=None, choices=("host", "device"),
                   help="where C16 connected-components runs")
    p.add_argument("--min-component-voxels", type=int, default=None,
                   help="override the preset's C16 small-component filter "
                        "(0 disables); measured benefit: docs/ACCURACY.md")
    p.add_argument("--et-min-voxels", type=int, default=None,
                   help="override the preset's empty-ET relabel threshold "
                        "(tiny ET -> NCR; 0 disables). The largest "
                        "measured accuracy lever on the hard benchmark: "
                        "+0.17-0.33 ET Dice (docs/ACCURACY.md)")
    p.add_argument("--prep-cache", default=None, metavar="DIR",
                   help="on-disk transfer-payload cache: repeat arrivals "
                        "of the same case files skip NIfTI gzip decode + "
                        "brain-bbox scan + crop/cast (payload is bitwise "
                        "what the uncached path ships; VERDICT r3 #5)")
    p.add_argument("--serving-depth", type=int, default=None,
                   help="volumes concurrently in host prep/postprocess "
                        "(>1 hedges transfer stalls on bad links)")
    p.add_argument("--batch-volumes", type=int, default=None, choices=(1, 2),
                   help="2 = pair two volumes' fine TTA stages into one "
                        "b16 device program. Measured neutral since the "
                        "low-res TTA reduce (PERF.md r3 s7); kept "
                        "for completeness. Only pairing (2) is "
                        "implemented")
    p.add_argument("--save-probs", action="store_true",
                   help="also write <case>_probs.npz: the TTA-mean class "
                        "probabilities (float16, (X,Y,Z,4), BraTS disk "
                        "class order [0,1,2,4]) for offline ensembling / "
                        "uncertainty workflows (one extra device pass per "
                        "case; not available with --multichip)")
    p.add_argument("--save-uncertainty", action="store_true",
                   help="also write QU-BraTS voxelwise uncertainty maps "
                        "<case>_unc_{whole,core,enhance}.nii.gz (uint8 "
                        "[0,100], 0 = certain: binary entropy of each "
                        "region's TTA/ensemble-mean probability; one "
                        "extra device pass per case; not available with "
                        "--multichip)")
    p.add_argument("--ensemble", default=None, nargs="+", metavar="WORKDIR",
                   help="checkpoint-ensemble prediction: average class "
                        "probabilities over the primary --workdir model AND "
                        "each listed workdir's model, then argmax (the "
                        "reference paper's teacher-ensemble semantics). All "
                        "members share one compiled program — params are "
                        "traced arguments, so extra members add zero "
                        "recompiles. Composes with --multichip cascade "
                        "(one mesh program runs every member's sweep); "
                        "not with spatial/sweep")
    p.add_argument("--multichip", default=None,
                   choices=("spatial", "sweep", "cascade"),
                   help="run inference over ALL local devices as one mesh: "
                        "'cascade' = the FLAGSHIP program distributed "
                        "(coarse stage replicated, fine ROI tile x flip "
                        "items striped, low-res TTA reduce, one ROI psum) — "
                        "produces the single-device cascade predictor's "
                        "masks; 'spatial' = whole-volume forward, X axis "
                        "sharded with halo exchange (single-pass, no "
                        "TTA/cascade); 'sweep' = tile x flip work items "
                        "striped across chips (single-stage, no cascade)")
    p.add_argument("--shard", default=None, metavar="I/N",
                   help="process only the cases whose stable name-hash "
                        "lands in shard I of N (scale-out batch runs; "
                        "same assignment as serve --shard)")
    p.add_argument("--seed", type=int, default=None)
    return p


def _predict_multichip(args, exp, params_fine, params_coarse, cases) -> int:
    """--multichip {cascade,spatial,sweep}: whole-volume inference over a
    mesh of ALL local devices (infer/multichip.py). Config-5-style serving
    as a command (VERDICT round-2 #9; round-3 #3 adds the cascade-parity
    mode)."""
    from ..infer.multichip import MultichipPredictor

    # spatial/sweep are single-stage whole-canvas programs; say so instead
    # of silently dropping knobs the single-device path honors ('cascade'
    # IS the flagship decomposition — no bypass to warn about). One shared
    # helper keeps the three --multichip CLIs' contracts aligned.
    multichip_mode_notes(args.multichip, exp,
                         batch_volumes=args.batch_volumes,
                         serving_depth=args.serving_depth)

    members = None
    if args.ensemble:
        # ensemble x mesh composition (VERDICT round-4 #3): K members'
        # cascade sweeps in ONE mesh program, EnsemblePredictor masks at
        # mesh-parallel cost
        try:
            members = load_ensemble_members(
                exp, args.ensemble, (params_fine, params_coarse)
            )
        except FileNotFoundError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
    try:
        mp = MultichipPredictor(
            exp, params_fine, mode=args.multichip,
            params_coarse=params_coarse, members=members,
        )
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    print(f"[predict] multichip mode={args.multichip} over "
          f"{mp.env.n_data} devices"
          + (f", ensemble of {mp.num_members} members" if members else ""),
          flush=True)
    if args.profile:
        import jax

        jax.profiler.start_trace(args.profile)
    t0 = time.time()
    try:
        for d in cases:
            out = mp.predict_dir(
                d, args.output if (args.output and len(cases) == 1) else None
            )
            print(f"[predict] {d} -> {out}", flush=True)
    finally:
        if args.profile:
            import jax

            jax.profiler.stop_trace()
            print(f"[predict] profiler trace written to {args.profile}",
                  flush=True)
    dt = time.time() - t0
    print(f"[predict] {len(cases)} case(s) in {dt:.2f}s "
          f"({len(cases) / dt:.3f} volumes/sec, multichip)", flush=True)
    return 0


def _emit_probs_artifacts(
    pred, cases, save_probs, save_unc, output_dir=None
) -> None:
    """ONE probability pass per case feeds BOTH opt-in artifacts (probs
    npz and QU-BraTS uncertainty maps) — works for Predictor and
    EnsemblePredictor alike; serve reuses it with its --output-dir. Goes
    through ``probs_for_dir`` so the decode rides the payload disk cache
    (``--prep-cache``) instead of re-inflating the gzip NIfTIs the label
    pass just decoded."""
    if not (save_probs or save_unc):
        return
    import os

    from ..infer.predictor import save_probs_npz
    from ..infer.uncertainty import region_uncertainty_maps
    from ..utils.nifti import write_nifti

    for d in cases:
        case_name, header, probs = pred.probs_for_dir(d)
        dst = output_dir or d
        if save_probs:
            out = save_probs_npz(
                os.path.join(dst, f"{case_name}_probs.npz"), probs
            )
            print(f"[predict] {d} probs -> {out}", flush=True)
        if save_unc:
            for name, u in region_uncertainty_maps(probs).items():
                out = os.path.join(dst, f"{case_name}_unc_{name}.nii.gz")
                write_nifti(out, u, like=header)
                print(f"[predict] {d} uncertainty -> {out}", flush=True)


def _predict_ensemble(args, exp, primary, cases) -> int:
    """--ensemble: mean-probability multi-checkpoint prediction."""
    from ..infer.ensemble import EnsemblePredictor

    try:
        members = load_ensemble_members(exp, args.ensemble, primary)
    except FileNotFoundError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    if exp.infer.postproc == "device":
        print("note: --ensemble postprocesses on the host (the in-graph "
              "device CC lives in the label program, which the ensemble's "
              "probability path bypasses)", file=sys.stderr)
    for flag, name in ((args.batch_volumes, "--batch-volumes"),
                       (args.serving_depth, "--serving-depth")):
        if flag and flag > 1:
            print(f"note: {name} has no effect with --ensemble",
                  file=sys.stderr)
    pred = EnsemblePredictor(exp, members)
    print(f"[predict] ensemble of {pred.num_members} members", flush=True)
    if args.profile:
        import jax

        jax.profiler.start_trace(args.profile)
    t0 = time.time()
    try:
        for d in cases:
            out = args.output if (args.output and len(cases) == 1) else None
            out, stats = pred.predict_dir(d, out)
            print(f"[predict] {d} -> {out} "
                  f"(load {stats.load_s:.2f}s, device {stats.device_s:.2f}s, "
                  f"post {stats.post_s:.2f}s)", flush=True)
        _emit_probs_artifacts(
            pred, cases, args.save_probs, args.save_uncertainty
        )
    finally:
        if args.profile:
            import jax

            jax.profiler.stop_trace()
            print(f"[predict] profiler trace written to {args.profile}",
                  flush=True)
    dt = time.time() - t0
    print(f"[predict] {len(cases)} case(s) in {dt:.2f}s "
          f"({len(cases) / dt:.3f} volumes/sec, ensemble)", flush=True)
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from ..utils.jax_setup import setup_jax

    setup_jax()
    exp = resolve_experiment(args)
    infer = exp.infer
    if args.no_tta:
        infer = dataclasses.replace(infer, tta_flips=False)
    if args.no_cascade:
        infer = dataclasses.replace(infer, cascade=False)
    if args.transfer_dtype:
        infer = dataclasses.replace(infer, transfer_dtype=args.transfer_dtype)
    if args.postproc:
        infer = dataclasses.replace(infer, postproc=args.postproc)
    if args.serving_depth:
        infer = dataclasses.replace(infer, serving_depth=args.serving_depth)
    if args.prep_cache:
        infer = dataclasses.replace(infer, prep_cache_dir=args.prep_cache)
    if args.batch_volumes:
        infer = dataclasses.replace(infer, batch_volumes=args.batch_volumes)
    exp = dataclasses.replace(exp, infer=infer)

    cases = discover_cases(args.case_dir)
    if args.shard:
        from .common import filter_shard

        try:
            cases = filter_shard(cases, args.shard)
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        print(f"[predict] shard {args.shard}: {len(cases)} case(s)",
              flush=True)
        if not cases:
            return 0  # a legitimately empty shard is not an error
    if not cases:
        print(f"error: no BraTS case found at {args.case_dir}", file=sys.stderr)
        return 2
    if args.output and len(cases) > 1:
        print("error: --output only valid for a single case", file=sys.stderr)
        return 2

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
            print("warning: no coarse checkpoint; disabling cascade",
                  file=sys.stderr)
            exp = dataclasses.replace(
                exp, infer=dataclasses.replace(exp.infer, cascade=False)
            )

    if args.multichip:
        if args.save_probs or args.save_uncertainty:
            print("error: --save-probs/--save-uncertainty are not "
                  "available with --multichip (the probs pass is a "
                  "single-device program)", file=sys.stderr)
            return 2
        if args.ensemble and args.multichip != "cascade":
            print("error: --ensemble composes only with --multichip "
                  "cascade (spatial/sweep are single-stage whole-canvas "
                  "programs)", file=sys.stderr)
            return 2
        return _predict_multichip(args, exp, params_fine, params_coarse, cases)

    if args.ensemble:
        return _predict_ensemble(
            args, exp, (params_fine, params_coarse), cases
        )

    from ..infer.predictor import Predictor

    predictor = Predictor(exp, params_fine, params_coarse)
    if args.profile:
        import jax

        jax.profiler.start_trace(args.profile)
    t0 = time.time()
    try:
        if len(cases) == 1:
            out, stats = predictor.predict_dir(cases[0], args.output)
            print(
                f"[predict] {cases[0]} -> {out} "
                f"(load {stats.load_s:.2f}s, device {stats.device_s:.2f}s, "
                f"post {stats.post_s:.2f}s)",
                flush=True,
            )
        else:
            # pipelined serving path: decode/device/write stages overlap
            outs = predictor.predict_dirs(cases)
            for d, out in zip(cases, outs):
                print(f"[predict] {d} -> {out}", flush=True)
        _emit_probs_artifacts(
            predictor, cases, args.save_probs, args.save_uncertainty
        )
    finally:
        # an exception mid-predict must still finalize the trace (ADVICE
        # round 2) — an open trace dir is unreadable by tensorboard
        if args.profile:
            import jax

            jax.profiler.stop_trace()
            print(f"[predict] profiler trace written to {args.profile}",
                  flush=True)
    dt = time.time() - t0
    print(f"[predict] {len(cases)} case(s) in {dt:.2f}s "
          f"({len(cases) / dt:.3f} volumes/sec)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
