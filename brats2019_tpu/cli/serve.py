"""``serve`` — long-running prediction daemon (production serving surface).

Usage:
    python -m brats2019_tpu.cli.serve <watch_root> [--preset cascade]
        [--workdir DIR] [--output-dir DIR] [--poll 0.5] [--once]

Watches ``watch_root`` for BraTS case directories appearing (all four
modality files present and size-stable across one poll interval), runs the
pipelined predictor on each arrival batch — NIfTI decode, host->device
transfer, the compiled cascade+TTA program, and postprocess/write all
overlap (infer/predictor.py) — and writes ``<case>_pred.nii.gz`` plus one
JSONL completion record per case to ``<output-dir>/serve_log.jsonl``.

The reference has no serving story beyond one-shot ``predict`` (SURVEY.md
C17); this is the TPU-deployment counterpart: params stay committed on
device across requests (no reload, no recompile), new work is picked up
within one poll interval, and SIGTERM/SIGINT drain in-flight cases before
exit. ``--once`` processes what is present and exits (used by tests and
batch jobs).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import signal
import sys
import time

from ..configs.presets import PRESETS
from ..data.case import discover_cases, modality_paths
from .common import load_stage_params, resolve_experiment


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="brats2019_tpu.serve", description=__doc__)
    p.add_argument("watch_root", help="directory where case dirs appear")
    p.add_argument("--preset", default="cascade", choices=sorted(PRESETS))
    p.add_argument("--workdir", default=None)
    p.add_argument("--output-dir", default=None,
                   help="write predictions+log here instead of the case dirs")
    p.add_argument("--poll", type=float, default=0.5,
                   help="seconds between watch-root scans")
    p.add_argument("--once", action="store_true",
                   help="drain current cases and exit")
    p.add_argument("--no-tta", action="store_true")
    p.add_argument("--no-cascade", action="store_true")
    p.add_argument("--transfer-dtype", default=None,
                   choices=("bfloat16", "int8"),
                   help="host->device encoding: int8 halves link bytes "
                        "(lossy, ~99.999%% mask agreement; PERF.md)")
    p.add_argument("--postproc", default=None, choices=("host", "device"),
                   help="where C16 connected-components runs")
    p.add_argument("--seed", type=int, default=None)
    return p


def _case_ready(case_dir: str, sizes: dict) -> bool:
    """All 4 modalities exist and their sizes did not change since the last
    scan (an uploader mid-copy never has a stable size across a poll)."""
    try:
        cur = tuple(os.path.getsize(p) for p in modality_paths(case_dir))
    except OSError:
        return False
    prev = sizes.get(case_dir)
    sizes[case_dir] = cur
    return prev == cur


class Server:
    def __init__(self, exp, output_dir=None):
        params_fine = load_stage_params(exp, "fine")
        params_coarse = None
        if exp.infer.cascade and exp.coarse_unet is not None:
            try:
                params_coarse = load_stage_params(exp, "coarse")
            except FileNotFoundError:
                print("serve: no coarse checkpoint; cascade off",
                      file=sys.stderr)
                exp = dataclasses.replace(
                    exp, infer=dataclasses.replace(exp.infer, cascade=False)
                )
        from ..infer.predictor import Predictor

        self.exp = exp
        self.predictor = Predictor(exp, params_fine, params_coarse)
        self.output_dir = output_dir
        self.log_path = os.path.join(
            output_dir or ".", "serve_log.jsonl"
        )
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
        self.done = self._load_done()
        self._stop = False

    def _load_done(self) -> set:
        """Replay the completion log so a restarted daemon skips served AND
        quarantined cases (a poison case must never crash-loop)."""
        done = set()
        try:
            with open(self.log_path) as f:
                for line in f:
                    try:
                        done.add(json.loads(line)["case"])
                    except (ValueError, KeyError):
                        continue
        except OSError:
            pass
        return done

    def request_stop(self, *_):
        self._stop = True

    @property
    def stopping(self) -> bool:
        return self._stop

    def _out_paths(self, case_dirs):
        if not self.output_dir:
            return None
        return [
            os.path.join(self.output_dir, os.path.basename(d) + "_pred.nii.gz")
            for d in case_dirs
        ]

    def _log(self, records) -> None:
        with open(self.log_path, "a") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")

    def process_batch(self, case_dirs) -> list:
        """Run one pipelined batch (predict_dirs — decode/device/write
        overlap across the batch). A failing case is isolated by retrying
        the batch case-by-case; failures are quarantined (logged with an
        ``error`` field, marked done) so one corrupt upload can neither
        kill the daemon nor crash-loop it on restart."""
        t0 = time.time()
        try:
            outs = self.predictor.predict_dirs(
                case_dirs, output_paths=self._out_paths(case_dirs)
            )
            errs = [None] * len(case_dirs)
        except Exception:
            outs, errs = [], []
            for d in case_dirs:  # isolate the poison case
                o, e = self._predict_one_isolated(d)
                outs.append(o)
                errs.append(e)
        wall = time.time() - t0
        records = []
        for d, o, e in zip(case_dirs, outs, errs):
            rec = {
                "case": os.path.basename(d),
                "output": o,
                "batch_size": len(case_dirs),
                "batch_wall_s": round(wall, 3),
                "ts": time.time(),
            }
            if e is not None:
                rec["error"] = e
                print(f"serve: QUARANTINED {d}: {e}", file=sys.stderr,
                      flush=True)
            records.append(rec)
        self._log(records)
        self.done.update(os.path.basename(d) for d in case_dirs)
        ok = sum(1 for e in errs if e is None)
        print(
            f"serve: {ok}/{len(case_dirs)} case(s) in {wall:.2f}s "
            f"({len(case_dirs) / wall:.3f} vol/s)",
            flush=True,
        )
        return outs

    def _predict_one_isolated(self, case_dir: str, retries: int = 1):
        """One case with transient-failure retry: a device/runtime hiccup
        (RESOURCE_EXHAUSTED, INTERNAL — both observed transiently on shared
        TPU pools) must not permanently quarantine a healthy case; only an
        error that persists across a retry is the case's fault."""
        for attempt in range(retries + 1):
            try:
                return (
                    self.predictor.predict_dirs(
                        [case_dir], output_paths=self._out_paths([case_dir])
                    )[0],
                    None,
                )
            except Exception as e:  # noqa: BLE001 — classify below
                msg = f"{type(e).__name__}: {e}"
                transient = any(
                    t in msg for t in ("RESOURCE_EXHAUSTED", "INTERNAL")
                )
                if transient and attempt < retries:
                    print(
                        f"serve: transient failure on {case_dir}, retrying: "
                        f"{msg[:200]}",
                        file=sys.stderr, flush=True,
                    )
                    time.sleep(1.0)
                    continue
                return None, msg
        return None, "unreachable"

    def scan(self, watch_root: str, sizes: dict) -> list:
        return [
            d
            for d in discover_cases(watch_root)
            if os.path.basename(d) not in self.done and _case_ready(d, sizes)
        ]

    def run(self, watch_root: str, poll: float, once: bool) -> int:
        sizes: dict = {}
        if once:
            self.scan(watch_root, sizes)  # prime size table
            time.sleep(poll)  # a mid-upload case must see sizes change
            ready = self.scan(watch_root, sizes)
            if ready:
                self.process_batch(ready)
            return 0
        print(f"serve: watching {watch_root} (poll {poll}s)", flush=True)
        self._last_hb = 0.0
        while not self._stop:
            self._heartbeat(poll)
            ready = self.scan(watch_root, sizes)
            if ready:
                # bounded chunks so the heartbeat stays fresh under a
                # burst — a supervisor must not kill a busy-but-healthy
                # daemon mid-batch (staleness bound ~= 8 x per-case time)
                for i0 in range(0, len(ready), 8):
                    self.process_batch(ready[i0 : i0 + 8])
                    self._heartbeat(poll)
                    if self._stop:
                        break
            else:
                time.sleep(poll)
        print("serve: drained, exiting", flush=True)
        return 0

    def _heartbeat(self, poll: float) -> None:
        now = time.time()
        if now - getattr(self, "_last_hb", 0.0) < max(poll, 5.0):
            return
        hb_path = os.path.join(self.output_dir or ".", "serve_heartbeat.json")
        tmp = hb_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"ts": now, "done": len(self.done)}, f)
        os.replace(tmp, hb_path)
        self._last_hb = now


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
    exp = dataclasses.replace(exp, infer=infer)

    try:
        server = Server(exp, output_dir=args.output_dir)
    except FileNotFoundError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    signal.signal(signal.SIGTERM, server.request_stop)
    signal.signal(signal.SIGINT, server.request_stop)
    return server.run(args.watch_root, args.poll, args.once)


if __name__ == "__main__":
    raise SystemExit(main())
