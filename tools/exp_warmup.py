"""Round-4 `serve --warmup` validation on the real chip.

The --warmup flag claims to move the first-case cold compile (the 2-8 min
tunnel compile the axon plugin cannot cache across processes — PERF.md
round 3 "cold start") from the first arriving case to daemon startup.
This A/B measures exactly that claim at flagship scale:

  arm A (control): daemon WITHOUT --warmup; a 240x240x155 case is already
    pending when the daemon starts. First-case wall = compile + serve.
  arm B: daemon WITH --warmup; the case is dropped only after the daemon
    prints "warmup done". First-case wall = serve only (warm program).

Each arm then serves a second (steady-state) case in the same window, so
the first-case excess separates from the session's tunnel baseline.
Both arms run the flagship `cascade` preset with random-init exported
params (throughput measurement — training state irrelevant).

CAVEAT: single-shot walls through the axon tunnel are weather-exposed
(PERF.md "Tunnel variance" — d2h fetch stalls of minutes were observed in
bad windows), and the tunnel's REMOTE side evidently caches compiled
executables across processes, so the cold arm's compile cost depends on
what ran recently. Compare arms against their own steady-state and read
multiple sessions before concluding. Results -> PERF.md "serve --warmup"
(round 4).

Usage: python tools/exp_warmup.py [--arm A|B|both]
"""

from __future__ import annotations

import argparse
import os as _os
import re
import shutil
import signal
import subprocess
import sys as _sys
import tempfile
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def log(*a):
    print(*a, file=_sys.stderr, flush=True)


def make_workdir(tmp, preset):
    """Export random-init flagship params in the layout load_stage_params
    accepts (same as tools/exp_serve_soak.py)."""
    import jax
    import jax.numpy as jnp

    from brats2019_tpu.configs import get_preset
    from brats2019_tpu.models import UNet3D
    from brats2019_tpu.train.checkpoint import export_params

    exp = get_preset(preset)
    workdir = _os.path.join(tmp, "run")
    stages = [("fine", exp.unet, 0)]
    if exp.coarse_unet is not None:
        stages.append(("coarse", exp.coarse_unet, 1))
    for stage, cfg, seed in stages:
        params = UNet3D(cfg).init(
            jax.random.PRNGKey(seed), jnp.zeros((1, 16, 16, 16, 4))
        )
        d = _os.path.join(workdir, stage)
        _os.makedirs(d, exist_ok=True)
        export_params(_os.path.join(d, "params.npz"), params)
    return workdir


def make_case(tmp, shape):
    from brats2019_tpu.data.synthetic import write_case

    src = _os.path.join(tmp, "case_src")
    write_case(src, seed=0, shape=shape)
    return src


def drop_case(src, watch_root, name):
    """Atomically install a copy of the case under the watch root (dir
    rename is atomic, so the readiness scan never sees partial files)."""
    stage = _os.path.join(_os.path.dirname(watch_root), name + ".staging")
    shutil.copytree(src, stage)
    # rename modality files to the case name the watcher expects
    for f in sorted(_os.listdir(stage)):
        new = f.replace(_os.path.basename(src), name)
        if new != f:
            _os.rename(_os.path.join(stage, f), _os.path.join(stage, new))
    _os.rename(stage, _os.path.join(watch_root, name))


def wait_for(logf, pattern, timeout, t0=None, proc=None, nth=1):
    """Poll the daemon log until `pattern` has matched `nth` times; return
    (elapsed, nth match)."""
    start = time.time()
    rx = re.compile(pattern)
    while time.time() - start < timeout:
        with open(logf) as f:
            txt = f.read()
        ms = list(rx.finditer(txt))
        if len(ms) >= nth:
            return time.time() - (t0 if t0 is not None else start), ms[nth - 1]
        if proc is not None and proc.poll() is not None:
            raise RuntimeError(
                f"daemon exited (code {proc.returncode}) before "
                f"{pattern!r}:\n{txt[-2000:]}"
            )
        time.sleep(0.5)
    raise TimeoutError(f"{pattern!r} not seen in {timeout}s:\n{txt[-2000:]}")


def run_arm(tmp, workdir, case_src, warmup: bool, preset="cascade",
            timeout=900):
    arm = "warm" if warmup else "cold"
    watch = _os.path.join(tmp, f"watch_{arm}")
    _os.makedirs(watch)
    # per-arm case name AND output dir: the daemon's completion log lives
    # in --output-dir and replays on startup (by design), so a shared
    # output dir would make arm B skip arm A's already-served case name
    name = f"case_{arm}"
    if not warmup:
        drop_case(case_src, watch, name)  # pending before the daemon starts
    logf = _os.path.join(tmp, f"serve_{'warm' if warmup else 'cold'}.log")
    cmd = [
        _sys.executable, "-m", "brats2019_tpu.cli.serve", watch,
        "--preset", preset, "--workdir", workdir,
        "--output-dir", _os.path.join(tmp, f"out_{arm}"),
        "--poll", "1",
    ] + (["--warmup"] if warmup else [])
    lf = open(logf, "w")
    proc = subprocess.Popen(cmd, stdout=lf, stderr=subprocess.STDOUT)
    try:
        res = {}
        if warmup:
            t, m = wait_for(logf, r"warmup done in ([0-9.]+)s", timeout,
                            proc=proc)
            res["warmup_s"] = float(m.group(1))
            log(f"arm B: warmup done in {res['warmup_s']:.1f}s")
            drop_case(case_src, watch, name)
        _, m = wait_for(logf, r"1/1 case\(s\) in ([0-9.]+)s", timeout,
                        proc=proc)
        res["first_case_wall_s"] = float(m.group(1))
        log(f"arm {'B' if warmup else 'A'}: first case served in "
            f"{res['first_case_wall_s']:.1f}s")
        # steady-state sample in the SAME weather window, so the first-case
        # excess can be separated from the session's tunnel baseline
        drop_case(case_src, watch, name + "_steady")
        _, m = wait_for(logf, r"1/1 case\(s\) in ([0-9.]+)s", timeout,
                        proc=proc, nth=2)
        res["steady_case_wall_s"] = float(m.group(1))
        log(f"arm {'B' if warmup else 'A'}: steady case served in "
            f"{res['steady_case_wall_s']:.1f}s")
        return res
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(60)
        except subprocess.TimeoutExpired:
            proc.kill()
        lf.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", choices=["A", "B", "both"], default="both")
    ap.add_argument("--preset", default="cascade",
                    help="flagship 'cascade' on the chip; 'unit' for a "
                         "CPU smoke of the harness itself")
    ap.add_argument("--shape", type=int, nargs=3, default=(240, 240, 155))
    ap.add_argument("--timeout", type=float, default=900)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="exp_warmup_")
    log(f"scratch: {tmp}")
    try:
        workdir = make_workdir(tmp, args.preset)
        case_src = make_case(tmp, tuple(args.shape))
        out = {}
        if args.arm in ("A", "both"):
            log("=== arm A: no --warmup, case pending at startup ===")
            out["cold"] = run_arm(tmp, workdir, case_src, warmup=False,
                                  preset=args.preset, timeout=args.timeout)
        if args.arm in ("B", "both"):
            log("=== arm B: --warmup, case dropped after warm ===")
            out["warm"] = run_arm(tmp, workdir, case_src, warmup=True,
                                  preset=args.preset, timeout=args.timeout)
        print(out)
        if "cold" in out and "warm" in out:
            print(
                f"first-case wall: cold {out['cold']['first_case_wall_s']:.1f}s"
                f" -> warm {out['warm']['first_case_wall_s']:.1f}s "
                f"(warmup paid at startup: {out['warm']['warmup_s']:.1f}s; "
                f"steady-state cold/warm: "
                f"{out['cold']['steady_case_wall_s']:.1f}/"
                f"{out['warm']['steady_case_wall_s']:.1f}s)"
            )
    finally:
        if not args.keep:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
