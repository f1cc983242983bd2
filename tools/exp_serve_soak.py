"""Round-4 sustained-serving soak: the HTTP daemon under a continuous
request stream on the real chip.

The round-4 serving work (payload cache, weakref memo, multichip daemon)
touched the long-lived paths; this soak is the production-serving
evidence: run `serve --http` at flagship scale and feed it distinct cases
(unique name per request — the API is idempotent per name) for several
minutes, recording per-request wall, daemon RSS, and /stats. Pass/fail
eyes: no errors, RSS flat after warmup (no leak in the memo/cache/jit
paths), throughput steady at the tunnel's weather level.

Results -> PERF.md "sustained serving soak" (round 4).
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import io
import json
import signal
import statistics
import subprocess
import tarfile
import tempfile
import time
import urllib.request


def log(*a):
    print(*a, file=_sys.stderr, flush=True)


def make_workdir(tmp):
    """Export random-init flagship params (throughput soak — training
    state is irrelevant) in the layout load_stage_params accepts."""
    import jax
    import jax.numpy as jnp

    from brats2019_tpu.configs import get_preset
    from brats2019_tpu.models import UNet3D
    from brats2019_tpu.train.checkpoint import export_params

    exp = get_preset("cascade")
    workdir = _os.path.join(tmp, "run")
    for stage, cfg, seed in (("fine", exp.unet, 0),
                             ("coarse", exp.coarse_unet, 1)):
        params = UNet3D(cfg).init(
            jax.random.PRNGKey(seed), jnp.zeros((1, 16, 16, 16, 4))
        )
        d = _os.path.join(workdir, stage)
        _os.makedirs(d, exist_ok=True)
        export_params(_os.path.join(d, "params.npz"), params)
    return workdir


def make_case_members(tmp, n=4):
    """Pre-gzipped modality bytes per case; each request wraps them in an
    UNCOMPRESSED tar with members renamed to the request's unique case
    name (modality files are keyed <name>_<mod>.nii.gz)."""
    from brats2019_tpu.data.constants import MODALITIES
    from brats2019_tpu.data.synthetic import write_case

    cases = []
    for i in range(n):
        case = _os.path.join(tmp, f"case{i}")
        write_case(case, seed=i, shape=(240, 240, 155), with_seg=False)
        members = []
        for m in MODALITIES:
            with open(_os.path.join(case, f"case{i}_{m}.nii.gz"), "rb") as f:
                members.append((m, f.read()))
        cases.append(members)
        log(f"  case {i}: {sum(len(b) for _, b in members) / 1e6:.1f} MB gz")
    return cases


def tar_for(name, members):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for mod, data in members:
            info = tarfile.TarInfo(f"{name}_{mod}.nii.gz")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def rss_mb(pid):
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        return float("nan")
    return float("nan")


def http(method, url, data=None, timeout=600):
    req = urllib.request.Request(url, data=data, method=method)
    if data is not None:
        req.add_header("Content-Type", "application/gzip")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, r.read()


def child_pid(pid):
    """First child of pid (the supervised daemon under --supervise)."""
    try:
        with open(f"/proc/{pid}/task/{pid}/children") as f:
            kids = f.read().split()
        return int(kids[0]) if kids else None
    except (OSError, ValueError):
        return None


def main(duration_s=480, port=18917, rss_limit_mb=0, builtin=False,
         warmup=False):
    tmp = tempfile.mkdtemp(prefix="exp_soak_")
    workdir = make_workdir(tmp)
    log("building flagship-size cases ...")
    cases = make_case_members(tmp)
    watch = _os.path.join(tmp, "incoming")
    out = _os.path.join(tmp, "served")
    _os.makedirs(watch, exist_ok=True)
    base = f"http://127.0.0.1:{port}"

    def launch():
        cmd = [_sys.executable, "-m", "brats2019_tpu.cli.serve", watch,
               "--preset", "cascade", "--workdir", workdir,
               "--output-dir", out, "--http", str(port)]
        if rss_limit_mb:
            cmd += ["--rss-limit-mb", str(rss_limit_mb)]
        if warmup:
            cmd += ["--warmup"]
        if builtin:
            # serve runs its OWN supervisor (--supervise): the soak then
            # only streams requests; recycles are visible as child-pid
            # changes and as connection resets the client retries through
            cmd += ["--supervise"]
        return subprocess.Popen(
            cmd,
            cwd=_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )

    def wait_healthy(proc, tries=240):
        for _ in range(tries):  # cold compile over the tunnel: minutes
            try:
                if http("GET", base + "/healthz", timeout=5)[0] == 200:
                    return True
            except OSError:
                pass
            if proc.poll() is not None:
                return False
            time.sleep(2)
        return False

    proc = launch()
    try:
        if not wait_healthy(proc):
            log("daemon never became healthy")
            return 1
        log(f"daemon healthy (pid {proc.pid}, RSS {rss_mb(proc.pid):.0f} MB)")

        walls, rss_track, errors, recycles = [], [], 0, 0
        kid = child_pid(proc.pid) if builtin else None
        t_end = time.time() + duration_s
        i = 0
        while time.time() < t_end:
            if builtin:
                # serve --supervise owns restarts; the soak only notices
                # them (child pid change) and treats supervisor death as
                # the failure it is
                if proc.poll() is not None:
                    log(f"  SUPERVISOR exited code {proc.returncode}")
                    errors += 1
                    return 1
                k = child_pid(proc.pid)
                if k is not None and k != kid:
                    recycles += 1
                    log(f"  builtin supervisor recycled the daemon "
                        f"(child {kid} -> {k})")
                    kid = k
            # external-supervisor mode: a voluntary EXIT_RECYCLE (4) gets a
            # restart; the completion log replays, so no served case is lost
            elif proc.poll() is not None:
                code = proc.returncode
                log(f"  daemon exited code {code} "
                    f"({'recycle' if code == 4 else 'UNEXPECTED'}); restarting")
                if code != 4:
                    errors += 1
                recycles += 1
                proc = launch()
                if not wait_healthy(proc):
                    log("restart never became healthy")
                    return 1
                log(f"  restarted (pid {proc.pid}, "
                    f"RSS {rss_mb(proc.pid):.0f} MB)")
            name = f"SOAK_{i:04d}"
            body = tar_for(name, cases[i % len(cases)])
            t0 = time.time()
            try:
                # timeout must cover a post-restart cold compile (the axon
                # plugin cannot deserialize executables, PERF.md round 3 —
                # every recycle re-pays the full remote compile)
                status, _body = http(
                    "POST", base + f"/predict?name={name}&timeout=560",
                    data=body, timeout=580,
                )
                if status != 200:
                    errors += 1
            except OSError as e:
                # connection refused during a recycle window is the
                # supervisor hand-off, not a serving error; retry once
                # after the restart check at the top of the loop
                log(f"  req {i}: {e} (recycle window?)")
                time.sleep(2)
                continue
            walls.append(time.time() - t0)
            if i % 10 == 0:
                rss_track.append((i, rss_mb(kid if builtin else proc.pid)))
                log(f"  req {i}: {walls[-1]:.2f}s, RSS {rss_track[-1][1]:.0f} MB")
            i += 1
        n = len(walls)
        walls_warm = walls[2:] if n > 4 else walls
        log("")
        log(f"soak: {n} requests in {duration_s}s wall, {errors} errors, "
            f"{recycles} recycles")
        log(f"  p50 {statistics.median(walls_warm):.2f}s  "
            f"p95 {sorted(walls_warm)[int(0.95 * len(walls_warm))]:.2f}s  "
            f"max {max(walls_warm):.2f}s (warm)")
        log(f"  throughput {n / duration_s:.3f} req/s sustained")
        log(f"  RSS track (req, MB): {[(r, round(m)) for r, m in rss_track]}")
        return 0 if errors == 0 else 1
    finally:
        if proc.poll() is None:
            proc.send_signal(signal.SIGTERM)
            try:
                proc.wait(timeout=60)
            except subprocess.TimeoutExpired:
                proc.kill()
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=int, default=480)
    ap.add_argument("--port", type=int, default=18917)
    ap.add_argument("--rss-limit-mb", type=int, default=0,
                    help="pass through to serve; the soak then acts as the "
                         "supervisor (restart on exit code 4) unless "
                         "--builtin-supervisor")
    ap.add_argument("--builtin-supervisor", action="store_true",
                    help="launch serve --supervise and let IT handle "
                         "recycles (round-4 --supervise validation)")
    ap.add_argument("--warmup", action="store_true",
                    help="pass --warmup to serve (recycled daemons "
                         "re-compile at startup, off the first case)")
    a = ap.parse_args()
    raise SystemExit(main(a.duration, a.port, a.rss_limit_mb,
                          builtin=a.builtin_supervisor, warmup=a.warmup))
