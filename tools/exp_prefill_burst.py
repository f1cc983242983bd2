"""Round-5 measurement for VERDICT r4 #5: does the serve watch loop's
background payload-cache prefill actually drop queued-case prep to the
warm-hit cost on a multi-case burst?

Setup: one in-process serve daemon at flagship scale (cascade preset,
240x240x155 cases) on the real chip, a burst of N unique cases
pre-dropped in the watch root. The loop serves them in chunks of 8;
cases 8..N-1 are queued behind chunk 1 and are the prefill targets
(run() enqueues ready[8:]. An earlier in-batch prefill of
case_dirs[serving_depth:] was REMOVED after round 1 of this A/B: it
duplicated predict_dirs' own pipelined prep and the contention cost
3.5 -> 15 s per-case prep and a 4x burst wall on the 1-core host).

Arms (same process, same compiled programs, fresh prep-cache/output/watch
dirs per arm, identical case content under arm-unique names):
  off: Server._can_prefill=False  — queued cases pay the cold
       gzip-decode+bbox at their turn (~0.6-1.2 s/case on this host)
  on:  shipped default            — the background thread prefills the
       on-disk payload cache during chunk-1 serving, so chunk-2 prep is
       a warm hit (~25 ms host + transfer)

Metrics: per-case _prep_dir_to wall (tool-wrapped, keyed by case), chunk
walls, total burst wall, prefilled counter, and bitwise mask parity
between arms (prefill must not change served masks).

Results -> PERF.md round 5 "serve prefill burst A/B".
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import functools
import json
import shutil
import statistics
import tempfile
import threading
import time


def log(*a):
    print(*a, file=_sys.stderr, flush=True)


def make_workdir(tmp):
    """Random-init flagship params (prep-side A/B — training state is
    irrelevant) in the layout load_stage_params accepts."""
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


def stage_cases(tmp, n, shape):
    """N unique synthetic cases (distinct seeds -> distinct payload
    signatures, so no case warms another's cache entry)."""
    from brats2019_tpu.data.synthetic import write_case

    staged = []
    for i in range(n):
        d = _os.path.join(tmp, "staging", f"case{i:02d}")
        write_case(d, seed=1000 + i, shape=shape, with_seg=False)
        staged.append(d)
        log(f"  staged case {i}")
    return staged


def copy_burst(staged, watch_root, arm):
    """Copy the staged cases into an arm's watch root under arm-unique
    names (modality files are keyed <name>_<mod>.nii.gz)."""
    _os.makedirs(watch_root, exist_ok=True)
    names = []
    for i, src in enumerate(staged):
        name = f"BraTS19_BURST_{arm}_{i:02d}"
        dst = _os.path.join(watch_root, name)
        _os.makedirs(dst)
        src_name = _os.path.basename(src)
        for f in _os.listdir(src):
            shutil.copyfile(
                _os.path.join(src, f),
                _os.path.join(dst, f.replace(src_name, name)),
            )
        names.append(name)
    return names


def run_arm(server, watch_root, out_dir, cache_dir, n, prefill_on):
    """Point the live Server at a fresh watch/output/prep-cache trio and
    drain the pre-dropped burst through the REAL watch loop."""
    server.exp = dataclasses.replace(
        server.exp,
        infer=dataclasses.replace(server.exp.infer, prep_cache_dir=cache_dir),
    )
    server.predictor.exp = server.exp
    _os.makedirs(out_dir, exist_ok=True)
    server.output_dir = out_dir
    server.log_dir = out_dir
    server.log_path = _os.path.join(out_dir, "serve_log.jsonl")
    server.done = set()
    server.results = {}
    server._stop = False
    server._can_prefill = bool(prefill_on)
    server._prefill_queued = set()
    server.counters["prefilled"] = 0
    prep_walls = server.predictor._tool_prep_walls = {}

    t0 = time.time()
    t = threading.Thread(
        target=server.run, args=(watch_root, 0.2, False), daemon=True
    )
    t.start()
    deadline = time.time() + 1800
    while time.time() < deadline and len(server.done) < n:
        time.sleep(0.5)
    server.request_stop()
    t.join(timeout=120)
    wall = time.time() - t0
    assert len(server.done) == n, f"served {len(server.done)}/{n}"
    recs = [json.loads(l) for l in open(server.log_path)]
    assert all("error" not in r for r in recs), recs
    chunk_walls = sorted({r["batch_wall_s"] for r in recs})
    return {
        "wall_s": round(wall, 2),
        "chunk_walls_s": chunk_walls,
        "prefilled": server.counters["prefilled"],
        "prep_walls": {k: round(v, 3) for k, v in prep_walls.items()},
    }


def main(n=12, shape=(240, 240, 155)):
    import jax

    from brats2019_tpu.cli import serve as cli_serve
    from brats2019_tpu.infer.predictor import Predictor

    tmp = tempfile.mkdtemp(prefix="exp_prefill_burst_")
    try:
        log(f"devices: {jax.devices()}")
        workdir = make_workdir(tmp)
        log(f"staging {n} unique flagship cases ...")
        staged = stage_cases(tmp, n, shape)

        # per-case prep timing: wrap _prep_dir_to on the class (the
        # pipelined path calls it from prep-pool threads)
        orig_prep = Predictor._prep_dir_to

        @functools.wraps(orig_prep)
        def timed_prep(self, case_dir, dev):
            t0 = time.time()
            out = orig_prep(self, case_dir, dev)
            walls = getattr(self, "_tool_prep_walls", None)
            if walls is not None:
                walls[_os.path.basename(case_dir)] = time.time() - t0
            return out

        Predictor._prep_dir_to = timed_prep

        exp = cli_serve.resolve_experiment(
            cli_serve.build_parser().parse_args([
                _os.path.join(tmp, "unused_watch"), "--preset", "cascade",
                "--workdir", workdir,
                "--prep-cache", _os.path.join(tmp, "cache_warmup"),
            ])
        )
        server = cli_serve.Server(exp)
        log("warmup (compile the serving programs once for both arms) ...")
        t = server.warmup()
        log(f"  warmup {t:.1f}s")

        # copy both bursts up front so neither arm gets a page-cache edge
        watch = {a: _os.path.join(tmp, f"watch_{a}") for a in ("off", "on")}
        names = {a: copy_burst(staged, watch[a], a) for a in ("off", "on")}

        results = {}
        for arm, prefill_on in (("off", False), ("on", True)):
            log(f"arm {arm}: draining the {n}-case burst ...")
            results[arm] = run_arm(
                server, watch[arm], _os.path.join(tmp, f"out_{arm}"),
                _os.path.join(tmp, f"cache_{arm}"), n, prefill_on,
            )
            log(f"  wall {results[arm]['wall_s']}s, "
                f"prefilled {results[arm]['prefilled']}, "
                f"chunks {results[arm]['chunk_walls_s']}")

        # mask parity: prefill must not change a single served voxel
        from brats2019_tpu.utils.nifti import read_nifti

        import numpy as np

        for i in range(n):
            a = read_nifti(_os.path.join(
                tmp, "out_off", names["off"][i] + "_pred.nii.gz"))[0]
            b = read_nifti(_os.path.join(
                tmp, "out_on", names["on"][i] + "_pred.nii.gz"))[0]
            assert np.array_equal(a, b), f"mask mismatch on case {i}"
        log(f"mask parity: {n}/{n} bitwise identical across arms")

        log("")
        log("| arm | queued-case prep (cases 8..N, median) | all-case prep "
            "median | chunk walls (s) | burst wall | prefilled |")
        log("|---|---|---|---|---|---|")
        for arm in ("off", "on"):
            r = results[arm]
            walls = [r["prep_walls"][nm] for nm in names[arm]]
            queued = walls[8:]
            log(f"| {arm} | {statistics.median(queued) * 1e3:.0f} ms | "
                f"{statistics.median(walls) * 1e3:.0f} ms | "
                f"{r['chunk_walls_s']} | {r['wall_s']} s | "
                f"{r['prefilled']} |")
        print(json.dumps({a: results[a] for a in results}, indent=1))
        return 0
    finally:
        Predictor._prep_dir_to = orig_prep
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=12)
    ap.add_argument("--shape", type=int, nargs=3, default=(240, 240, 155))
    a = ap.parse_args()
    raise SystemExit(main(a.n, tuple(a.shape)))
