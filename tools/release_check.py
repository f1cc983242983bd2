"""One-command acceptance matrix: everything the driver/judge validates,
as a single local run with one JSON verdict line.

    python tools/release_check.py [--skip-tests] [--bench] [--tpu-smoke]

Checks (each in its own subprocess with the right platform env):
  tests        full pytest suite on the forced 8-virtual-device CPU mesh
  dryrun       __graft_entry__.dryrun_multichip(8) — the multi-chip train
               stage + checkpoint resume + mesh inference decompositions
  entry        __graft_entry__.entry() jits and executes (CPU here; the
               driver compile-checks the same fn on a real chip)
  cli_smoke    synthetic train -> export -> predict -> evaluate through the
               actual CLI entry points (config-1 path, SURVEY.md §7.2 M1)
  bench        (--bench) full driver-style bench.py on the default platform
               (real TPU when the axon tunnel is up) — slow: remote compile
  tpu_smoke    (--tpu-smoke) short real-device train+predict

Exit code 0 iff every selected check passed. Default selection is the fast
CPU set (tests + dryrun + entry + cli_smoke), ~10 min on this host.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CPU_ENV = {
    "JAX_PLATFORMS": "cpu",
    "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
}


def run(name: str, argv, *, env_extra=None, drop_axon=True, timeout=1800):
    """Run one check in a subprocess; returns a result dict."""
    env = dict(os.environ)
    if drop_axon:
        # sitecustomize registers the axon TPU tunnel via this variable;
        # removing it is the only reliable way to get a pure-CPU process
        env.pop("PALLAS_AXON_POOL_IPS", None)
    env.update(env_extra or {})
    t0 = time.time()
    try:
        proc = subprocess.run(
            argv, cwd=REPO, env=env, timeout=timeout,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        ok = proc.returncode == 0
        tail = "\n".join(proc.stdout.strip().splitlines()[-4:])
    except subprocess.TimeoutExpired:
        ok, tail = False, f"TIMEOUT after {timeout}s"
    res = {"ok": ok, "seconds": round(time.time() - t0, 1), "tail": tail}
    print(f"[release_check] {name}: {'PASS' if ok else 'FAIL'} "
          f"({res['seconds']}s)", file=sys.stderr, flush=True)
    if not ok:
        print(tail, file=sys.stderr, flush=True)
    return res


CLI_SMOKE = r"""
import dataclasses, tempfile, os
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from brats2019_tpu.data import synthetic
from brats2019_tpu.cli import train as t, predict as p, evaluate as ev, export as ex

tmp = tempfile.mkdtemp(prefix="release_check_")
data, run_dir = os.path.join(tmp, "data"), os.path.join(tmp, "run")
dirs = synthetic.write_dataset(data, 3, shape=(40, 40, 32))
assert t.main(["--data", data, "--preset", "smoke", "--stage", "fine",
               "--steps", "2", "--workdir", run_dir]) == 0
assert ex.main(["--preset", "smoke", "--workdir", run_dir]) == 0
assert p.main([dirs[2], "--preset", "smoke", "--workdir", run_dir,
               "--out", os.path.join(tmp, "pred.nii.gz")]) == 0
assert ev.main([dirs[2], "--preset", "smoke", "--workdir", run_dir,
                "--out", os.path.join(tmp, "eval.json")]) == 0

# round-3 surfaces: stablehlo deployment export (exact-equality check),
# torch import -> warm-start chain, and the serve daemon in --once mode
assert ex.main(["--preset", "smoke", "--workdir", run_dir,
                "--stablehlo", "--stablehlo-check"]) == 0
assert os.path.exists(os.path.join(run_dir, "stablehlo", "manifest.json"))

import torch, sys
sys.path.insert(0, "tests")
from test_golden_parity import TorchMirror
from brats2019_tpu.configs.presets import get_preset
torch.save(TorchMirror(get_preset("smoke").unet).state_dict(),
           os.path.join(tmp, "ref.pt"))
from brats2019_tpu.cli import import_torch as it
assert it.main([os.path.join(tmp, "ref.pt"), "--preset", "smoke",
                "--workdir", os.path.join(tmp, "imported")]) == 0
assert t.main(["--data", data, "--preset", "smoke", "--stage", "fine",
               "--steps", "1", "--workdir", os.path.join(tmp, "ft"),
               "--init-from", os.path.join(tmp, "ref.pt")]) == 0

import shutil
from brats2019_tpu.cli import serve as sv
watch = os.path.join(tmp, "incoming"); os.makedirs(watch)
shutil.copytree(dirs[2], os.path.join(watch, os.path.basename(dirs[2])))
assert sv.main([watch, "--preset", "smoke", "--workdir", run_dir,
                "--output-dir", os.path.join(tmp, "served"),
                "--once", "--postproc", "host"]) == 0
assert any(f.endswith("_pred.nii.gz")
           for f in os.listdir(os.path.join(tmp, "served")))

# round-4 surfaces: the supervised daemon (child spawned via -m, exit 0
# passes through) and mesh-parallel evaluate (sweep mode, 1-device mesh
# here — the 8-device parity lives in tests/)
watch2 = os.path.join(tmp, "incoming2"); os.makedirs(watch2)
shutil.copytree(dirs[2], os.path.join(watch2, os.path.basename(dirs[2])))
assert sv.main([watch2, "--preset", "smoke", "--workdir", run_dir,
                "--output-dir", os.path.join(tmp, "served2"),
                "--once", "--postproc", "host", "--supervise"]) == 0
assert any(f.endswith("_pred.nii.gz")
           for f in os.listdir(os.path.join(tmp, "served2")))
assert ev.main([dirs[2], "--preset", "smoke", "--workdir", run_dir,
                "--multichip", "sweep",
                "--out", os.path.join(tmp, "eval_mc.json")]) == 0
print("cli smoke ok")
"""

TPU_SMOKE = r"""
import dataclasses, tempfile, os
from brats2019_tpu.data import synthetic
from brats2019_tpu.cli import train as t, predict as p

tmp = tempfile.mkdtemp(prefix="release_check_tpu_")
data, run_dir = os.path.join(tmp, "data"), os.path.join(tmp, "run")
dirs = synthetic.write_dataset(data, 3, shape=(160, 160, 120))
assert t.main(["--data", data, "--preset", "single_chip", "--stage", "fine",
               "--steps", "20", "--checkpoint-every", "20",
               "--log-every", "10", "--workdir", run_dir]) == 0
assert p.main([dirs[2], "--preset", "single_chip", "--workdir", run_dir,
               "--out", os.path.join(tmp, "pred.nii.gz")]) == 0
print("tpu smoke ok")
"""


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--skip-tests", action="store_true",
                    help="skip the (slowest) full pytest suite")
    ap.add_argument("--bench", action="store_true",
                    help="also run the full driver-style bench.py")
    ap.add_argument("--tpu-smoke", action="store_true",
                    help="also run a short real-device train+predict")
    args = ap.parse_args(argv)

    py = sys.executable
    results = {}
    if not args.skip_tests:
        results["tests"] = run(
            "tests", [py, "-m", "pytest", "tests/", "-q"],
            env_extra=CPU_ENV, timeout=1200,
        )
    results["dryrun"] = run(
        "dryrun",
        [py, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        env_extra=CPU_ENV, timeout=900,
    )
    results["entry"] = run(
        "entry",
        [py, "-c",
         "import jax, __graft_entry__ as g; fn, a = g.entry();"
         "out = jax.jit(fn)(*a); jax.block_until_ready(out);"
         "print('entry ok', out.shape)"],
        env_extra=CPU_ENV, timeout=900,
    )
    results["cli_smoke"] = run(
        "cli_smoke", [py, "-c", CLI_SMOKE], env_extra=CPU_ENV, timeout=900,
    )
    if args.tpu_smoke:
        results["tpu_smoke"] = run(
            "tpu_smoke", [py, "-c", TPU_SMOKE], drop_axon=False, timeout=1800,
        )
    if args.bench:
        results["bench"] = run(
            "bench", [py, "bench.py"], drop_axon=False, timeout=3600,
        )

    ok = all(r["ok"] for r in results.values())
    print(json.dumps({"ok": ok, "checks": results}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
