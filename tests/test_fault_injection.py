"""Fault injection: SIGKILL training mid-run, restart, assert resume
(SURVEY.md §5 "failure detection / elastic recovery": a test that kills
training mid-epoch and asserts resumable state)."""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # skip axon; run on CPU
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)  # and compile locally
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["BRATS2019_TPU_COMPILE_CACHE"] = "/root/.cache/jax_test_cache"
    env["PYTHONPATH"] = "/root/.axon_site:" + REPO
    return env


def _cli(args, cwd):
    return subprocess.Popen(
        [sys.executable, "-m", "brats2019_tpu.cli.train"] + args,
        cwd=cwd, env=_env(),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


@pytest.mark.slow
def test_kill_mid_training_and_resume(tmp_path):
    data = str(tmp_path / "data")
    workdir = str(tmp_path / "run")
    args = [
        "--data", data, "--synthetic", "2", "--synthetic-shape", "32", "32", "32",
        "--preset", "unit", "--steps", "2000",  # far more than we'll allow
        "--checkpoint-every", "3", "--eval-every", "0", "--log-every", "1",
        "--workdir", workdir,
    ]
    proc = _cli(args, str(tmp_path))
    ckpt_root = os.path.join(workdir, "fine", "checkpoints")
    # wait until at least one numbered checkpoint is committed, then SIGKILL
    deadline = time.time() + 240
    committed = False
    while time.time() < deadline:
        if os.path.isdir(ckpt_root):
            steps = [d for d in os.listdir(ckpt_root) if d.isdigit()]
            # orbax writes atomically; a listed digit dir is committed
            if steps:
                committed = True
                break
        if proc.poll() is not None:
            out = proc.stdout.read()
            raise AssertionError(f"train exited early:\n{out[-2000:]}")
        time.sleep(1)
    assert committed, "no checkpoint appeared before deadline"
    os.kill(proc.pid, signal.SIGKILL)
    proc.wait(timeout=30)

    # restart with a small total step count: must RESUME, not restart
    args2 = list(args)
    args2[args2.index("--steps") + 1] = "12"
    args2[args2.index("--synthetic") + 1] = "0"  # data already on disk
    proc2 = _cli(args2, str(tmp_path))
    out, _ = proc2.communicate(timeout=420)
    assert proc2.returncode == 0, out[-2000:]
    assert "resumed from step" in out
    # training continued to the new target
    mfile = os.path.join(workdir, "fine", "fine_metrics.jsonl")
    steps_logged = [json.loads(l)["step"] for l in open(mfile) if "loss" in l]
    assert max(steps_logged) == 12
