"""Multi-process (multi-host) execution of the flagship paths.

Config 5's target shape is a v4-32 slice: 4 hosts, 4 processes, one global
mesh (SURVEY.md §2.2; BASELINE.json:11). Everything in this repo is written
single-controller style — per-process addressable pool shards
(data/pipeline.py CasePool), ``jax.make_array_from_single_device_arrays``
batch assembly, replicated params, orbax collective checkpointing — but a
single-process 8-virtual-device mesh can never execute the
``process_count() > 1`` branches of that machinery (VERDICT round-4
missing #3). This module makes the multi-process path executable anywhere:

* ``launch_workers(n)`` — spawn N localhost worker processes, each with D
  virtual CPU devices, brought up into ONE global mesh via
  ``jax.distributed.initialize`` over a free port (the TPU-native process
  bring-up; no MPI/NCCL — SURVEY.md §2.2 "communication backend").
* ``flagship_workload(...)`` — the canonical validation workload, run
  IDENTICALLY by single-process and multi-process callers so their results
  are directly comparable: a real ``train_stage`` (per-process pools +
  background refresh, on-device sampling/augment, pmean grads, on-mesh
  eval, orbax save), a RESUME of it from the collective checkpoint, and a
  mesh-decomposed cascade predict (``MultichipPredictor``).
* ``python -m brats2019_tpu.parallel.multiprocess`` — the worker entry.

Parity contract (pinned by tests/test_multiprocess.py and the driver's
``dryrun_multichip``): with the same data and seeds, the 2-process × 4-device
run must produce the same losses as the single-process 8-device run (the
train step's RNG keys on (seed, step, data-axis index), so the process
layout is invisible to sampling) and the same predicted cascade mask.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import socket
import subprocess
import sys
from typing import Dict, List, Optional, Sequence

RESULT_TAG = "MPRESULT:"

# env vars that would route a worker's XLA compiles through this
# container's axon remote-compile tunnel (slow, weather-dependent) even
# under JAX_PLATFORMS=cpu — always scrubbed from worker environments
_TUNNEL_VARS = ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE")


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def flagship_workload(
    data_dir: str,
    workdir: str,
    env=None,
    steps_first: int = 2,
    steps_resumed: int = 4,
) -> Dict[str, object]:
    """Train + resume + cascade-predict on the current global mesh.

    Runs on whatever mesh ``env`` (default: all devices) provides — the
    SAME function body serves as the single-process parity oracle and the
    multi-process worker payload. Deterministic by construction: one
    training case (so pool slot contents are identical for every
    process-to-device layout), fixed seeds, fixed-PRNG cascade params.

    Returns a small result dict (floats + the predict mask digest) that
    callers compare across process topologies.
    """
    import jax
    import numpy as np

    from ..configs.presets import (
        ExperimentConfig, InferenceConfig, TrainConfig,
    )
    from ..models.unet3d import UNet3D, UNetConfig
    from ..parallel.mesh import make_mesh
    from ..train.loop import train_stage

    env = env or make_mesh()
    case_dirs = sorted(
        os.path.join(data_dir, d)
        for d in os.listdir(data_dir)
        if os.path.isdir(os.path.join(data_dir, d))
    )
    assert len(case_dirs) >= 2, "flagship_workload needs >=2 cases (train+val)"

    # flagship-scaled topology (same shape family as dryrun_multichip): the
    # production fine net's s2d stem + sub-pixel head at 1/8 width
    cfg = TrainConfig(
        patch=(32, 32, 32),
        pool_shape=(64, 32, 32),
        pool_cases_per_device=1,
        batch_per_device=1,
        steps=steps_first,
        warmup_steps=1,
        log_every=1,
        eval_every=steps_first,
        checkpoint_every=steps_first,
        pool_refresh_every=2,
    )
    ucfg = UNetConfig(levels=4, base_features=8, max_features=40,
                      stem_downsample=2)
    exp = ExperimentConfig(
        name="mp_flagship", unet=ucfg, coarse_unet=None, train=cfg,
        infer=InferenceConfig(canvas=None, tile=(32, 32, 32),
                              tta_flips=False, cascade=False),
        workdir=workdir,
    )
    # ONE training case: every pool slot holds the same content regardless
    # of how the case cursor stripes over processes, so losses are directly
    # comparable across process layouts (the pool-refresh path still runs)
    res_a = train_stage(
        exp, case_dirs[:1], stage="fine", val_dirs=case_dirs[1:2], env=env,
    )
    loss_a = float(res_a.final_metrics.get("loss", float("nan")))

    # resume across all processes from the collective orbax checkpoint
    exp_b = dataclasses.replace(
        exp, train=dataclasses.replace(cfg, steps=steps_resumed)
    )
    res_b = train_stage(
        exp_b, case_dirs[:1], stage="fine", val_dirs=case_dirs[1:2], env=env,
    )
    loss_b = float(res_b.final_metrics.get("loss", float("nan")))

    # mesh-decomposed cascade predict (the flagship inference program) with
    # fixed-PRNG params — identical across topologies by construction
    import jax.numpy as jnp

    from ..data.synthetic import make_case_arrays
    from ..infer.multichip import MultichipPredictor

    cc_ucfg = UNetConfig(levels=2, base_features=4, max_features=8)
    exp_mc = ExperimentConfig(
        name="mp_cascade",
        unet=UNetConfig(levels=2, base_features=4, max_features=8,
                        stem_downsample=2),
        coarse_unet=cc_ucfg,
        train=TrainConfig(pool_shape=(32, 32, 32)),
        infer=InferenceConfig(
            canvas=(32, 32, 32), tile=(16, 16, 16), cascade=True,
            tta_flips=True, roi_shape=(16, 16, 16),
            coarse_shape=(16, 16, 16), min_component_voxels=0,
            et_min_voxels=0,
        ),
        workdir=os.path.join(workdir, "mc"),
    )
    x0 = jnp.zeros((1, 16, 16, 16, 4))
    pf = UNet3D(exp_mc.unet).init(jax.random.PRNGKey(3), x0)
    pc = UNet3D(cc_ucfg).init(jax.random.PRNGKey(4), x0)
    mp = MultichipPredictor(
        exp_mc, pf, mode="cascade", env=env, params_coarse=pc
    )
    img, _ = make_case_arrays(seed=7, shape=(40, 36, 28))
    labels = mp.predict_arrays(img)

    import base64
    import zlib

    return {
        "process_count": int(jax.process_count()),
        "device_count": int(len(env.mesh.devices.reshape(-1))),
        "loss_first": loss_a,
        "loss_resumed": loss_b,
        "mask_sha1": hashlib.sha1(
            np.ascontiguousarray(labels)
        ).hexdigest(),
        "mask_sum": int(labels.sum()),
        "mask_shape": list(labels.shape),
        # full mask (compressed) so callers can quantify any cross-topology
        # delta exactly — cross-PROCESS psum reduction order is not bitwise
        # identical to the single-process collective, so blended-prob
        # argmax ties may flip a handful of voxels
        "mask_b64": base64.b64encode(
            zlib.compress(np.ascontiguousarray(labels).tobytes())
        ).decode(),
    }


def decode_mask(result: Dict[str, object]):
    """Inverse of the ``mask_b64`` field: the uint8 label volume."""
    import base64
    import zlib

    import numpy as np

    return np.frombuffer(
        zlib.decompress(base64.b64decode(result["mask_b64"])), np.uint8
    ).reshape(result["mask_shape"])


def worker_env(devices_per_process: int) -> Dict[str, str]:
    """Environment for a spawned worker: local XLA:CPU compiles (axon
    tunnel scrubbed — its remote compiles take minutes where local takes
    seconds), D virtual CPU devices, the shared persistent compile cache."""
    env = dict(os.environ)
    for v in _TUNNEL_VARS:
        env.pop(v, None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_process}"
    )
    env.setdefault(
        "BRATS2019_TPU_COMPILE_CACHE",
        os.path.expanduser("~/.cache/jax_test_cache"),
    )
    # repo-root import without breaking plugin-free child startup
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env["PYTHONPATH"] = (
        repo + os.pathsep + env["PYTHONPATH"]
        if env.get("PYTHONPATH") else repo
    )
    return env


def launch_workers(
    data_dir: str,
    workdir: str,
    num_processes: int = 2,
    devices_per_process: int = 4,
    timeout: float = 900.0,
    steps_first: int = 2,
    steps_resumed: int = 4,
) -> List[Dict[str, object]]:
    """Spawn ``num_processes`` localhost workers into one global mesh and
    run ``flagship_workload`` on it. Returns the per-process result dicts
    (one per worker, all of which must agree — the workload's outputs are
    replicated). Raises on any worker failure, with that worker's output."""
    port = free_port()
    env = worker_env(devices_per_process)
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m", "brats2019_tpu.parallel.multiprocess",
                "--process-id", str(pid),
                "--num-processes", str(num_processes),
                "--coordinator", f"localhost:{port}",
                "--data-dir", data_dir,
                "--workdir", workdir,
                "--steps-first", str(steps_first),
                "--steps-resumed", str(steps_resumed),
            ],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, text=True,
        )
        for pid in range(num_processes)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    results = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            raise RuntimeError(
                f"multiprocess worker {pid} failed (rc={p.returncode}):\n"
                f"{out[-4000:]}"
            )
        line = next(
            (ln for ln in out.splitlines() if ln.startswith(RESULT_TAG)), None
        )
        if line is None:
            raise RuntimeError(
                f"worker {pid} printed no {RESULT_TAG} line:\n{out[-4000:]}"
            )
        results.append(json.loads(line[len(RESULT_TAG):]))
    return results


def _worker_main(argv: Optional[Sequence[str]] = None) -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--steps-first", type=int, default=2)
    ap.add_argument("--steps-resumed", type=int, default=4)
    args = ap.parse_args(argv)

    import jax

    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    from ..utils.jax_setup import setup_jax

    setup_jax()
    res = flagship_workload(
        args.data_dir, args.workdir,
        steps_first=args.steps_first, steps_resumed=args.steps_resumed,
    )
    print(RESULT_TAG + json.dumps(res), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(_worker_main())
