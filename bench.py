"""Headline benchmark: whole MRI volumes/sec (preproc + inference)
(BASELINE.json:2; north-star = >=5x the reference CPU pipeline).

Measures the full predict path on one chip: host NIfTI-free preproc (bbox
crop + canvas fit), host->device transfer, and the single jitted cascade +
sliding-window + 8-flip-TTA program, on synthetic full-size BraTS volumes
(240x240x155x4 — no real data on this machine).

``vs_baseline`` compares against the reproduced reference CPU pipeline
measured once on this host (tools/measure_cpu_baseline.py ->
BASELINE_LOCAL.json); falls back to 1.0 when no local baseline exists.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    import jax

    # persistent compile cache: the cascade+TTA program takes minutes to
    # compile over the remote-compile tunnel; cache across bench runs
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from brats2019_tpu.configs import get_preset
    from brats2019_tpu.data.synthetic import make_case_arrays
    from brats2019_tpu.infer.predictor import Predictor
    from brats2019_tpu.models import UNet3D

    n_warmup = int(os.environ.get("BENCH_WARMUP", "2"))
    n_iters = int(os.environ.get("BENCH_ITERS", "10"))
    preset = os.environ.get("BENCH_PRESET", "inference")

    log(f"bench: devices={jax.devices()} preset={preset}")
    exp = get_preset(preset)

    # throughput is independent of training state: random-init params
    def init_params(cfg, seed):
        model = UNet3D(cfg)
        return model.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, 16, 16, 16, 4))
        )

    params_fine = init_params(exp.unet, 0)
    params_coarse = (
        init_params(exp.coarse_unet, 1) if exp.coarse_unet is not None else None
    )
    predictor = Predictor(exp, params_fine, params_coarse)

    # distinct synthetic cases so host preproc isn't trivially cached
    log("bench: generating synthetic cases ...")
    cases = [
        make_case_arrays(seed=i, shape=(240, 240, 155))[0]
        for i in range(max(2, min(n_iters, 4)))
    ]

    log("bench: warmup/compile ...")
    for i in range(n_warmup):
        labels, stats = predictor.predict_arrays(cases[i % len(cases)])
        log(f"  warmup {i}: device={stats.device_s:.3f}s total={stats.total_s:.3f}s")

    log("bench: timing (pipelined serving path) ...")
    stream = [cases[i % len(cases)] for i in range(n_iters)]
    t0 = time.time()
    results = predictor.predict_arrays_many(stream)
    wall = time.time() - t0
    assert len(results) == n_iters and all(r.shape == (240, 240, 155) for r in results)
    vps = n_iters / wall
    log(f"bench: {vps:.4f} volumes/sec (wall {wall:.2f}s for {n_iters})")

    baseline_path = os.path.join(os.path.dirname(__file__), "BASELINE_LOCAL.json")
    vs = 1.0
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        ref = base.get("reference_cpu_volumes_per_sec")
        if ref:
            vs = vps / ref
    print(
        json.dumps(
            {
                "metric": "whole_volumes_per_sec",
                "value": round(vps, 5),
                "unit": "volumes/sec/chip (preproc+infer, cascade+8xTTA)",
                "vs_baseline": round(vs, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
