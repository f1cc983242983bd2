"""Headline benchmark: whole MRI volumes/sec (preproc + inference)
(BASELINE.json:2; north-star = >=5x the reference CPU pipeline).

Measures the full predict path on one chip: host preproc (strided exact
brain bbox + fused crop/cast/fit), host->device transfer, and the single
jitted cascade + sliding-window + 8-flip-TTA program, on synthetic
full-size BraTS volumes (240x240x155x4 — no real data on this machine).

Robust methodology (VERDICT round-1 weak #1 — the official number must be
what the driver measures, not what a tuned session once saw):

* warm BOTH serving paths (serial predict_arrays and the pipelined
  predict_arrays_many) before timing, on top of the persistent compile cache
* e2e throughput = the MEDIAN of several pipelined batches (the axon tunnel
  has multi-x run-to-run weather; a single window is not a number)
* the device-program time is measured separately by deep async dispatch
  (k programs in flight, one tiny fetch at the end — `block_until_ready`
  is unreliable over this tunnel) and reported alongside e2e, with
  analytic model FLOPs -> MFU (utils/flops.py)

``vs_baseline`` compares e2e against the reproduced reference CPU pipeline
measured once on this host (tools/measure_cpu_baseline.py ->
BASELINE_LOCAL.json); falls back to 1.0 when no local baseline exists.

Prints ONE json line; "value" is the median e2e volumes/sec.
"""

from __future__ import annotations

import json
import os
import statistics
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
    from brats2019_tpu.utils.flops import mfu, predict_program_flops

    n_iters = int(os.environ.get("BENCH_ITERS", "10"))
    n_batches = int(os.environ.get("BENCH_BATCHES", "3"))
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
        make_case_arrays(seed=i, shape=(240, 240, 155))[0] for i in range(4)
    ]

    log("bench: warmup/compile (serial path) ...")
    for i in range(2):
        labels, stats = predictor.predict_arrays(cases[i % len(cases)])
        log(f"  warmup {i}: device={stats.device_s:.3f}s total={stats.total_s:.3f}s")
    log("bench: warmup (pipelined path) ...")
    t0 = time.time()
    predictor.predict_arrays_many([cases[i % len(cases)] for i in range(3)])
    log(f"  pipelined warmup: {time.time() - t0:.2f}s for 3")

    # --- device-program time: deep async dispatch, one tiny terminal fetch
    log("bench: device-program timing (async dispatch slope) ...")
    xs = [
        predictor._prep_to(cases[i % len(cases)], predictor._default_dev)[0]
        for i in range(4)
    ]

    def run_k(k):
        t0 = time.time()
        outs = [
            predictor._fn(
                predictor.params_fine, predictor.params_coarse, xs[i % len(xs)]
            )
            for i in range(k)
        ]
        np.asarray(jax.device_get(outs[-1][1]))  # forces the whole stream
        return time.time() - t0

    run_k(2)  # warm the path
    w_lo, w_hi = run_k(5), run_k(15)
    device_s_per_vol = max((w_hi - w_lo) / 10.0, 1e-6)
    flops = predict_program_flops(exp, predictor.canvas)
    device_mfu = mfu(flops, device_s_per_vol, jax.devices()[0])
    log(
        f"  device program: {device_s_per_vol * 1000:.1f} ms/vol "
        f"({1.0 / device_s_per_vol:.2f} vol/s, {flops / 1e12:.2f} TFLOP, "
        f"MFU={device_mfu * 100:.1f}%" if device_mfu is not None
        else f"  device program: {device_s_per_vol * 1000:.1f} ms/vol"
    )

    # --- e2e pipelined serving: median over batches
    log(f"bench: e2e timing ({n_batches} batches x {n_iters} volumes) ...")
    batch_vps = []
    for b in range(n_batches):
        stream = [cases[i % len(cases)] for i in range(n_iters)]
        t0 = time.time()
        results = predictor.predict_arrays_many(stream)
        wall = time.time() - t0
        assert len(results) == n_iters and all(
            r.shape == (240, 240, 155) for r in results
        )
        batch_vps.append(n_iters / wall)
        log(f"  batch {b}: {batch_vps[-1]:.4f} vol/s (wall {wall:.2f}s)")
    vps = statistics.median(batch_vps)
    log(f"bench: median e2e {vps:.4f} volumes/sec over {n_batches} batches")

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
                "e2e_batches": [round(v, 4) for v in batch_vps],
                "device_ms_per_vol": round(device_s_per_vol * 1000, 2),
                "device_volumes_per_sec": round(1.0 / device_s_per_vol, 3),
                "predict_program_tflop": round(flops / 1e12, 3),
                "device_mfu": round(device_mfu, 4) if device_mfu else None,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
