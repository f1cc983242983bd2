"""Round-4 measurement for VERDICT r3 #5: predict/serve payload cache.

Train's pool refresh got a 64x prep cache in round 3; serve/predict kept
re-decoding every arrival from gzip NIfTI. This measures the two new
serving-path caches on the real chip at flagship scale (240x240x155,
``cascade`` preset):

  stage 1 (disk cache, case-dir path): predict_dir prep wall per case —
          uncached vs cold-cache (miss+store) vs warm-cache hit. The hit
          skips gzip inflate + brain-bbox scan + crop/cast/quantize;
          only the 348-byte header read and the host->device transfer
          remain.
  stage 2 (in-memory memo, array path): predict_arrays_many e2e vol/s on
          the bench's own repeated 4-case stream, memo on vs off — the
          driver-visible number (bench.py ships the memo on by default).

Results -> PERF.md "predict/serve payload cache" (round 4).
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import shutil
import statistics
import tempfile
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from brats2019_tpu.configs import get_preset
from brats2019_tpu.data.synthetic import make_case_arrays, write_case
from brats2019_tpu.infer.predictor import Predictor
from brats2019_tpu.models import UNet3D


def log(*a):
    print(*a, file=_sys.stderr, flush=True)


def init_params(cfg, seed):
    model = UNet3D(cfg)
    return model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 16, 16, 16, 4)))


def make_predictor(exp):
    pf = init_params(exp.unet, 0)
    pc = init_params(exp.coarse_unet, 1) if exp.coarse_unet is not None else None
    return Predictor(exp, pf, pc)


def stage1_disk(tmp, n_hits=6):
    log("== stage 1: disk payload cache (predict_dir prep wall, ms/case)")
    case_dir = _os.path.join(tmp, "BraTS19_EXP_000_1")
    write_case(case_dir, seed=0, shape=(240, 240, 155), with_seg=False)
    cache = _os.path.join(tmp, "pcache")

    exp = get_preset("cascade")
    pred = make_predictor(exp)
    out = _os.path.join(tmp, "pred.nii.gz")
    pred.predict_dir(case_dir, out)  # compile + warm page cache

    def prep_ms():
        t0 = time.time()
        pred._prep_dir_to(case_dir, pred._default_dev)
        return (time.time() - t0) * 1e3

    uncached = [prep_ms() for _ in range(4)]
    pred.exp = dataclasses.replace(
        exp, infer=dataclasses.replace(exp.infer, prep_cache_dir=cache)
    )
    cold = prep_ms()  # miss + store
    hits = [prep_ms() for _ in range(n_hits)]
    entry = _os.listdir(cache)[0]
    size_mb = _os.path.getsize(_os.path.join(cache, entry)) / 1e6
    log(f"  uncached: {statistics.median(uncached):.1f} ms/case "
        f"(runs: {[f'{v:.0f}' for v in uncached]})")
    log(f"  cold (miss+store): {cold:.1f} ms")
    log(f"  warm hit: {statistics.median(hits):.1f} ms/case "
        f"(runs: {[f'{v:.1f}' for v in hits]}); entry {entry} {size_mb:.1f} MB")
    return statistics.median(uncached), statistics.median(hits)


def stage2_memo(n_iters=10, n_batches=3):
    log("== stage 2: in-memory payload memo (bench repeated-case e2e stream)")
    cases = [make_case_arrays(seed=i, shape=(240, 240, 155))[0] for i in range(4)]
    out = {}
    for memo in (0, 8):
        exp = get_preset("cascade")
        exp = dataclasses.replace(
            exp, infer=dataclasses.replace(exp.infer, payload_memo_volumes=memo)
        )
        pred = make_predictor(exp)
        pred.predict_arrays_many([cases[i % 4] for i in range(3)])  # warm
        vps = []
        for b in range(n_batches):
            t0 = time.time()
            res = pred.predict_arrays_many([cases[i % 4] for i in range(n_iters)])
            wall = time.time() - t0
            assert len(res) == n_iters
            vps.append(n_iters / wall)
            log(f"  memo={memo} batch {b}: {vps[-1]:.4f} vol/s (wall {wall:.2f}s)")
        out[memo] = statistics.median(vps)
        log(f"  memo={memo}: median {out[memo]:.4f} vol/s")
    log(f"  memo speedup on the repeated stream: {out[8] / out[0]:.3f}x")
    return out


def main():
    log(f"devices: {jax.devices()}")
    tmp = tempfile.mkdtemp(prefix="exp_payload_")
    try:
        stage1_disk(tmp)
        stage2_memo()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
