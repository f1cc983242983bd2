"""Round-3: re-measure the paired-volume (b16 fine) device throughput on
the NEW merged low-res-reduce path (VERDICT #6 done-bar: ~+13% device
throughput for co-located serving)."""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from brats2019_tpu.configs import get_preset
from brats2019_tpu.data.synthetic import make_case_arrays
from brats2019_tpu.infer.predictor import Predictor
from brats2019_tpu.models import UNet3D


def main():
    exp = get_preset("inference")

    def init_params(cfg, seed):
        return UNet3D(cfg).init(jax.random.PRNGKey(seed),
                                jnp.zeros((1, 16, 16, 16, 4)))

    pred = Predictor(exp, init_params(exp.unet, 0),
                     init_params(exp.coarse_unet, 1))
    j_roi, j_finish = pred._fn.stages
    fine_pair = pred._fn.fine_pair
    pf, pc = pred.params_fine, pred.params_coarse

    imgs = [make_case_arrays(seed=i, shape=(240, 240, 155))[0] for i in range(2)]
    xs = [pred._prep_to(im, pred._default_dev)[0] for im in imgs]
    rois = [j_roi(pc, x) for x in xs]
    for t, s in rois:
        t.block_until_ready()

    def run_single(k):
        t0 = time.time()
        out = None
        for i in range(k):
            t, s = rois[i % 2]
            out = j_finish(pf, t, s)
        np.asarray(jax.device_get(out[0].ravel()[0]))
        return time.time() - t0

    def run_paired(k):  # k pair-dispatches = 2k volumes
        t0 = time.time()
        out = None
        for i in range(k):
            (ta, sa), (tb, sb) = rois
            out = fine_pair(pf, ta, tb, sa, sb)
        np.asarray(jax.device_get(out[0].ravel()[0]))
        return time.time() - t0

    run_single(2), run_paired(2)
    for name, fn, vols in [("single b8", run_single, 1),
                           ("paired b16", run_paired, 2)]:
        ts = []
        for _ in range(4):
            lo, hi = fn(5), fn(15)
            ts.append((hi - lo) / 10.0)
        t = sorted(ts)[len(ts) // 2]
        print(f"{name}: {t*1e3:6.1f} ms/dispatch = "
              f"{t*1e3/vols:6.1f} ms/volume ({vols/t:5.2f} vol/s)")


if __name__ == "__main__":
    main()
