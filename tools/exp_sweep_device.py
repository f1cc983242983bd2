"""Round-3 session-7 device A/B: the staged multi-tile TTA sweep vs the
monolithic sweep (VERDICT round-2 #4's measurement bar — exactness was
tested on the CPU mesh in an earlier session; this records the per-tile
device time on the real chip), plus the shipped paired-volume stage-B
path (--batch-volumes 2) vs two single b8 programs.

Timing: async-dispatch slope (k programs in flight, one tiny terminal
fetch), median of several slopes — per PERF.md "Tunnel variance",
block_until_ready returns early over the axon tunnel.
"""

from __future__ import annotations

import dataclasses
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
from brats2019_tpu.infer.tiling import tile_origins
from brats2019_tpu.models import UNet3D
from brats2019_tpu.models.cascade import make_predict_fn


def timed(fn, *args, reps=3, lo=3, hi=9):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)

    def run_k(k):
        t0 = time.time()
        for _ in range(k):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[0]))
        return time.time() - t0

    run_k(2)
    ts = sorted((run_k(hi) - run_k(lo)) / (hi - lo) for _ in range(reps))
    return ts[len(ts) // 2]


def build(exp, cfg):
    fine_model = UNet3D(exp.unet)
    coarse_model = UNet3D(exp.coarse_unet)
    fine_apply = lambda p, x: fine_model.apply(p, x)
    coarse_apply = lambda p, x: coarse_model.apply(p, x)
    fine_lowres = (
        (lambda p, x: fine_model.apply(p, x, subpixel=False))
        if exp.unet.stem_downsample > 1
        else None
    )
    canvas = tuple(cfg.canvas)

    def mk(allow_split):
        return make_predict_fn(
            fine_apply,
            cfg,
            canvas,
            coarse_apply=coarse_apply,
            allow_split=allow_split,
            fine_lowres_apply=fine_lowres,
            stem=exp.unet.stem_downsample,
        )

    return mk


def main():
    print(f"devices: {jax.devices()}", flush=True)
    exp = get_preset("inference")
    base = exp.infer
    canvas = tuple(base.canvas)

    fine_model = UNet3D(exp.unet)
    coarse_model = UNet3D(exp.coarse_unet)
    params_f = fine_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 4)))
    params_c = coarse_model.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 16, 4)))
    params_f = jax.device_put(params_f)
    params_c = jax.device_put(params_c)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=canvas + (4,)).astype(np.float32))
    img = jax.device_put(img)

    results = {}

    # --- A: config-4 general form, no cascade: whole-canvas sweep -------
    cfg_a = dataclasses.replace(base, cascade=False, postproc="host")
    t_a = len(tile_origins(canvas, tuple(cfg_a.tile), cfg_a.overlap))
    mk = build(exp, cfg_a)
    for name, allow in (("staged", True), ("monolithic", False)):
        print(f"compile+run A/{name} (T={t_a}) ...", flush=True)
        fn = mk(allow)
        t = timed(fn, params_f, None, img)
        results[f"A_{name}_ms"] = t * 1e3
        results[f"A_{name}_ms_per_tile"] = t * 1e3 / t_a
        print(f"  {name}: {t*1e3:.1f} ms total, {t*1e3/t_a:.1f} ms/tile", flush=True)

    # --- B: cascade with ROI > tile ------------------------------------
    cfg_b = dataclasses.replace(
        base, roi_shape=(160, 160, 128), postproc="host"
    )
    roi = tuple(min(r, c) for r, c in zip(cfg_b.roi_shape, canvas))
    t_b = len(tile_origins(roi, tuple(cfg_b.tile), cfg_b.overlap))
    mk = build(exp, cfg_b)
    for name, allow in (("staged", True), ("monolithic", False)):
        print(f"compile+run B/{name} (T={t_b}) ...", flush=True)
        fn = mk(allow)
        t = timed(fn, params_f, params_c, img)
        results[f"B_{name}_ms"] = t * 1e3
        results[f"B_{name}_ms_per_tile"] = t * 1e3 / t_b
        print(f"  {name}: {t*1e3:.1f} ms total, {t*1e3/t_b:.1f} ms/tile", flush=True)

    # --- C: shipped split single-tile path (context) + paired stage-B --
    cfg_c = dataclasses.replace(base, postproc="host")
    mk = build(exp, cfg_c)
    fn_split = mk(True)
    print("compile+run C/split single-tile ...", flush=True)
    t = timed(fn_split, params_f, params_c, img)
    results["C_split_ms"] = t * 1e3
    print(f"  split single-tile: {t*1e3:.1f} ms/vol", flush=True)

    stages = getattr(fn_split, "stages", None)
    pair = getattr(fn_split, "fine_pair", None)
    if stages is not None and pair is not None:
        stage_roi, stage_finish = stages[0], stages[1]
        tiles, start = stage_roi(params_c, img)
        tiles = jax.device_put(tiles)
        print("compile+run C/paired fine (b16) ...", flush=True)

        def run_pair():
            return pair(params_f, tiles, tiles, start, start)

        t1 = timed(lambda *a: stage_finish(params_f, tiles, start))
        t2 = timed(lambda *a: run_pair())
        results["C_fine_b8_ms"] = t1 * 1e3
        results["C_fine_pair_b16_ms"] = t2 * 1e3
        results["C_fine_pair_ms_per_vol"] = t2 * 1e3 / 2
        print(
            f"  fine b8: {t1*1e3:.1f} ms/vol | paired b16: {t2*1e3:.1f} ms "
            f"= {t2*1e3/2:.1f} ms/vol ({(1 - t2/2/t1)*100:+.1f}% per-vol)",
            flush=True,
        )

    print({k: round(v, 2) for k, v in results.items()})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
