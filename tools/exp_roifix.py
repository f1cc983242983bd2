"""Round-3: the real stage_roi's output layout makes stage_fine run 103 ms
vs 82 ms from a cleanly-laid producer (tools/exp_groupconv.py). Try a
stage_roi whose flip-stack is built from reversal-matrix einsums (bitwise-
equal to jnp.flip for 0/1 matrices in bf16) — no lax.rev anywhere in the
producer program — and measure formats + consumer time + full chain.
"""

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
from brats2019_tpu.data.preprocess import centered_crop_start, mask_bbox_center, zscore
from brats2019_tpu.infer.tta import FLIPS
from brats2019_tpu.models import UNet3D
from brats2019_tpu.models.cascade import make_predict_fn
from brats2019_tpu.ops.resize import resize_trilinear


def timed(fn, *args, reps=4, lo=5, hi=15):
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


def main():
    exp = get_preset("inference")
    cfg = exp.infer
    canvas = tuple(cfg.canvas)
    fine_model = UNet3D(exp.unet)
    coarse_model = UNet3D(exp.coarse_unet)
    fine_apply = lambda p, x: fine_model.apply(p, x)
    coarse_apply = lambda p, x: coarse_model.apply(p, x)
    params_f = fine_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 4)))
    params_c = coarse_model.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 16, 4)))

    predict_split = make_predict_fn(fine_apply, cfg, canvas,
                                    coarse_apply=coarse_apply)
    from _legacy_stages import legacy_stages  # pre-12c9fc8 3-stage shim
    j_roi, j_fine, j_reduce = legacy_stages(predict_split, fine_apply)

    image = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), canvas + (4,),
                                      jnp.float32))

    roi = tuple(min(r, c) for r, c in zip(cfg.roi_shape, canvas))
    revs = [
        jnp.asarray(np.eye(n, dtype=np.float32)[::-1].copy(), jnp.bfloat16)
        for n in roi
    ]

    def mm_flip(x, flags):
        if flags[0]:
            x = jnp.einsum("ab,bhwc->ahwc", revs[0], x)
        if flags[1]:
            x = jnp.einsum("ab,dbwc->dawc", revs[1], x)
        if flags[2]:
            x = jnp.einsum("ab,dhbc->dhac", revs[2], x)
        return x

    def stage_roi_mm(params_coarse, image):
        image = zscore(image.astype(jnp.float32))
        coarse_in = resize_trilinear(image, cfg.coarse_shape)
        logits_c = coarse_apply(params_coarse, coarse_in[None])[0]
        tumor = jnp.argmax(logits_c, axis=-1) > 0
        center_c = mask_bbox_center(tumor)
        scale = jnp.array(
            [c / s for c, s in zip(canvas, cfg.coarse_shape)], jnp.float32
        )
        center = (center_c.astype(jnp.float32) * scale).astype(jnp.int32)
        start = centered_crop_start(center, roi, canvas)
        o = (start[0], start[1], start[2], jnp.int32(0))
        region = jax.lax.dynamic_slice(image, o, roi + (image.shape[-1],))
        region = region.astype(jnp.bfloat16)
        tiles = jnp.stack([mm_flip(region, f) for f in FLIPS])
        return tiles, start

    j_roi_mm = jax.jit(stage_roi_mm)

    tiles_a, start_a = j_roi(params_c, image)
    tiles_b, start_b = j_roi_mm(params_c, image)
    print("rev-roi output format:", tiles_a.format.layout)
    print("mm-roi  output format:", tiles_b.format.layout)
    same_stack = bool(jnp.all(tiles_a == tiles_b))
    print("stacks bitwise equal:", same_stack)

    t_roi_a = timed(j_roi, params_c, image)
    t_roi_b = timed(j_roi_mm, params_c, image)
    print(f"stage_roi rev: {t_roi_a*1e3:6.1f} ms | mm: {t_roi_b*1e3:6.1f} ms")

    t_fine_a = timed(j_fine, params_f, tiles_a)
    t_fine_b = timed(j_fine, params_f, tiles_b)
    print(f"stage_fine from rev-roi: {t_fine_a*1e3:6.1f} ms | from mm-roi: {t_fine_b*1e3:6.1f} ms")

    def chain_mm(pf, pc, img):
        tiles, start = j_roi_mm(pc, img)
        probs8 = j_fine(pf, tiles)
        return j_reduce(probs8, start)

    t_chain_old = timed(predict_split, params_f, params_c, image)
    t_chain_new = timed(chain_mm, params_f, params_c, image)
    print(f"full chain rev: {t_chain_old*1e3:6.1f} ms | mm: {t_chain_new*1e3:6.1f} ms")

    lab_a, s_a = predict_split(params_f, params_c, image)
    lab_b, s_b = chain_mm(params_f, params_c, image)
    print("labels identical:", bool(jnp.all(lab_a == lab_b)),
          "start identical:", bool(jnp.all(s_a == s_b)))


if __name__ == "__main__":
    main()
