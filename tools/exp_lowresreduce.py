"""Round-3: the 20 ms unflip-reduce tax is VPU inefficiency on (...,4)-minor
full-res tensors (tools/exp_finefuse.py: mean-only 84.5 vs any unflip
variant ~104). Run softmax + unflip + mean + argmax at LOW RES on the
pre-d2s head output (32-channel minor, 1/8 spatial): exact by d2s
permutation algebra (full-res flip = low-res flip + block-bit swap).

Measures the merged fine+reduce program and checks bitwise equality with
the shipped 3-stage chain.
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
from brats2019_tpu.infer.tta import FLIPS
from brats2019_tpu.models import UNet3D
from brats2019_tpu.models.cascade import make_predict_fn


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
    tiles, start = j_roi(params_c, image)

    r = exp.unet.stem_downsample
    K = exp.unet.num_classes
    store_dt = jnp.bfloat16

    def finish_lowres(params, tiles, start):
        # logits_lr: (8, D/r, H/r, W/r, K*r^3), f32
        logits_lr = fine_model.apply(params, tiles, subpixel=False)
        b, d, h, w, _ = logits_lr.shape
        g = logits_lr.reshape(b, d, h, w, r, r, r, K)
        # groupwise softmax over K == softmax of the d2s'd logits per voxel
        p = jax.nn.softmax(g.astype(jnp.float32), -1)
        p = p.astype(store_dt)  # match the shipped bf16 prob storage
        # unflip at low res: full-res flip_f == low-res flip over (d,h,w)
        # AND the matching block axes (r=2 bit swap)
        acc = jnp.zeros(p.shape[1:], jnp.float32)
        for i, f in enumerate(FLIPS):
            q = p[i]
            axes = []
            if f[0]:
                axes += [0, 3]
            if f[1]:
                axes += [1, 4]
            if f[2]:
                axes += [2, 5]
            if axes:
                q = jnp.flip(q, axes)
            acc = acc + q.astype(jnp.float32)
        probs = acc * (1.0 / len(FLIPS))          # (d,h,w,r,r,r,K)
        blk = jnp.argmax(probs, -1).astype(jnp.uint8)  # (d,h,w,r,r,r)
        labels = blk.transpose(0, 3, 1, 4, 2, 5).reshape(d * r, h * r, w * r)
        return labels, start

    j_finish = jax.jit(finish_lowres)

    t = timed(j_finish, params_f, tiles, start)
    print(f"merged fine+lowres-reduce: {t*1e3:6.1f} ms")
    t_fine = timed(j_fine, params_f, tiles)
    print(f"(current stage_fine alone: {t_fine*1e3:6.1f} ms + reduce)")

    def chain_new(pf, pc, img):
        tiles, start = j_roi(pc, img)
        return j_finish(pf, tiles, start)

    t_old = timed(predict_split, params_f, params_c, image)
    t_new = timed(chain_new, params_f, params_c, image)
    print(f"full predict old: {t_old*1e3:6.1f} ms | new: {t_new*1e3:6.1f} ms")

    lab_ref, s_ref = predict_split(params_f, params_c, image)
    lab_new, s_new = chain_new(params_f, params_c, image)
    print("labels bitwise equal:", bool(jnp.all(lab_ref == lab_new)),
          f"(agree {float(jnp.mean(lab_ref == lab_new)):.6f})")


if __name__ == "__main__":
    main()
