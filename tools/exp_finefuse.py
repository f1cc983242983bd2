"""Round-3: stage_fine emitting the b8 probs stack costs 103.5 ms, but the
same forward + 8-way mean is 82.4 ms — the probs8 materialization/output
is the tax, not the input layout (tools/exp_roifix.py). So fold the REDUCE
into the fine program using matmul-based unflips (dot producers don't
poison conv layouts the way lax.rev does) and measure.

Variants (all consuming the real stage_roi output):
  a. probs8 out (current stage_fine)            — baseline ~103.5
  b. fused: softmax + matmul-unflip + mean + argmax -> labels out
  c. fused with lax.rev unflips (poisoning check)
  d. softmax + mean only (wrong math; isolates the unflip cost)
Plus bitwise checks of matmul-flip vs jnp.flip on bf16.
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
from brats2019_tpu.infer.tta import FLIPS, flip_volume
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

    # --- bitwise: einsum-rev vs jnp.flip on the bf16 stack
    n = 128
    rev = jnp.asarray(np.eye(n, dtype=np.float32)[::-1].copy(), jnp.bfloat16)
    x = tiles[1]  # some bf16 tile

    def mmflip_d(x):
        return jnp.einsum("ab,bhwc->ahwc", rev, x)

    a = jax.jit(mmflip_d)(x)
    b = jnp.flip(x, 0)
    neq = int(jnp.sum(a != b))
    print(f"einsum-rev vs jnp.flip bf16: {neq} differing elements of {x.size}")
    if neq:
        idx = np.argwhere(np.asarray(a != b))[:3]
        for i in idx:
            print("  at", i, "mm:", np.asarray(a)[tuple(i)], "flip:", np.asarray(b)[tuple(i)])

    # with f32 accumulation forced
    def mmflip_d_pet(x):
        return jax.lax.dot_general(
            rev, x.reshape(n, -1), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16).reshape(x.shape)

    a2 = jax.jit(mmflip_d_pet)(x)
    neq2 = int(jnp.sum(a2 != b))
    print(f"dot_general(pet=f32) vs jnp.flip: {neq2} differing")

    revs = [rev, rev, rev]  # roi is 128^3

    def mm_unflip_f32(p, flags):
        # p: (D,H,W,C) f32; use f32 rev (exact: 0/1 matrix, but TPU f32
        # matmul may run bf16x3 passes -> check bitwise below)
        if flags[0]:
            p = jnp.einsum("ab,bhwc->ahwc", revs[0].astype(jnp.float32), p,
                           precision=jax.lax.Precision.HIGHEST)
        if flags[1]:
            p = jnp.einsum("ab,dbwc->dawc", revs[1].astype(jnp.float32), p,
                           precision=jax.lax.Precision.HIGHEST)
        if flags[2]:
            p = jnp.einsum("ab,dhbc->dhac", revs[2].astype(jnp.float32), p,
                           precision=jax.lax.Precision.HIGHEST)
        return p

    store_dt = jnp.bfloat16

    def fine_fused_mm(params, tiles):
        logits = fine_apply(params, tiles)
        probs8 = jax.nn.softmax(logits.astype(jnp.float32), -1)
        probs8 = probs8.astype(store_dt)  # match shipped bf16 storage
        acc = jnp.zeros(probs8.shape[1:], jnp.float32)
        for i, f in enumerate(FLIPS):
            acc = acc + mm_unflip_f32(probs8[i].astype(jnp.float32), f)
        probs = acc * (1.0 / len(FLIPS))
        return jnp.argmax(probs, -1).astype(jnp.uint8)

    def fine_fused_rev(params, tiles):
        logits = fine_apply(params, tiles)
        probs8 = jax.nn.softmax(logits.astype(jnp.float32), -1)
        probs8 = probs8.astype(store_dt)
        acc = jnp.zeros(probs8.shape[1:], jnp.float32)
        for i, f in enumerate(FLIPS):
            acc = acc + flip_volume(probs8[i], f).astype(jnp.float32)
        probs = acc * (1.0 / len(FLIPS))
        return jnp.argmax(probs, -1).astype(jnp.uint8)

    def fine_meanonly(params, tiles):
        logits = fine_apply(params, tiles)
        probs8 = jax.nn.softmax(logits.astype(jnp.float32), -1)
        return jnp.argmax(jnp.mean(probs8, 0), -1).astype(jnp.uint8)

    j_mm = jax.jit(fine_fused_mm)
    j_rev = jax.jit(fine_fused_rev)
    j_mean = jax.jit(fine_meanonly)

    print(f"a. probs8 out (current):      {timed(j_fine, params_f, tiles)*1e3:6.1f} ms")
    print(f"b. fused matmul-unflip:       {timed(j_mm, params_f, tiles)*1e3:6.1f} ms")
    print(f"c. fused lax.rev-unflip:      {timed(j_rev, params_f, tiles)*1e3:6.1f} ms")
    print(f"d. softmax+mean only:         {timed(j_mean, params_f, tiles)*1e3:6.1f} ms")

    # exactness: fused paths vs the shipped reduce
    lab_ref, _ = j_reduce(j_fine(params_f, tiles), start)
    lab_mm = j_mm(params_f, tiles)
    lab_rev = j_rev(params_f, tiles)
    print("rev-fused == shipped:", bool(jnp.all(lab_rev == lab_ref)),
          f"(agree {float(jnp.mean(lab_rev == lab_ref)):.6f})")
    print("mm-fused  == shipped:", bool(jnp.all(lab_mm == lab_ref)),
          f"(agree {float(jnp.mean(lab_mm == lab_ref)):.6f})")


if __name__ == "__main__":
    main()
