"""Isolate TPU lowering efficiency for the candidate weight-flip TTA forms.

a) plain b8 batched conv (the floor's building block)
b) feature_group_count=8 conv, channels x8 (grouped weight-flip form)
c) b8 conv consuming a MATERIALIZED input from a producer jit program
   (the split-path floor: what any two-program structure must pay)
d) matmul-based flip-stack producer (reversal matrices; no lax.rev
   anywhere) + b8 conv consumer
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed(fn, *args, reps=4, lo=5, hi=15):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)

    def run_k(k):
        t0 = time.time()
        for _ in range(k):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[-1]
        np.asarray(jax.device_get(leaf.ravel()[0]))
        return time.time() - t0

    run_k(2)
    ts = sorted((run_k(hi) - run_k(lo)) / (hi - lo) for _ in range(reps))
    return ts[len(ts) // 2]


def main():
    dims = ("NDHWC", "DHWIO", "NDHWC")
    S, CI, CO = 64, 32, 64
    key = jax.random.PRNGKey(0)
    x8 = jax.random.normal(key, (8, S, S, S, CI), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, 3, CI, CO), jnp.bfloat16)
    xg = x8.transpose(1, 2, 3, 0, 4).reshape(1, S, S, S, 8 * CI)
    wg = jax.random.normal(key, (3, 3, 3, CI, 8 * CO), jnp.bfloat16)

    @jax.jit
    def conv_b8(x, w):
        return lax.conv_general_dilated(x, w, (1, 1, 1), "SAME",
                                        dimension_numbers=dims)

    @jax.jit
    def conv_grouped(x, w):
        return lax.conv_general_dilated(x, w, (1, 1, 1), "SAME",
                                        dimension_numbers=dims,
                                        feature_group_count=8)

    t_b8 = timed(conv_b8, x8, w)
    t_g = timed(conv_grouped, xg, wg)
    print(f"b8 batched conv {S}^3 {CI}->{CO}: {t_b8*1e3:.2f} ms")
    print(f"grouped fgc=8 conv {S}^3 {8*CI}->{8*CO}: {t_g*1e3:.2f} ms")

    # deep-level shapes (8^3 x 320) where b1 starves
    S2, C2 = 8, 320
    x8d = jax.random.normal(key, (8, S2, S2, S2, C2), jnp.bfloat16)
    wd = jax.random.normal(key, (3, 3, 3, C2, C2), jnp.bfloat16)
    xgd = x8d.transpose(1, 2, 3, 0, 4).reshape(1, S2, S2, S2, 8 * C2)
    wgd = jax.random.normal(key, (3, 3, 3, C2, 8 * C2), jnp.bfloat16)
    print(f"b8 batched deep conv: {timed(conv_b8, x8d, wd)*1e3:.2f} ms")
    print(f"grouped fgc=8 deep conv: {timed(conv_grouped, xgd, wgd)*1e3:.2f} ms")

    # --- (c) split-path floor: full fine forward from materialized input
    from brats2019_tpu.configs import get_preset
    from brats2019_tpu.models import UNet3D

    exp = get_preset("inference")
    model = UNet3D(exp.unet)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 4)))
    tile = jax.random.normal(key, (128, 128, 128, 4), jnp.bfloat16)

    @jax.jit
    def fine(params, tiles):
        logits = model.apply(params, tiles)
        p = jax.nn.softmax(logits.astype(jnp.float32), -1)
        return jnp.mean(p, 0).astype(jnp.bfloat16)

    @jax.jit
    def producer_identity(t):
        return jnp.broadcast_to(t[None], (8,) + t.shape) * jnp.bfloat16(1.0) + jnp.bfloat16(0.0)

    @jax.jit
    def fine_internal(params, t):
        tiles = jnp.broadcast_to(t[None], (8,) + t.shape)
        logits = model.apply(params, tiles)
        p = jax.nn.softmax(logits.astype(jnp.float32), -1)
        return jnp.mean(p, 0).astype(jnp.bfloat16)

    t_int = timed(fine_internal, params, tile)
    print(f"fine b8, internal broadcast (floor): {t_int*1e3:.1f} ms")

    stacked = producer_identity(tile)
    stacked.block_until_ready()
    t_ext = timed(fine, params, stacked)
    print(f"fine b8, materialized identity-producer input: {t_ext*1e3:.1f} ms")
    print(f"  producer output format: {stacked.format}")

    # current real producer (tta_stack with lax.rev + barrier)
    from brats2019_tpu.infer.tta import tta_stack

    @jax.jit
    def producer_rev(t):
        return tta_stack(t, "bfloat16")

    stacked_rev = producer_rev(tile)
    stacked_rev.block_until_ready()
    t_rev = timed(fine, params, stacked_rev)
    print(f"fine b8, lax.rev-producer input (current): {t_rev*1e3:.1f} ms")
    print(f"  producer output format: {stacked_rev.format}")

    # --- (d) matmul-based flip stack (anti-diagonal permutation matrices)
    n = 128
    rev = jnp.asarray(np.eye(n, dtype=np.float32)[::-1], jnp.bfloat16)

    @jax.jit
    def producer_matmul(t):
        t = t.astype(jnp.bfloat16)
        fd = jnp.einsum("ab,bhwc->ahwc", rev, t)
        outs = []
        for flags in [(a, b, c) for a in (0, 1) for b in (0, 1) for c in (0, 1)]:
            z = fd if flags[0] else t
            if flags[1]:
                z = jnp.einsum("ab,dbwc->dawc", rev, z)
            if flags[2]:
                z = jnp.einsum("ab,dhbc->dhac", rev, z)
            outs.append(z)
        return jnp.stack(outs)

    stacked_mm = producer_matmul(tile)
    stacked_mm.block_until_ready()
    ok = bool(jnp.all(stacked_mm == stacked_rev))
    t_mm_prod = timed(producer_matmul, tile)
    t_mm = timed(fine, params, stacked_mm)
    print(f"matmul flip-stack producer: {t_mm_prod*1e3:.2f} ms, equals rev stack: {ok}")
    print(f"fine b8, matmul-producer input: {t_mm*1e3:.1f} ms")
    print(f"  producer output format: {stacked_mm.format}")


if __name__ == "__main__":
    main()
