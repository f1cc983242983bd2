"""Round-3 CC rework candidates: the pointer-jump gather is ~15 ms/iter
(tools/exp_cc.py) while the 27-tap maxpool is 0.25 ms/iter. Compare:

  A. current (pool + jump each iter, while_loop)          ~106 ms
  B. pool-only while_loop (O(diameter) cheap iterations)
  C. pool-only with a jump every 8th iteration (snake insurance)

on the realistic blob+specks mask AND a worst-case spiral snake, with
exact equality of the resulting filter decisions vs scipy.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import time
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from brats2019_tpu.ops.connected_components import (
    _maxpool3, component_sizes, label_components,
)
from tools.exp_cc import make_mask, timed


@partial(jax.jit, static_argnames=("max_iters",))
def label_pool_only(fg, max_iters=384):
    d, h, w = fg.shape
    seeds = (jnp.arange(d * h * w, dtype=jnp.int32) + 1).reshape(d, h, w)
    labels = jnp.where(fg, seeds, 0)

    def cond(s):
        return s[1] & (s[2] < max_iters)

    def body(s):
        labels, _, it = s
        new = jnp.where(fg, _maxpool3(labels), 0)
        return new, jnp.any(new != labels), it + 1

    labels, _, it = jax.lax.while_loop(cond, body, (labels, jnp.bool_(True), jnp.int32(0)))
    return labels, it


@partial(jax.jit, static_argnames=("max_iters", "jump_every"))
def label_pool_jump8(fg, max_iters=64, jump_every=8):
    d, h, w = fg.shape
    seeds = (jnp.arange(d * h * w, dtype=jnp.int32) + 1).reshape(d, h, w)
    labels = jnp.where(fg, seeds, 0)

    def cond(s):
        return s[1] & (s[2] < max_iters)

    def body(s):
        labels, _, it = s
        def one_pool(i, l):
            return jnp.where(fg, _maxpool3(l), 0)
        pooled = jax.lax.fori_loop(0, jump_every, one_pool, labels)
        flat = pooled.reshape(-1)
        jumped = jnp.where(flat > 0, jnp.take(flat, jnp.maximum(flat - 1, 0)), 0)
        new = jnp.maximum(flat, jumped).reshape(pooled.shape)
        return new, jnp.any(new != labels), it + 1

    labels, _, it = jax.lax.while_loop(cond, body, (labels, jnp.bool_(True), jnp.int32(0)))
    return labels, it


def snake_mask(shape=(128, 128, 128)):
    """Worst case: a serpentine 1-voxel-wide path of length ~ D*H/2."""
    m = np.zeros(shape, bool)
    z = shape[2] // 2
    for i in range(0, shape[0], 2):
        m[i, :, z] = True
        if i + 1 < shape[0]:
            m[i + 1, (shape[1] - 1) if (i // 2) % 2 == 0 else 0, z] = True
    return m


def main():
    from scipy import ndimage

    for name, mask in [("blob+specks", make_mask()), ("snake", snake_mask())]:
        fg = jnp.asarray(mask)
        t_cur = timed(label_components, fg)
        lab_b, it_b = label_pool_only(fg)
        t_b = timed(lambda f: label_pool_only(f)[0], fg)
        lab_c, it_c = label_pool_jump8(fg)
        t_c = timed(lambda f: label_pool_jump8(f)[0], fg)
        print(f"[{name}] current: {t_cur*1e3:6.1f} ms | "
              f"pool-only: {t_b*1e3:6.1f} ms ({int(it_b)} it) | "
              f"pool+jump8: {t_c*1e3:6.1f} ms ({int(it_c)} it)")

        # correctness: same component partition as scipy 26-connectivity
        ref, _ = ndimage.label(mask, structure=np.ones((3, 3, 3)))
        for lab, nm in [(lab_b, "pool-only"), (lab_c, "pool+jump8")]:
            got = np.asarray(lab)
            ok = True
            for comp_id in np.unique(ref)[1:]:
                vals = np.unique(got[ref == comp_id])
                ok &= len(vals) == 1 and vals[0] > 0
            ok &= bool(np.all((got > 0) == (ref > 0)))
            print(f"  {nm}: partition matches scipy: {ok}")

        # end-to-end with sizes
        comp = label_pool_only(fg)[0]
        t_sz = timed(component_sizes, comp)
        print(f"  + component_sizes: {t_sz*1e3:5.1f} ms "
              f"(host scipy target: ~108 ms total)")


if __name__ == "__main__":
    main()
