"""Round-3 VERDICT #3: the decisive Pallas-vs-XLA conv3d measurement at
the flagship encoder shapes (where XLA reaches only 30-53 TFLOP/s)."""

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
from jax import lax

from brats2019_tpu.ops.pallas_conv import conv3d_pallas


def timed(fn, *args, reps=4, lo=5, hi=15):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)

    def run_k(k):
        o = None
        t0 = time.time()
        for _ in range(k):
            o = fn(*args)
        leaf = jax.tree_util.tree_leaves(o)[0]
        np.asarray(jax.device_get(leaf.ravel()[0]))
        return time.time() - t0

    run_k(2)
    ts = sorted((run_k(hi) - run_k(lo)) / (hi - lo) for _ in range(reps))
    return ts[len(ts) // 2]


DIMS = ("NDHWC", "DHWIO", "NDHWC")


def main():
    for B, S, CI, CO in [(8, 64, 32, 64), (8, 64, 64, 64), (8, 32, 64, 128),
                         (8, 32, 128, 128)]:
        x = jax.random.normal(jax.random.PRNGKey(0), (B, S, S, S, CI),
                              jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, CI, CO),
                              jnp.bfloat16)
        flops = 2 * B * S**3 * 27 * CI * CO

        @jax.jit
        def xla(x, w):
            return lax.conv_general_dilated(x, w, (1, 1, 1), "SAME",
                                            dimension_numbers=DIMS)

        @jax.jit
        def pallas(x, w):
            return conv3d_pallas(x, w)

        ref = xla(x, w)
        got = pallas(x, w)
        err = float(jnp.max(jnp.abs(
            got.astype(jnp.float32) - ref.astype(jnp.float32)
        )))
        scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
        t_x = timed(xla, x, w)
        t_p = timed(pallas, x, w)
        print(f"({B},{S}^3,{CI}->{CO}): XLA {t_x*1e3:6.2f} ms "
              f"({flops/t_x/1e12:5.1f} TF/s) | pallas {t_p*1e3:6.2f} ms "
              f"({flops/t_p/1e12:5.1f} TF/s) | max|diff| {err:.2e} "
              f"(scale {scale:.1f})", flush=True)


if __name__ == "__main__":
    main()
