"""Round-3 session 9: Pallas VMEM-resident Winograd F(2,3) conv3d vs XLA.

Session 8 closed the XLA-lowered Winograd route (10-20x worse, HBM-bound
on the materialized 64-point tensors) and left the one open formulation:
keep V/M VMEM-resident inside a single Mosaic kernel
(ops/pallas_winograd.py). This experiment is its staged kill-test on the
real chip:

  stage 1: correctness vs lax.conv_general_dilated at a small shape;
  stage 2: chained timing at the flagship shapes vs the XLA emitter,
           sweeping acc_bf16 and the thb h-block geometry (the whole
           64^3 plane overflows scoped VMEM — 27.4 MB vs 16 MB — so
           the auto-pick blocks h; the sweep checks neighbors).

Ceiling from PERF.md "Winograd via XLA": core dot at K=N=64 is quarter-
MXU (~49 TF/s) but carries 3.375x fewer MACs => ~165 TF/s direct-
equivalent vs the emitter's 29-53, IF the VPU transforms pipeline behind
the dots and the phase-split DMA stays minor-dim-aligned.
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
from jax import lax

from brats2019_tpu.ops.pallas_winograd import conv3d_winograd

DIMS = ("NDHWC", "DHWIO", "NDHWC")


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


def check(B, S, CI, CO, acc_bf16):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, S, S, S, CI),
                          jnp.bfloat16)
    w = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, CI, CO),
                           jnp.float32) / np.sqrt(27 * CI))
    reff = lax.conv_general_dilated(x.astype(jnp.float32), w, (1, 1, 1),
                                    "SAME", dimension_numbers=DIMS)
    scale = float(jnp.max(jnp.abs(reff)))
    e_xla = float(jnp.max(jnp.abs(
        lax.conv_general_dilated(x, w.astype(jnp.bfloat16), (1, 1, 1),
                                 "SAME", dimension_numbers=DIMS)
        .astype(jnp.float32) - reff)))
    y = conv3d_winograd(x, w, acc_bf16=acc_bf16)
    e_pl = float(jnp.max(jnp.abs(y.astype(jnp.float32) - reff)))
    print(f"  correctness ({B},{S}^3,{CI}->{CO}) acc_bf16={acc_bf16}: "
          f"err {e_pl:.2e} (xla-bf16 {e_xla:.2e}, "
          f"scale {scale:.2f})", flush=True)
    return e_pl, e_xla


def bench(B, S, CI, CO, thbs=(None,)):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, S, S, S, CI),
                          jnp.bfloat16)
    w = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, CI, CO),
                           jnp.float32) / np.sqrt(27 * CI))
    wb = w.astype(jnp.bfloat16)
    flops = 2 * B * S ** 3 * 27 * CI * CO
    wflops = 2 * B * S ** 3 * 8 * CI * CO

    @jax.jit
    def xla(x, w):
        return lax.conv_general_dilated(x, w, (1, 1, 1), "SAME",
                                        dimension_numbers=DIMS)

    t_x = timed(xla, x, wb)
    print(f"({B},{S}^3,{CI}->{CO}): XLA {t_x*1e3:7.2f} ms "
          f"({flops/t_x/1e12:5.1f} TF/s)", flush=True)
    for thb in thbs:
        for acc_bf16 in (False, True):
            try:
                def f(x, w, acc_bf16=acc_bf16, thb=thb):
                    return conv3d_winograd(x, w, acc_bf16=acc_bf16, thb=thb)
                t = timed(f, x, w)
                print(f"    wino thb={thb} acc_bf16={int(acc_bf16)}: "
                      f"{t*1e3:7.2f} ms (core {wflops/t/1e12:5.1f} TF/s, "
                      f"dir-equiv {flops/t/1e12:5.1f} TF/s) "
                      f"{'WIN' if t < t_x else 'lose'} {t_x/t:4.2f}x",
                      flush=True)
            except Exception as e:  # noqa: BLE001 - record compile failures
                print(f"    wino thb={thb} acc_bf16={int(acc_bf16)}: "
                      f"FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    print("== stage 1: correctness ==", flush=True)
    check(2, 16, 32, 32, False)
    check(1, 32, 64, 64, False)
    check(1, 32, 64, 64, True)
    print("== stage 2: flagship-shape timing ==", flush=True)
    bench(8, 64, 32, 64, thbs=(None, 8, 4))
    bench(8, 64, 64, 64, thbs=(None, 8, 4))
    bench(8, 32, 64, 128)
    bench(8, 32, 128, 128)


if __name__ == "__main__":
    main()
