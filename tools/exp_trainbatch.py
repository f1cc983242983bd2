"""Round-3 train-throughput attack (VERDICT #7): the b>=2 step is worse
PER SAMPLE than b1 (170 ms vs 52; HBM-bandwidth cliff, whole-apply remat
loses everywhere — PERF.md "Remat A/B"). Try SELECTIVE remat: checkpoint
only the highest-resolution DoubleConv blocks (remat_levels=1/2), whose
activations dominate the backward working set, at every batch size.

Also separates the roofline story: step time vs 3.1x the b1 forward
(conv-throughput-bound) vs HBM traffic.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses

import jax.numpy as jnp
import numpy as np
import optax

from brats2019_tpu.configs import get_preset
from brats2019_tpu.models import UNet3D


def timed(fn, *args, reps=4, lo=3, hi=9):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)

    def run_k(k):
        t0 = time.time()
        o = None
        for _ in range(k):
            o = fn(*args)
        leaf = jax.tree_util.tree_leaves(o)[0]
        np.asarray(jax.device_get(leaf.ravel()[0]))
        return time.time() - t0

    run_k(2)
    ts = sorted((run_k(hi) - run_k(lo)) / (hi - lo) for _ in range(reps))
    return ts[len(ts) // 2]


def main():
    exp = get_preset("single_chip")
    base = exp.unet
    patch = (128, 128, 128)
    tx = optax.adamw(3e-4, weight_decay=1e-5)

    for remat_lv in (0, 1, 2):
        cfg = dataclasses.replace(base, remat_levels=remat_lv)
        model = UNet3D(cfg)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 16, 16, 16, 4)))
        opt_state = tx.init(params)

        for b in (1, 2, 4):
            x = jax.random.normal(jax.random.PRNGKey(1),
                                  (b,) + patch + (4,), jnp.float32)
            y = jax.random.randint(jax.random.PRNGKey(2), (b,) + patch, 0, 4)

            @jax.jit
            def step(params, opt_state, x, y):
                def loss_fn(p):
                    logits = model.apply(p, x)
                    return optax.softmax_cross_entropy_with_integer_labels(
                        logits, y
                    ).mean()

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state2 = tx.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state2, loss

            t = timed(step, params, opt_state, x, y)
            print(f"remat_levels={remat_lv} b={b}: {t*1e3:7.1f} ms "
                  f"= {b/t:5.1f} patches/s", flush=True)


if __name__ == "__main__":
    main()
