"""Round-3 (VERDICT #3 precursor): can ANY reformulation beat XLA's
conv3d lowering at the flagship L0 shape (8, 64^3, 32->64 bf16, 3^3),
where XLA reaches only ~29 TFLOP/s (~15% MXU)?

Probes, cheapest first:
  a. lax.conv_general_dilated baseline (+ preferred_element_type probe)
  b. conv3d as sum of 3 conv2d over d-shifted planes (XLA's conv2d
     emitter is the most-tuned path on TPU)
  c. conv3d as 27 shifted (M,K=32)x(32,64) dots accumulated (HBM-bound
     in plain JAX, but calibrates the Pallas design's MXU-side floor)
All variants checked for numerical agreement with the baseline.
"""

from __future__ import annotations

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[0]))
        return time.time() - t0

    run_k(2)
    ts = sorted((run_k(hi) - run_k(lo)) / (hi - lo) for _ in range(reps))
    return ts[len(ts) // 2]


DIMS = ("NDHWC", "DHWIO", "NDHWC")


def main():
    B, S, CI, CO = 8, 64, 32, 64
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, S, S, S, CI), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, CI, CO), jnp.bfloat16)
    flops = 2 * B * S**3 * 27 * CI * CO

    @jax.jit
    def conv3d(x, w):
        return lax.conv_general_dilated(x, w, (1, 1, 1), "SAME",
                                        dimension_numbers=DIMS)

    @jax.jit
    def conv3d_f32acc(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME", dimension_numbers=DIMS,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    @jax.jit
    def conv_2d_decomp(x, w):
        # conv3d = sum over kd of conv2d(d-shifted x, w[kd]); fold (B, D)
        # into the conv2d batch; handle the d shift by padding + slicing
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        acc = None
        for kd in range(3):
            xs = xp[:, kd:kd + S]                       # (B, S, S, S, CI)
            x2 = xs.reshape(B * S, S, S, CI)
            y = lax.conv_general_dilated(
                x2, w[kd], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            acc = y if acc is None else acc + y
        return acc.reshape(B, S, S, S, CO)

    @jax.jit
    def conv_27dots(x, w):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((B, S, S, S, CO), jnp.float32)
        for kd in range(3):
            for kh in range(3):
                for kw in range(3):
                    xs = xp[:, kd:kd + S, kh:kh + S, kw:kw + S, :]
                    acc = acc + jnp.einsum(
                        "bdhwc,co->bdhwo", xs, w[kd, kh, kw],
                        preferred_element_type=jnp.float32,
                    )
        return acc.astype(jnp.bfloat16)

    ref = conv3d(x, w)
    for name, fn in [
        ("conv3d XLA", conv3d),
        ("conv3d f32-acc", conv3d_f32acc),
        ("3x conv2d decomp", conv_2d_decomp),
        ("27 shifted dots", conv_27dots),
    ]:
        t = timed(fn, x, w)
        out = fn(x, w)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
        print(f"{name:18s}: {t*1e3:7.2f} ms = {flops/t/1e12:6.1f} TFLOP/s "
              f"(max|diff| {err:.2e})")

    # second conv of the block (64->64) for completeness
    w2 = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 3, CO, CO), jnp.bfloat16)
    x2 = jax.random.normal(jax.random.PRNGKey(3), (B, S, S, S, CO), jnp.bfloat16)
    flops2 = 2 * B * S**3 * 27 * CO * CO

    @jax.jit
    def conv3d_2(x, w):
        return lax.conv_general_dilated(x, w, (1, 1, 1), "SAME",
                                        dimension_numbers=DIMS)

    @jax.jit
    def conv_2d_decomp_2(x, w):
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        acc = None
        for kd in range(3):
            xs = xp[:, kd:kd + S].reshape(B * S, S, S, CO)
            y = lax.conv_general_dilated(
                xs, w[kd], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            acc = y if acc is None else acc + y
        return acc.reshape(B, S, S, S, CO)

    t = timed(conv3d_2, x2, w2)
    print(f"conv3d 64->64 XLA : {t*1e3:7.2f} ms = {flops2/t/1e12:6.1f} TFLOP/s")
    t = timed(conv_2d_decomp_2, x2, w2)
    print(f"3x conv2d 64->64  : {t*1e3:7.2f} ms = {flops2/t/1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
