"""Round-3 probe: does XLA reach the v5e int8 MXU path (394 TOPS vs 197
bf16 TFLOP/s peak), and does it do so for the 3D convs the flagship predict
program is bound by (PERF.md "conv3d MXU efficiency": bf16 convs cap at
~12-169 TFLOP/s depending on channel width)?

Probes, cheapest first:
  a. control: big dense dot, bf16 vs int8xint8->int32 (is int8 MXU
     reachable AT ALL from JAX on this chip?)
  b. flagship conv shapes, bf16 vs int8xint8->int32
     (8,64^3,64->64), (8,32^3,128->128), (8,16^3,256->256)
  c. mixed int8 weights x bf16 activations (weight-only quantization)

If (b) wins ~2x, a quantized inference path (per-channel weight scales +
static activation scales, IN/act stays bf16) is the round-4 headline
lever; if int8 convs DON'T hit the MXU int8 path, record the negative.
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

DIMS = ("NDHWC", "DHWIO", "NDHWC")


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


def report(name, flops_or_ops, t):
    print(f"  {name:42s} {t * 1e3:8.2f} ms  {flops_or_ops / t / 1e12:7.1f} T/s",
          flush=True)


def main():
    key = jax.random.PRNGKey(0)

    # --- a. control: dense dot ---------------------------------------
    print("a. dense dot 8192x8192x8192 (2.2 TFLOP-equiv)", flush=True)
    M = 8192
    ops = 2 * M * M * M
    xb = jax.random.normal(key, (M, M), jnp.bfloat16)
    wb = jax.random.normal(jax.random.PRNGKey(1), (M, M), jnp.bfloat16)
    xi = jax.random.randint(key, (M, M), -127, 127, jnp.int8)
    wi = jax.random.randint(jax.random.PRNGKey(1), (M, M), -127, 127, jnp.int8)

    @jax.jit
    def dot_bf16(x, w):
        return jnp.dot(x, w)

    @jax.jit
    def dot_int8(x, w):
        return lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    report("bf16 dot", ops, timed(dot_bf16, xb, wb))
    try:
        report("int8->int32 dot", ops, timed(dot_int8, xi, wi))
    except Exception as e:
        print(f"  int8 dot FAILED: {type(e).__name__}: {str(e)[:200]}")

    # --- b. flagship conv shapes -------------------------------------
    for B, S, C in [(8, 64, 64), (8, 32, 128), (8, 16, 256)]:
        print(f"b. conv3d ({B},{S}^3,{C})->{C} 3^3", flush=True)
        ops = 2 * B * S**3 * 27 * C * C
        xb = jax.random.normal(key, (B, S, S, S, C), jnp.bfloat16)
        wb = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, C, C),
                               jnp.bfloat16)
        xi = jax.random.randint(key, (B, S, S, S, C), -127, 127, jnp.int8)
        wi = jax.random.randint(jax.random.PRNGKey(1), (3, 3, 3, C, C),
                                -127, 127, jnp.int8)

        @jax.jit
        def conv_bf16(x, w):
            return lax.conv_general_dilated(x, w, (1, 1, 1), "SAME",
                                            dimension_numbers=DIMS)

        @jax.jit
        def conv_int8(x, w):
            return lax.conv_general_dilated(
                x, w, (1, 1, 1), "SAME", dimension_numbers=DIMS,
                preferred_element_type=jnp.int32,
            )

        @jax.jit
        def conv_w8(x, w):
            # weight-only: dequantize-on-the-fly (XLA may fold the cast)
            return lax.conv_general_dilated(
                x, w.astype(jnp.bfloat16), (1, 1, 1), "SAME",
                dimension_numbers=DIMS,
            )

        report("bf16 conv", ops, timed(conv_bf16, xb, wb))
        try:
            report("int8->int32 conv", ops, timed(conv_int8, xi, wi))
        except Exception as e:
            print(f"  int8 conv FAILED: {type(e).__name__}: {str(e)[:200]}")
        try:
            report("int8-weights bf16-act conv", ops, timed(conv_w8, xb, wi))
        except Exception as e:
            print(f"  w8 conv FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
