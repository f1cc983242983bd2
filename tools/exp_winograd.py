"""Round-3 session 8: Winograd F(2x2x2, 3x3x3) conv3d vs XLA's conv emitter.

The conv floor investigation (PERF.md "Mosaic direct conv3d") closed the
direct-kernel route: XLA's conv emitter wins ~2x over any Pallas direct
form, but itself reaches only 29-53 TF/s at the dominant L0 shapes while
plain dots hit ~184 TF/s. Winograd F(2,3) is the one untried algebraic
reformulation that turns the 3^3 conv into PLAIN BATCHED MATMULS:

  y = A^T [ (G g G^T..) .*. (B^T d B..) ] A..   per 2^3-output tile

with 64 transform points, each a (B*T^3, Ci) x (Ci, Co) dot — 27/8 =
3.375x fewer MACs than direct conv. F(2,3)'s matrices are exact in
binary (entries 0, +-1, +-0.5), so bf16 numerics match direct-conv
rounding class (no F(4,3)-style 1/6, 1/24 coefficients).

The known risk is HBM traffic: the transformed tensors are 8x the input
(64 points per 8-voxel output tile), so a pure-XLA lowering that
materializes V/M moves ~9x the conv's minimal traffic. This experiment
measures whether the 3.375x MAC reduction at dot-class throughput beats
that traffic bill on the real chip.
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
from jax import lax

# F(2,3) transform matrices (Lavin & Gray 2016, exact in binary fp).
BT = np.array([[1, 0, -1, 0],
               [0, 1, 1, 0],
               [0, -1, 1, 0],
               [0, 1, 0, -1]], np.float32)
G = np.array([[1, 0, 0],
              [0.5, 0.5, 0.5],
              [0.5, -0.5, 0.5],
              [0, 0, 1]], np.float32)
AT = np.array([[1, 1, 1, 0],
               [0, 1, -1, -1]], np.float32)

DIMS = ("NDHWC", "DHWIO", "NDHWC")


def transform_weights(w):
    """(3,3,3,Ci,Co) -> (64, Ci, Co) f32: U = (G x G x G) w."""
    u = np.einsum("pa,qb,rc,abcio->pqrio", G, G, G, np.asarray(w, np.float32))
    return u.reshape(64, *u.shape[3:])


def _tile_axis(x, axis, size):
    """Stack the 4 stride-2 phases of length-(size/2) tile windows.

    Returns the input with `axis` (padded length size+2) replaced by a
    leading point axis of 4 and a tile axis of size//2 in its place.
    """
    t = size // 2
    parts = [lax.slice_in_dim(x, r, r + 2 * t - 1, stride=2, axis=axis)
             for r in range(4)]
    return jnp.stack(parts, axis=axis)  # point axis at `axis`, tiles at axis+1


def winograd_conv3d(x, u, inv_dtype=jnp.bfloat16, out_dtype=jnp.bfloat16):
    """SAME 3^3 conv via F(2x2x2,3x3x3). x: (N,D,H,W,Ci) bf16, even dims.

    u: pre-transformed weights (64, Ci, Co) (cast to bf16 for the core dot).
    inv_dtype: precision of the materialized core-dot output / inverse
    transform (bf16 halves the M-tensor traffic; f32 keeps the dot's
    native accumulation through the inverse).
    """
    n, d, h, w, ci = x.shape
    td, th, tw = d // 2, h // 2, w // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    # Point axes a,b,c (4 each) ahead of tile axes t,u,v:
    # (N, a, Td, b, Th, c, Tw, Ci)
    tl = _tile_axis(_tile_axis(_tile_axis(xp, 3, w), 2, h), 1, d)
    bt = jnp.asarray(BT, x.dtype)
    # Input transform: three small tensordots along the point axes.
    v = jnp.einsum("pa,NatbucvC->NptbucvC", bt, tl)
    v = jnp.einsum("qb,NptbucvC->NptqucvC", bt, v)
    v = jnp.einsum("rc,NptqucvC->NptqurvC", bt, v)
    # (N,p,t,q,u,r,v,C) -> (64, N*T^3, Ci)
    v = v.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(
        n * td * th * tw, 64, ci).transpose(1, 0, 2)
    m = jax.lax.dot_general(
        v.astype(jnp.bfloat16), u.astype(jnp.bfloat16),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (64, N*T^3, Co)
    co = m.shape[-1]
    m = m.astype(inv_dtype).reshape(4, 4, 4, n, td, th, tw, co)
    at = jnp.asarray(AT, inv_dtype)
    y = jnp.einsum("sp,pqrNtuvC->sqrNtuvC", at, m)
    y = jnp.einsum("eq,sqrNtuvC->serNtuvC", at, y)
    y = jnp.einsum("fr,serNtuvC->sefNtuvC", at, y)
    # (s,e,f,N,t,u,v,C) -> (N, t,s, u,e, v,f, C) -> (N,D,H,W,Co)
    y = y.transpose(3, 4, 0, 5, 1, 6, 2, 7).reshape(n, d, h, w, co)
    return y.astype(out_dtype)


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


def main():
    # B=1 at S=64: the materialized V/M tensors are 8x the input per point
    # axis (64 points / 8-voxel tiles) and OOM a 16 GB chip at B=8.
    for B, S, CI, CO in [(1, 64, 32, 64), (1, 64, 64, 64), (8, 32, 64, 128),
                         (8, 32, 128, 128)]:
        kx = jax.random.PRNGKey(0)
        x = jax.random.normal(kx, (B, S, S, S, CI), jnp.bfloat16)
        w = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, CI, CO),
                               jnp.float32) / np.sqrt(27 * CI))
        u = jnp.asarray(transform_weights(w))
        wb = w.astype(jnp.bfloat16)
        flops = 2 * B * S**3 * 27 * CI * CO
        wflops = 2 * B * S**3 * 8 * CI * CO  # effective MACs in the core dot

        @jax.jit
        def xla(x, w):
            return lax.conv_general_dilated(x, w, (1, 1, 1), "SAME",
                                            dimension_numbers=DIMS)

        wino_bf = jax.jit(partial(winograd_conv3d, inv_dtype=jnp.bfloat16))
        wino_f32 = jax.jit(partial(winograd_conv3d, inv_dtype=jnp.float32))

        reff = lax.conv_general_dilated(
            x.astype(jnp.float32), w, (1, 1, 1), "SAME",
            dimension_numbers=DIMS)
        scale = float(jnp.max(jnp.abs(reff)))

        def err(g):
            return float(jnp.max(jnp.abs(g.astype(jnp.float32) - reff)))

        e_xla = err(xla(x, wb))
        e_bf = err(wino_bf(x, u))
        e_f32 = err(wino_f32(x, u))
        t_x = timed(xla, x, wb)
        t_bf = timed(wino_bf, x, u)
        t_f32 = timed(wino_f32, x, u)
        print(f"({B},{S}^3,{CI}->{CO}): XLA {t_x*1e3:7.2f} ms "
              f"({flops/t_x/1e12:5.1f} TF/s, err {e_xla:.2e}) | "
              f"wino-bf16 {t_bf*1e3:7.2f} ms (core {wflops/t_bf/1e12:5.1f} "
              f"TF/s, err {e_bf:.2e}) | wino-f32inv {t_f32*1e3:7.2f} ms "
              f"(err {e_f32:.2e}) | scale {scale:.2f}", flush=True)


if __name__ == "__main__":
    main()
