"""Pallas 2x trilinear up/downsampling kernels (SURVEY.md N3;
BASELINE.json:5 "Pallas kernels for ... trilinear up/downsampling").

Design (applies the round-1 lesson from ops/pallas_norm.py — consume the
layout XLA already uses, never force a repack):

* NDHWC stays NDHWC: C remains the minor/lane dimension, D is gridded one
  input plane per step, H/W/C stay whole inside the block (VMEM budget at
  the network's decoder shapes: <= a few MB per block).
* Half-pixel 2x trilinear weights are (0.25, 0.75); edge handling is
  replicate-clamp, which the kernel gets FOR FREE from clamped BlockSpec
  index maps (out-of-range neighbor plane indices clamp to the edge plane,
  reproducing jax.image.resize semantics exactly — verified by oracle
  tests).
* One kernel pass does all three axes: the D-axis combine uses the
  (i-1, i, i+1) neighbor planes; H and W are interleaved in-block via
  stack+reshape (C-minor preserved, so no relayout).
* The custom VJP of upsample is its exact linear transpose — a stride-2
  4-tap correlation, again with clamped index maps supplying the edge
  corrections (see _up_bwd_kernel derivation in the docstring there).

A/B against jax.image.resize at the real network shapes lives in PERF.md;
the production default in ops/resize.py follows the measurement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Flip to True (tests do) to run kernels in interpreter mode off-TPU.
_INTERPRET = False


def _interleave(even: jnp.ndarray, odd: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Interleave two equal-shape arrays along ``axis`` (even first)."""
    stacked = jnp.stack([even, odd], axis=axis + 1)
    shape = list(even.shape)
    shape[axis] *= 2
    return stacked.reshape(shape)


def _shift_down(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """x[i-1] with edge clamp; size-1 axes short-circuit (Mosaic rejects
    0-sized vector slices, and clamping makes the answer just x)."""
    if x.shape[axis] == 1:
        return x
    sl_first = [slice(None)] * x.ndim
    sl_first[axis] = slice(0, 1)
    sl_body = [slice(None)] * x.ndim
    sl_body[axis] = slice(0, -1)
    return jnp.concatenate([x[tuple(sl_first)], x[tuple(sl_body)]], axis=axis)


def _shift_up(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """x[i+1] with edge clamp; size-1 axes short-circuit."""
    if x.shape[axis] == 1:
        return x
    sl_last = [slice(None)] * x.ndim
    sl_last[axis] = slice(-1, None)
    sl_body = [slice(None)] * x.ndim
    sl_body[axis] = slice(1, None)
    return jnp.concatenate([x[tuple(sl_body)], x[tuple(sl_last)]], axis=axis)


def _up_plane(x: jnp.ndarray) -> jnp.ndarray:
    """2x upsample of the H and W axes of one (H, W, C) plane, f32."""
    # H axis: even rows pull from (h-1, h); odd rows from (h, h+1); clamp
    xm = _shift_down(x, 0)
    xp = _shift_up(x, 0)
    h = _interleave(0.25 * xm + 0.75 * x, 0.75 * x + 0.25 * xp, axis=0)
    hm = _shift_down(h, 1)
    hp = _shift_up(h, 1)
    return _interleave(0.25 * hm + 0.75 * h, 0.75 * h + 0.25 * hp, axis=1)


def _up_fwd_kernel(a_ref, b_ref, c_ref, o_ref):
    """Grid point (n, i): read input planes (i-1, i, i+1) (clamped), write
    output planes (2i, 2i+1)."""
    a = a_ref[0, 0].astype(jnp.float32)  # plane i-1
    b = b_ref[0, 0].astype(jnp.float32)  # plane i
    c = c_ref[0, 0].astype(jnp.float32)  # plane i+1
    even = 0.25 * a + 0.75 * b   # output plane 2i
    odd = 0.75 * b + 0.25 * c    # output plane 2i+1
    o_ref[0, 0] = _up_plane(even).astype(o_ref.dtype)
    o_ref[0, 1] = _up_plane(odd).astype(o_ref.dtype)


def _plane_spec(d_index_map):
    return pl.BlockSpec(
        (1, 1, None, None, None),
        d_index_map,
        memory_space=pltpu.VMEM,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def upsample2x_pallas(x: jnp.ndarray) -> jnp.ndarray:
    return _upsample2x_fwd_impl(x)


def _upsample2x_fwd_impl(x: jnp.ndarray) -> jnp.ndarray:
    n, d, h, w, c = x.shape
    out_shape = jax.ShapeDtypeStruct((n, 2 * d, 2 * h, 2 * w, c), x.dtype)
    grid = (n, d)
    km = lambda off, lim: (lambda ni, di: (ni, jnp.clip(di + off, 0, lim), 0, 0, 0))
    return pl.pallas_call(
        _up_fwd_kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, h, w, c), km(-1, d - 1)),
            pl.BlockSpec((1, 1, h, w, c), km(0, d - 1)),
            pl.BlockSpec((1, 1, h, w, c), km(+1, d - 1)),
        ],
        out_specs=pl.BlockSpec(
            (1, 2, 2 * h, 2 * w, c), lambda ni, di: (ni, di, 0, 0, 0)
        ),
        interpret=_INTERPRET,
    )(x, x, x)


def _down_plane_t(g: jnp.ndarray) -> jnp.ndarray:
    """Transpose of _up_plane on one (2H, 2W, C) grad plane -> (H, W, C).

    grad_x[h] = 0.75*(g[2h] + g[2h+1]) + 0.25*(g[2h+2] + g[2h-1]), with
    clamp-transpose edge corrections: g[-1] contributes to x[0] and g[2H]
    to x[H-1] — realized by shifting the interleaved halves."""
    def axis_t(g, axis):
        # split even/odd samples along axis
        sh = list(g.shape)
        sh[axis] //= 2
        sh.insert(axis + 1, 2)
        gs = g.reshape(sh)
        # static integer indexing (slice+reshape) — jnp.take lowers to a
        # gather Mosaic doesn't support inside kernels
        sl_e = [slice(None)] * gs.ndim
        sl_e[axis + 1] = 0
        sl_o = [slice(None)] * gs.ndim
        sl_o[axis + 1] = 1
        even = gs[tuple(sl_e)]  # g[2h]
        odd = gs[tuple(sl_o)]   # g[2h+1]
        # g[2h+2] = even shifted down (zero past the end); g[2h-1] = odd
        # shifted up (zero before the start). Size-1 axes: both neighbors
        # are out of range -> zeros (Mosaic rejects 0-sized slices).
        if even.shape[axis] == 1:
            even_next = jnp.zeros_like(even)
            odd_prev = jnp.zeros_like(odd)
        else:
            idx = [slice(None)] * even.ndim
            idx[axis] = slice(1, None)
            pad = [(0, 0)] * even.ndim
            pad[axis] = (0, 1)
            even_next = jnp.pad(even[tuple(idx)], pad)
            idx0 = [slice(None)] * odd.ndim
            idx0[axis] = slice(0, -1)
            pad0 = [(0, 0)] * odd.ndim
            pad0[axis] = (1, 0)
            odd_prev = jnp.pad(odd[tuple(idx0)], pad0)
        out = 0.75 * (even + odd) + 0.25 * (even_next + odd_prev)
        # clamp-transpose: out-of-range taps fold back onto the edge rows.
        # Built by concatenation, NOT .at[].add — scatter inside a Pallas
        # kernel captures index constants Mosaic can't lower.
        first = [slice(None)] * out.ndim
        first[axis] = slice(0, 1)
        last = [slice(None)] * out.ndim
        last[axis] = slice(-1, None)
        e_first = 0.25 * even[tuple(first)]
        o_last = 0.25 * odd[tuple(last)]
        size = out.shape[axis]
        if size == 1:
            return out + e_first + o_last
        if size == 2:
            return out + jnp.concatenate([e_first, o_last], axis=axis)
        mid = [slice(None)] * out.ndim
        mid[axis] = slice(1, size - 1)
        zeros_mid = jnp.zeros_like(out[tuple(mid)])
        return out + jnp.concatenate([e_first, zeros_mid, o_last], axis=axis)

    return axis_t(axis_t(g, 0), 1)


def _up_bwd_kernel(gm_ref, ge_ref, go_ref, gp_ref, o_ref):
    """Grid point (n, i): grad_x plane i from grad_out planes
    (2i-1, 2i, 2i+1, 2i+2) (clamped index maps).

    D-axis transpose: grad_x[i] = 0.75*(g[2i]+g[2i+1]) + 0.25*(g[2i+2]+
    g[2i-1]). The clamped index maps deliver the edge folds for free: at
    i==0 the (2i-1)->0 clamp makes gm==g[0], so g[0]'s total coefficient
    is 0.75+0.25 = 1.0 — exactly the forward's replicate-clamp transpose;
    symmetrically at i==D-1 with gp (verified against AD of the jnp oracle
    in tests).

    Accumulation dtype follows the cotangent dtype: f32 cotangents (tests,
    fp32 training) get exact f32 math; bf16 cotangents (mixed-precision
    production, where the surrounding grads are bf16 anyway) stay bf16 so
    the intermediates fit the 16 MB VMEM budget at (64,64,128)-sized grad
    planes (f32 temps measured 18.1 MB scoped — OOM)."""
    acc_dt = jnp.float32 if gm_ref.dtype == jnp.float32 else jnp.bfloat16
    gm = _down_plane_t(gm_ref[0, 0].astype(acc_dt))  # g[2i-1]
    ge = _down_plane_t(ge_ref[0, 0].astype(acc_dt))  # g[2i]
    go = _down_plane_t(go_ref[0, 0].astype(acc_dt))  # g[2i+1]
    gp = _down_plane_t(gp_ref[0, 0].astype(acc_dt))  # g[2i+2]
    # python-float scalars are weakly typed: math stays in acc_dt
    o_ref[0, 0] = ((ge + go) * 0.75 + (gp + gm) * 0.25).astype(o_ref.dtype)


def _upsample2x_bwd_impl(x_shape, x_dtype, g: jnp.ndarray) -> jnp.ndarray:
    n, d, h, w, c = x_shape
    grid = (n, d)
    lim = 2 * d - 1
    km = lambda off: (
        lambda ni, di: (ni, jnp.clip(2 * di + off, 0, lim), 0, 0, 0)
    )
    return pl.pallas_call(
        _up_bwd_kernel,
        out_shape=jax.ShapeDtypeStruct((n, d, h, w, c), x_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 2 * h, 2 * w, c), km(-1)),
            pl.BlockSpec((1, 1, 2 * h, 2 * w, c), km(0)),
            pl.BlockSpec((1, 1, 2 * h, 2 * w, c), km(+1)),
            pl.BlockSpec((1, 1, 2 * h, 2 * w, c), km(+2)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, h, w, c), lambda ni, di: (ni, di, 0, 0, 0)
        ),
        interpret=_INTERPRET,
    )(g, g, g, g)


def _up_fwd_rule(x):
    return _upsample2x_fwd_impl(x), None


def _up_bwd_rule(res, g):
    n, d2, h2, w2, c = g.shape
    x_shape = (n, d2 // 2, h2 // 2, w2 // 2, c)
    return (_upsample2x_bwd_impl(x_shape, g.dtype, g),)


upsample2x_pallas.defvjp(_up_fwd_rule, _up_bwd_rule)


# ---------------------------------------------------------------------------
# 2x average-pool downsample
# ---------------------------------------------------------------------------

def _down_fwd_kernel(a_ref, b_ref, o_ref):
    """Grid point (n, i): average input planes (2i, 2i+1) and 2x2 pool
    H/W in-block."""
    a = a_ref[0, 0].astype(jnp.float32)
    b = b_ref[0, 0].astype(jnp.float32)
    m = 0.5 * (a + b)  # D-pair average
    h2, w2, c = m.shape
    m = m.reshape(h2 // 2, 2, w2 // 2, 2, c)
    o_ref[0, 0] = (
        0.25 * (m[:, 0, :, 0] + m[:, 0, :, 1] + m[:, 1, :, 0] + m[:, 1, :, 1])
    ).astype(o_ref.dtype)


@jax.custom_vjp
def downsample2x_pallas(x: jnp.ndarray) -> jnp.ndarray:
    return _downsample2x_fwd_impl(x)


def _downsample2x_fwd_impl(x: jnp.ndarray) -> jnp.ndarray:
    n, d, h, w, c = x.shape
    grid = (n, d // 2)
    return pl.pallas_call(
        _down_fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((n, d // 2, h // 2, w // 2, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, h, w, c), lambda ni, di: (ni, 2 * di, 0, 0, 0)),
            pl.BlockSpec(
                (1, 1, h, w, c), lambda ni, di: (ni, 2 * di + 1, 0, 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, h // 2, w // 2, c), lambda ni, di: (ni, di, 0, 0, 0)
        ),
        interpret=_INTERPRET,
    )(x, x)


def _down_bwd_kernel(g_ref, o_ref):
    """Each input voxel of the 2^3 window receives grad/8: broadcast the
    (h, w, c) grad plane back to (2h, 2w, c) for both D planes."""
    g = g_ref[0, 0].astype(jnp.float32) * 0.125
    h, w, c = g.shape
    up = jnp.broadcast_to(g[:, None, :, None, :], (h, 2, w, 2, c)).reshape(
        2 * h, 2 * w, c
    )
    o_ref[0, 0] = up.astype(o_ref.dtype)
    o_ref[0, 1] = up.astype(o_ref.dtype)


def _downsample2x_bwd_impl(x_shape, x_dtype, g: jnp.ndarray) -> jnp.ndarray:
    n, d, h, w, c = x_shape
    grid = (n, d // 2)
    return pl.pallas_call(
        _down_bwd_kernel,
        out_shape=jax.ShapeDtypeStruct((n, d, h, w, c), x_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, h // 2, w // 2, c), lambda ni, di: (ni, di, 0, 0, 0)
            )
        ],
        out_specs=pl.BlockSpec(
            (1, 2, h, w, c), lambda ni, di: (ni, di, 0, 0, 0)
        ),
        interpret=_INTERPRET,
    )(g)


def _down_fwd_rule(x):
    return _downsample2x_fwd_impl(x), None


def _down_bwd_rule(res, g):
    n, d, h, w, c = g.shape
    x_shape = (n, 2 * d, 2 * h, 2 * w, c)
    return (_downsample2x_bwd_impl(x_shape, g.dtype, g),)


downsample2x_pallas.defvjp(_down_fwd_rule, _down_bwd_rule)
