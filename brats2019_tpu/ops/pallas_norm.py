"""Pallas TPU kernel: fused InstanceNorm3d + activation, fwd + bwd
(SURVEY.md N2; BASELINE.json:5 "Pallas kernels for fused
InstanceNorm+activation").

Replaces the reference's ATen instance_norm -> activation pair (two kernel
launches, extra HBM round trips). Forward is ONE kernel: a two-phase
revisiting grid per sample — phase 0 streams the sample's spatial blocks
once, accumulating per-lane sum/sum-of-squares in VMEM scratch; phase 1
streams them again emitting the normalized+activated output. That is 2 HBM
reads + 1 write, the bandwidth lower bound for a full-tensor normalization
when the tensor exceeds VMEM. Statistics are fp32 regardless of input dtype.

Lane packing: NDHWC with small C (4..96 channels in this model family)
would leave most of the VPU's 128 lanes idle. The tensor is therefore
viewed as (N, S/f, f*C) — a free, layout-preserving reshape — with
f = 128/gcd(C, 128), so the minor dimension is a multiple of 128 and every
lane is live. Per-channel statistics live lane-TILED: folding the f channel
groups and re-broadcasting is one tiny MXU matmul with a precomputed 0/1
"fold matrix" F[i, j] = (i == j mod C), i.e. tiled_stats = lane_sums @ F
(Mosaic cannot reshape across lanes, so this replaces an in-register fold).

The backward pass is a second two-phase kernel computing the standard
instance-norm VJP with the activation's gradient folded in:

  g_a   = g * act'(y)
  dbeta = sum_s g_a          dgamma = sum_s g_a * xhat
  dx    = gamma * rstd * (g_a - mean_s(g_a) - xhat * mean_s(g_a * xhat))

Supported activations for the fused path: relu / leaky_relu / none
(ops.norm falls back to the jnp backend otherwise).

PERF STATUS (measured on TPU v5e, (2,128,128,128,32) bf16, chained-iteration
timing — see PERF.md): the kernel body streams at ~340 GB/s, but calling it
from a network graph costs a physical layout repack at the boundary (XLA
stores small-C NDHWC tensors lane-padded; the (S/f, f*C) view repacks), so
end-to-end it measures ~10 ms vs ~1.6 ms for the XLA-fused jnp path, which
already runs at ~514 GB/s (near-roofline: 3 passes at HBM speed). The
default backend therefore stays "jnp" (ops/norm.py) — the compiler already
schedules this op well; the kernel remains available, correct and tested,
for layout-controlled callers.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LEAKY_SLOPE = 0.01
# biggest blocks that keep the streams double-buffered under the 16M VMEM:
# fwd has 2 streams (x in, y out), bwd has 3 (x, g in, dx out). Small blocks
# make per-grid-step overhead dominate (measured 11ms with 1k-row blocks).
_MAX_BLOCK_ROWS_FWD = 8192
_MAX_BLOCK_ROWS_BWD = 4096


def _fold_factor(c: int) -> int:
    return 128 // math.gcd(c, 128)


def _block_rows(s2: int, cap: int) -> int:
    bs = cap
    while bs >= 16:
        if s2 % bs == 0:
            return bs
        bs //= 2
    return 0


def _plan(shape: Tuple[int, ...]):
    """(s, f, s2, c2, bs_fwd, bs_bwd) or None if the shape can't be tiled."""
    n, d, h, w, c = shape
    s = d * h * w
    f = _fold_factor(c)
    if s % f:
        return None
    s2 = s // f
    c2 = f * c
    # cap block bytes too (~4MB fwd / 2MB bwd) so wide c2 doesn't blow VMEM
    cap_fwd = min(_MAX_BLOCK_ROWS_FWD, max(16, (4 << 20) // (c2 * 2)))
    cap_bwd = min(_MAX_BLOCK_ROWS_BWD, max(16, (2 << 20) // (c2 * 2)))
    bs_fwd = _block_rows(s2, cap_fwd)
    bs_bwd = _block_rows(s2, cap_bwd)
    if not bs_fwd or not bs_bwd:
        return None
    return s, f, s2, c2, bs_fwd, bs_bwd


def supports(shape: Tuple[int, ...], activation: str) -> bool:
    if activation not in ("relu", "leaky_relu", "none"):
        return False
    if len(shape) != 5:
        return False
    return _plan(shape) is not None


def _fold_matrix(f: int, c: int) -> np.ndarray:
    """(f*C, f*C) 0/1 matrix: (v @ F)[i] = sum_{j = i mod C} v[j]."""
    c2 = f * c
    i = np.arange(c2)
    return (i[:, None] % c == i[None, :] % c).astype(np.float32)


def _act(y: jnp.ndarray, activation: str) -> jnp.ndarray:
    if activation == "relu":
        return jnp.maximum(y, 0.0)
    if activation == "leaky_relu":
        return jnp.where(y > 0, y, y * _LEAKY_SLOPE)
    return y


def _act_grad(y_pre: jnp.ndarray, g: jnp.ndarray, activation: str) -> jnp.ndarray:
    if activation == "relu":
        return jnp.where(y_pre > 0, g, 0.0)
    if activation == "leaky_relu":
        return jnp.where(y_pre > 0, g, g * _LEAKY_SLOPE)
    return g


def _tiled_fold(acc_row: jnp.ndarray, fold_ref, f: int) -> jnp.ndarray:
    """Lane-sums (c2,) -> lane-tiled per-channel sums (c2,)."""
    if f == 1:
        return acc_row
    return jnp.dot(
        acc_row[None, :], fold_ref[...], preferred_element_type=jnp.float32
    )[0]


def _fold_host(v: jnp.ndarray, f: int, c: int) -> jnp.ndarray:
    """Outside-kernel fold: lane vector (..., f*C) -> per-channel (..., C)."""
    return v.reshape(v.shape[:-1] + (f, c)).sum(axis=-2)


# --------------------------------------------------------------- forward --

def _fwd_kernel(x_ref, gamma_ref, beta_ref, fold_ref,
                o_ref, mean_ref, rstd_ref, acc_ref,
                *, s_total: int, f: int, eps: float, activation: str):
    phase = pl.program_id(1)
    b = pl.program_id(2)

    @pl.when((phase == 0) & (b == 0))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(phase == 0)
    def _():
        xb = x_ref[0].astype(jnp.float32)          # (BS, f*C)
        acc_ref[0, :] += jnp.sum(xb, axis=0)
        acc_ref[1, :] += jnp.sum(xb * xb, axis=0)

    @pl.when(phase == 1)
    def _():
        inv_s = 1.0 / float(s_total)
        mean_t = _tiled_fold(acc_ref[0, :], fold_ref, f) * inv_s   # (c2,)
        sq_t = _tiled_fold(acc_ref[1, :], fold_ref, f) * inv_s
        var_t = sq_t - mean_t * mean_t
        rstd_t = jax.lax.rsqrt(jnp.maximum(var_t, 0.0) + eps)
        xb = x_ref[0].astype(jnp.float32)
        xhat = (xb - mean_t[None, :]) * rstd_t[None, :]
        y = xhat * gamma_ref[0][None, :] + beta_ref[0][None, :]
        o_ref[0] = _act(y, activation).astype(o_ref.dtype)

        @pl.when(b == 0)
        def _():
            mean_ref[0, 0] = mean_t
            rstd_ref[0, 0] = rstd_t


def _fwd_pallas(x3: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                plan, eps: float, activation: str):
    """Returns y (n,s,c) and lane-TILED stats mean_t/rstd_t (n, c2) fp32."""
    n = x3.shape[0]
    s, f, s2, c2, bs, _ = plan
    xf = x3.reshape(n, s2, c2)
    gamma2 = jnp.tile(gamma, f)[None, :]
    beta2 = jnp.tile(beta, f)[None, :]
    fold = jnp.asarray(_fold_matrix(f, c2 // f))
    grid = (n, 2, s2 // bs)
    kernel = functools.partial(
        _fwd_kernel, s_total=s, f=f, eps=eps, activation=activation
    )
    y, mean_t, rstd_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bs, c2), lambda i, p, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2), lambda i, p, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2), lambda i, p, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c2, c2), lambda i, p, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            # phase 0 parks (unwritten) blocks on index 0; phase 1 overwrites
            pl.BlockSpec((1, bs, c2),
                         lambda i, p, j: (i, jnp.where(p == 0, 0, j), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c2), lambda i, p, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c2), lambda i, p, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, s2, c2), x3.dtype),
            jax.ShapeDtypeStruct((n, 1, c2), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, c2), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((2, c2), jnp.float32)],
    )(xf, gamma2, beta2, fold)
    c = c2 // f
    return y.reshape(n, s, c), mean_t[:, 0], rstd_t[:, 0]


# -------------------------------------------------------------- backward --

def _bwd_kernel(x_ref, g_ref, gamma_ref, beta_ref, mean_ref, rstd_ref,
                fold_ref, dx_ref, s1_ref, s2_ref, acc_ref,
                *, s_total: int, f: int, activation: str):
    phase = pl.program_id(1)
    b = pl.program_id(2)

    mean = mean_ref[0, 0]                           # (c2,) lane-tiled f32
    rstd = rstd_ref[0, 0]
    gamma = gamma_ref[0]                            # pre-tiled (c2,)
    beta = beta_ref[0]

    @pl.when((phase == 0) & (b == 0))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xb = x_ref[0].astype(jnp.float32)
    gb = g_ref[0].astype(jnp.float32)
    xhat = (xb - mean[None, :]) * rstd[None, :]
    y_pre = xhat * gamma[None, :] + beta[None, :]
    g_a = _act_grad(y_pre, gb, activation)

    @pl.when(phase == 0)
    def _():
        acc_ref[0, :] += jnp.sum(g_a, axis=0)               # sum g_a
        acc_ref[1, :] += jnp.sum(g_a * xhat, axis=0)        # sum g_a*xhat

    @pl.when(phase == 1)
    def _():
        inv_s = 1.0 / float(s_total)
        m1 = _tiled_fold(acc_ref[0, :], fold_ref, f) * inv_s
        m2 = _tiled_fold(acc_ref[1, :], fold_ref, f) * inv_s
        dx = (gamma * rstd)[None, :] * (g_a - m1[None, :] - xhat * m2[None, :])
        dx_ref[0] = dx.astype(dx_ref.dtype)

        @pl.when(b == 0)
        def _():
            s1_ref[0, 0] = acc_ref[0, :]
            s2_ref[0, 0] = acc_ref[1, :]


def _bwd_pallas(x3, g3, gamma, beta, mean_t, rstd_t, plan, activation: str):
    n = x3.shape[0]
    s, f, s2, c2, _, bs = plan
    c = c2 // f
    xf = x3.reshape(n, s2, c2)
    gf = g3.reshape(n, s2, c2)
    gamma2 = jnp.tile(gamma, f)[None, :]
    beta2 = jnp.tile(beta, f)[None, :]
    fold = jnp.asarray(_fold_matrix(f, c))
    grid = (n, 2, s2 // bs)
    kernel = functools.partial(
        _bwd_kernel, s_total=s, f=f, activation=activation
    )
    dx, s1, s2_ = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bs, c2), lambda i, p, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs, c2), lambda i, p, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2), lambda i, p, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2), lambda i, p, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c2), lambda i, p, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c2), lambda i, p, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c2, c2), lambda i, p, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bs, c2),
                         lambda i, p, j: (i, jnp.where(p == 0, 0, j), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c2), lambda i, p, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c2), lambda i, p, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, s2, c2), x3.dtype),
            jax.ShapeDtypeStruct((n, 1, c2), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, c2), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((2, c2), jnp.float32)],
    )(xf, gf, gamma2, beta2, mean_t[:, None], rstd_t[:, None], fold)
    dbeta = _fold_host(s1[:, 0], f, c).sum(axis=0)
    dgamma = _fold_host(s2_[:, 0], f, c).sum(axis=0)
    return dx.reshape(n, s, c), dgamma, dbeta


# ------------------------------------------------------------ public op ---

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _in_act(x3, gamma, beta, plan, eps, activation):
    y, _, _ = _fwd_pallas(x3, gamma, beta, plan, eps, activation)
    return y


def _in_act_fwd(x3, gamma, beta, plan, eps, activation):
    y, mean_t, rstd_t = _fwd_pallas(x3, gamma, beta, plan, eps, activation)
    return y, (x3, gamma, beta, mean_t, rstd_t)


def _in_act_bwd(plan, eps, activation, res, g):
    x3, gamma, beta, mean_t, rstd_t = res
    dx, dgamma, dbeta = _bwd_pallas(
        x3, g, gamma, beta, mean_t, rstd_t, plan, activation
    )
    return dx, dgamma.astype(gamma.dtype), dbeta.astype(beta.dtype)


_in_act.defvjp(_in_act_fwd, _in_act_bwd)


def instance_norm_act_pallas(
    x: jnp.ndarray,
    scale: Optional[jnp.ndarray],
    bias: Optional[jnp.ndarray],
    *,
    eps: float = 1e-5,
    activation: str = "relu",
) -> jnp.ndarray:
    """Fused InstanceNorm3d + activation on NDHWC via the Pallas kernel.

    Falls back to the jnp implementation for unsupported shapes/activations
    (ragged spatial sizes, gelu).
    """
    if not supports(x.shape, activation):
        from .norm import instance_norm_act_jnp

        return instance_norm_act_jnp(x, scale, bias, eps=eps, activation=activation)
    n, d, h, w, c = x.shape
    plan = _plan(x.shape)
    gamma = (scale if scale is not None else jnp.ones((c,))).astype(jnp.float32)
    beta = (bias if bias is not None else jnp.zeros((c,))).astype(jnp.float32)
    x3 = x.reshape(n, d * h * w, c)
    y3 = _in_act(x3, gamma, beta, plan, eps, activation)
    return y3.reshape(n, d, h, w, c)
