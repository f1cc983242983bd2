"""Pallas/Mosaic direct 3^3 conv3d for NDHWC volumes (SURVEY.md N2's
"real fusion target" precursor; VERDICT round-2 #3).

Why a custom conv at all: XLA:TPU's conv3d reaches only ~30 TFLOP/s at
the flagship encoder shape (8, 64^3, 32->64 bf16) and ~53 at 64->64 —
and no XLA-level reformulation does better (tools/exp_convreform.py:
3x-conv2d decomposition 28.5 TFLOP/s, shifted-dot forms HBM-bound).

Design (kw folded into the contraction, built OUTSIDE the kernel):

  host/XLA side: xcat[b, d, h, w, kw*CI + ci] = xpad[b, d, h, w+kw, ci],
  zero-padded in the lane dim to Kp = roundup(3*CI, 128). The kw tap
  shift becomes contraction depth, so the kernel needs NO sublane
  shifts/rotates (Mosaic's rotate is 32-bit-only and its DMA slices must
  be lane/sublane aligned — both bit earlier iterations of this kernel).

  kernel grid (B, D, H/8): DMA the (3, 10, W, Kp) input block, then per
  (kd, kh) ONE full-depth MXU matmul (8*W rows, Kp) @ (Kp, CO) with f32
  accumulation — 9 dots per output block, one bf16 store.

Covers stride-1 SAME 3^3 convs with H % 8 == 0 and W % 8 == 0 — the
shapes of every conv in the flagship s2d U-Net. Numerics: bf16 inputs,
f32 accumulation, same contraction set as XLA's conv (order differs
within the 9-way tap sum).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H_BLK = 8
D_BLK = 8


def _kernel(w9_ref, xcat_ref, out_ref, xblk, sem):
    b = pl.program_id(0)
    db = pl.program_id(1)
    hb = pl.program_id(2)
    W = out_ref.shape[3]
    CO = out_ref.shape[4]
    Kp = xblk.shape[3]

    dma = pltpu.make_async_copy(
        xcat_ref.at[
            b, pl.ds(db * D_BLK, D_BLK + 2),
            pl.ds(hb * H_BLK, H_BLK + 2), :, :,
        ],
        xblk,
        sem,
    )
    dma.start()
    dma.wait()

    w9 = w9_ref[:]  # (9*Kp, CO)
    for do in range(D_BLK):
        # one K=9*Kp matmul per depth plane: the 9 tap operands are major-
        # dim slices (offset-0 vreg layouts), so the lane concat is legal,
        # and a single dot lets the MXU pipeline the K tiles with the
        # accumulator on-chip instead of 9 VMEM round-trips of the f32 acc
        xop = jnp.concatenate(
            [
                xblk[do + kd, kh:kh + H_BLK].reshape(H_BLK * W, Kp)
                for kd in range(3)
                for kh in range(3)
            ],
            axis=-1,
        )  # (H_BLK*W, 9*Kp)
        acc = jnp.dot(xop, w9, preferred_element_type=jnp.float32)
        out_ref[0, do] = acc.reshape(H_BLK, W, CO).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv3d_pallas(
    x: jnp.ndarray, w: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """SAME stride-1 conv3d, x (B, D, H, W, CI) bf16, w (3,3,3,CI,CO).

    Constraints: H % 8 == 0 and W % 8 == 0. Returns (B, D, H, W, CO) in
    x.dtype with f32 accumulation.
    """
    B, D, H, W, CI = x.shape
    k0, k1, k2, wCI, CO = w.shape
    assert (k0, k1, k2) == (3, 3, 3) and wCI == CI
    assert H % H_BLK == 0 and W % 8 == 0 and D % D_BLK == 0, (D, H, W)

    Kp = -(-(3 * CI) // 128) * 128
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    # xcat[..., w, kw*CI+ci] = xpad[..., w+kw, ci], lane-padded to Kp
    parts = [xpad[:, :, :, kw:kw + W, :] for kw in range(3)]
    if Kp > 3 * CI:
        parts.append(
            jnp.zeros(xpad.shape[:3] + (W, Kp - 3 * CI), x.dtype)
        )
    xcat = jnp.concatenate(parts, axis=-1)

    # W9[(kd*3+kh)*Kp + kw*CI+ci, co] (zero rows in the lane padding),
    # flat so the kernel's single K=9*Kp dot consumes it directly
    w9 = w.reshape(3, 3, 3 * CI, CO).astype(x.dtype)
    w9 = jnp.pad(w9, ((0, 0), (0, 0), (0, Kp - 3 * CI), (0, 0)))
    w9 = w9.reshape(9 * Kp, CO)

    grid = (B, D // D_BLK, H // H_BLK)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w9, replicated
            pl.BlockSpec(memory_space=pl.ANY),       # xcat, DMA'd
        ],
        out_specs=pl.BlockSpec(
            (1, D_BLK, H_BLK, W, CO),
            lambda b, db, hb: (b, db, hb, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, D, H, W, CO), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((D_BLK + 2, H_BLK + 2, W, Kp), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(w9, xcat)
    return out
