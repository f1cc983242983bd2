"""Pallas/Mosaic Winograd F(2x2x2, 3x3x3) conv3d — the VMEM-resident form.

Why this exists (the measured chain that leads here, PERF.md):

* XLA's conv emitter is the conv floor reachable from JAX: 29-53 TF/s at
  the dominant flagship shapes, while plain MXU dots hit ~184 TF/s.
* A direct Pallas conv loses ~2x to that emitter (structural: the
  dot-only MXU interface forces ~9x VMEM operand amplification across
  the 27 taps — PERF.md "Mosaic direct conv3d").
* Winograd F(2,3) via XLA loses 10-20x (the 64-point V/M tensors are 8x
  the input and get materialized in HBM — PERF.md "Winograd via XLA").

The one remaining formulation keeps V/M **VMEM-resident**: per grid
step, transform one d-tile-plane slab on the VPU, run the 64 per-point
(T, Ci) @ (Ci, Co) MXU dots with f32 accumulation, inverse-transform by
sign-only accumulation (A^T entries are 0/+-1), and write. MAC count is
27/8 = 3.375x below direct conv, so the quarter-MXU core dot (K=N=64)
still has a 2-3x direct-equivalent ceiling over the emitter at the
64-channel L0 shapes where the flagship forward spends ~35 of its ~85 ms.

Decomposition (exact, matches ``lax.conv_general_dilated`` SAME stride-1
cross-correlation):

  y = A^T [ (G g G^T..) .*. (B^T d B..) ] A..     per 2^3 output tile

with F(2,3)'s matrices exact in binary fp (entries 0, +-1, +-0.5), so
numerics stay in the direct bf16-conv rounding class.

Layout strategy (driven by the Mosaic capability probes in
tools/exp_mosaic_probe.py — collapse-cast, lane-slice and sublane-slice
all compile; halo memref_slice DMA does not):

* XLA side pads by 1 and splits the input into the 8 stride-2 phase
  lattices x8 (B, 8, Td+1, Th+1, Tw+1, Ci) — ~1.1x the input, NOT the
  8x tiled tensor — so every in-kernel tap is a phase pick plus a
  unit-offset slice.
* The kernel grid runs over (batch, d-tile-planes, h-blocks) and
  receives x8 TWICE through plain pipelined BlockSpecs whose index maps
  differ by one d-row (rows i and i+1): the d-axis halo without any
  manual DMA. NOTE this fetches every interior d-row from HBM twice
  (~2.2x input traffic) — the pipeline cannot dedupe across distinct
  operands; PERF.md's TF/s entries for this kernel include that cost.
  H-taps slice a leading dim (free); W-taps are unit-offset sublane
  slices (probe P3).
* The h axis is blocked by ``thb`` h-tiles per grid step because the
  whole-plane slab does NOT fit VMEM at the flagship 64^3 shapes:
  with Ci=32 the measured scoped-vmem demand is 27.4 MB vs the 16 MB
  limit (lane padding of the channel-minor dim to 128 roughly doubles
  every buffer below 128 ch). Overlapping h-windows are not expressible
  as pipelined BlockSpecs (block index maps are block-aligned), so the
  relayout pre-materializes non-overlapping (thb+1)-row windows —
  ~(thb+1)/thb extra input bytes. ``thb=None`` auto-picks the largest
  divisor of Th whose conservative VMEM estimate fits the budget
  (see _pick_thb).
* Output phases live on a LEADING axis of a flat (8, B*Td, Th*Tw, Co)
  result — every store is a contiguous 2D block; one XLA transpose
  interleaves NDHWC. A phase-space consumer (the next Winograd conv)
  can skip that transpose entirely.

Reference parity surface: the 3^3 convs of SURVEY.md C7/N1 (the
reference's cuDNN conv3d path); this kernel is the TPU-native
counterpart on the same dispatch seam as ops/pallas_conv.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# F(2,3) transform matrices (Lavin & Gray 2016). BT/AT are applied as
# hand-unrolled adds in the kernel; G transforms weights XLA-side.
_G = np.array(
    [[1.0, 0.0, 0.0],
     [0.5, 0.5, 0.5],
     [0.5, -0.5, 0.5],
     [0.0, 0.0, 1.0]], np.float32)

# A^T = [[1, 1, 1, 0], [0, 1, -1, -1]]: column p -> [(s, sign), ...].
_AT_TARGETS = ((0, 1),), ((0, 1), (1, 1)), ((0, 1), (1, -1)), ((1, -1),)


def transform_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,3,Ci,Co) -> (64, Ci, Co): U[p] = (G x G x G) g, f32 in/out."""
    g = jnp.asarray(_G)
    u = jnp.einsum("pa,qb,rc,abcio->pqrio", g, g, g, w.astype(jnp.float32))
    return u.reshape(64, w.shape[3], w.shape[4])


def _bt4(x0, x1, x2, x3):
    """B^T along one axis: taps (e[t], o[t], e[t+1], o[t+1]) -> 4 points."""
    return (x0 - x2, x1 + x2, x2 - x1, x1 - x3)


def _vmem_bytes(thb: int, tw: int, ci: int, co: int, acc_bf16: bool) -> int:
    """Conservative scoped-VMEM estimate for one grid step.

    Counts lane padding (channel-minor dims pad to 128) and double
    buffering on the pipelined operands; transform temporaries are
    charged at ~2 input slabs (a_p + bbq + vr live ranges overlap the
    slab scale). Calibration point: the unblocked 64^3/Ci=32 shape
    estimates ~25 MB here vs the compiler's measured 27.44 MB demand.
    """
    lane = 128
    pad = lambda c: -(-c // lane) * lane  # noqa: E731
    slab = 8 * (thb + 1) * (tw + 1) * pad(ci) * 2            # bf16
    acc = 8 * thb * tw * pad(co) * (2 if acc_bf16 else 4)
    out = 8 * thb * tw * pad(co) * 2                          # bf16
    u = 64 * ci * pad(co) * 2
    return 2 * 2 * slab + 2 * slab + acc + 2 * out + u


_VMEM_BUDGET = 14 << 20  # leave ~2 MB of the 16 MB scoped limit as headroom


def _pick_thb(th: int, tw: int, ci: int, co: int, acc_bf16: bool) -> int:
    for thb in range(th, 0, -1):
        if th % thb == 0 and _vmem_bytes(thb, tw, ci, co, acc_bf16) \
                <= _VMEM_BUDGET:
            return thb
    return 1


def _kernel(u_ref, xa_ref, xb_ref, out_ref, *, th, tw, ci, acc_dtype):
    t_rows = th * tw

    # Output-tile accumulators: y[s][e][f], each (t_rows, co). A^T has
    # only 0/+-1 entries, so the whole inverse transform is sign-only
    # accumulation — no multiplies.
    y = [[[None] * 2 for _ in range(2)] for _ in range(2)]

    for p in range(4):
        # ---- D stage: phase picks from the i / i+1 d-rows (no slicing).
        # a_p[(ph, pw)]: (th+1, tw+1, ci)
        a_p = {}
        for ph in range(2):
            for pw in range(2):
                e0 = xa_ref[0, 0 * 4 + ph * 2 + pw, 0, 0]
                o0 = xa_ref[0, 1 * 4 + ph * 2 + pw, 0, 0]
                e1 = xb_ref[0, 0 * 4 + ph * 2 + pw, 0, 0]
                o1 = xb_ref[0, 1 * 4 + ph * 2 + pw, 0, 0]
                a_p[(ph, pw)] = _bt4(e0, o0, e1, o1)[p]
        # ---- H stage: leading-dim unit-offset slices (free).
        # bbq[pw][q]: (th, tw+1, ci)
        bbq = {}
        for pw in range(2):
            e = a_p[(0, pw)]
            o = a_p[(1, pw)]
            bbq[pw] = _bt4(e[:th], o[:th], e[1:th + 1], o[1:th + 1])
        for q in range(4):
            # ---- W stage: sublane unit-offset slices (probe P3).
            e = bbq[0][q]
            o = bbq[1][q]
            vr = _bt4(e[:, :tw], o[:, :tw], e[:, 1:tw + 1], o[:, 1:tw + 1])
            for r in range(4):
                # collapse-cast (probe P1) + the quarter-MXU core dot.
                v = vr[r].reshape(t_rows, ci)
                m = jnp.dot(
                    v, u_ref[p * 16 + q * 4 + r],
                    preferred_element_type=jnp.float32).astype(acc_dtype)
                for sd, sgd in _AT_TARGETS[p]:
                    for sh, sgh in _AT_TARGETS[q]:
                        for sw, sgw in _AT_TARGETS[r]:
                            cur = y[sd][sh][sw]
                            t = m if sgd * sgh * sgw > 0 else -m
                            y[sd][sh][sw] = t if cur is None else cur + t

    for sd in range(2):
        for sh in range(2):
            for sw in range(2):
                out_ref[sd * 4 + sh * 2 + sw, 0] = (
                    y[sd][sh][sw].astype(out_ref.dtype))


@functools.partial(
    jax.jit, static_argnames=("acc_bf16", "interpret", "thb"))
def conv3d_winograd(
    x: jnp.ndarray,
    w: jnp.ndarray,
    *,
    acc_bf16: bool = False,
    interpret: bool = False,
    thb: int | None = None,
) -> jnp.ndarray:
    """SAME stride-1 3^3 conv, x (B, D, H, W, Ci) bf16, w (3,3,3,Ci,Co).

    Requires even D/H/W — satisfied by every conv in the flagship s2d
    U-Net. f32 accumulation in the core dot; ``acc_bf16`` keeps the
    inverse-transform accumulators bf16 to halve their VPU/VMEM cost at
    one extra rounding step. ``thb`` blocks the h axis at thb h-tiles
    (2*thb output rows) per grid step; None auto-picks the largest
    divisor of H/2 that fits the scoped-VMEM budget (the whole plane
    overflows at 64^3: 27.4 MB vs the 16 MB limit).
    """
    B, D, H, W, Ci = x.shape
    k0, k1, k2, wCI, Co = w.shape
    assert (k0, k1, k2) == (3, 3, 3) and wCI == Ci, (w.shape, x.shape)
    assert D % 2 == 0 and H % 2 == 0 and W % 2 == 0, (D, H, W)
    td, th, tw = D // 2, H // 2, W // 2
    if thb is None:
        thb = _pick_thb(th, tw, Ci, Co, acc_bf16)
    assert th % thb == 0, (th, thb)
    nhb = th // thb
    t_rows = th * tw

    u = transform_weights(w).astype(x.dtype)

    # Phase-split relayout: x8[b, pd*4+ph*2+pw, i, j, k, c]
    #   = xpad[b, 2i+pd, 2j+ph, 2k+pw, c]   (~1.1x input, one transpose)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    x8 = (
        xp.reshape(B, td + 1, 2, th + 1, 2, tw + 1, 2, Ci)
        .transpose(0, 2, 4, 6, 1, 3, 5, 7)
        .reshape(B, 8, td + 1, th + 1, tw + 1, Ci)
    )
    # H-blocking: overlapping (thb+1)-row windows are not expressible
    # as block-aligned pipelined BlockSpecs, so materialize them as a
    # new non-overlapping axis ((thb+1)/thb extra input bytes).
    if nhb > 1:
        x8 = jnp.stack(
            [jax.lax.slice_in_dim(x8, jh * thb, jh * thb + thb + 1, axis=3)
             for jh in range(nhb)], axis=3)
    else:
        x8 = x8[:, :, :, None]

    acc_dtype = jnp.bfloat16 if acc_bf16 else jnp.float32
    kernel = functools.partial(
        _kernel, th=thb, tw=tw, ci=Ci, acc_dtype=acc_dtype)
    slab = (1, 8, 1, 1, thb + 1, tw + 1, Ci)
    out = pl.pallas_call(
        kernel,
        grid=(B, td, nhb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # U, replicated
            # The SAME x8 array twice, offset by one d-row: the d-axis
            # halo via plain pipelined BlockSpecs (no manual DMA).
            pl.BlockSpec(slab, lambda b, i, jh: (b, 0, i, jh, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(slab, lambda b, i, jh: (b, 0, i + 1, jh, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (8, 1, thb * tw, Co),
            lambda b, i, jh: (0, b * td + i, jh, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((8, B * td, t_rows, Co), x.dtype),
        interpret=interpret,
    )(u, x8, x8)
    # One XLA transpose interleaves (sd,sh,sw, d-planes, tile rows) back
    # into NDHWC. A phase-space consumer (the next Winograd conv) can
    # skip this entirely and read the phase lattices directly.
    y = out.reshape(2, 2, 2, B, td, th, tw, Co)
    y = y.transpose(3, 4, 0, 5, 1, 6, 2, 7)
    return y.reshape(B, D, H, W, Co)
