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
block, transform a compact input block on the VPU, run the 64 per-point
(T, Ci) @ (Ci, Co) MXU dots with f32 accumulation, inverse-transform,
and write. MAC count is 27/8 = 3.375x below direct conv, so the quarter-
MXU core dot (K = N = 64) still has a 2-3x direct-equivalent ceiling
over the emitter at the 64-channel L0 shapes where the flagship forward
spends ~35 of its ~85 ms.

Decomposition (exact, matches ``lax.conv_general_dilated`` SAME stride-1
cross-correlation):

  y = A^T [ (G g G^T ..) .*. (B^T d B ..) ] A ..     per 2^3 output tile

with F(2,3)'s transform matrices exact in binary fp (entries 0, +-1,
+-0.5), so numerics stay in the direct bf16-conv rounding class.

Host/XLA side does ONLY two cheap relayouts:
  * input: pad by 1 and split into the 8 stride-2 phase lattices
    (x8 shape (B, 8, Td+1, Th+1, Tw+1, Ci) — ~1.1x the input, NOT the
    8x tiled tensor), so every in-kernel tap is a unit-offset slice;
  * output: a bitcast reshape (B, Td, 2, Th, 2, Tw, 2, Co) -> NDHWC
    (contiguous dims only — free), so the kernel writes phase planes
    with static indices and no strided stores exist anywhere.

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


def transform_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,3,Ci,Co) -> (64, Ci, Co): U[p] = (G x G x G) g, f32 in/out."""
    g = jnp.asarray(_G)
    u = jnp.einsum("pa,qb,rc,abcio->pqrio", g, g, g, w.astype(jnp.float32))
    return u.reshape(64, w.shape[3], w.shape[4])


def _bt4(x0, x1, x2, x3):
    """B^T along one axis: 4 taps -> 4 Winograd points (1 add each)."""
    return (x0 - x2, x1 + x2, x2 - x1, x1 - x3)


def _at2(m0, m1, m2, m3):
    """A^T along one axis: 4 points -> 2 output phases."""
    return (m0 + m1 + m2, m1 - m2 - m3)


def _kernel(u_ref, x8_ref, out_ref, xblk, sem, *, tdb, thb, tw, ci, co,
            m_dtype):
    b = pl.program_id(0)
    ib = pl.program_id(1)
    jb = pl.program_id(2)

    dma = pltpu.make_async_copy(
        x8_ref.at[b, :, pl.ds(ib * tdb, tdb + 1),
                  pl.ds(jb * thb, thb + 1), :, :],
        xblk,
        sem,
    )
    dma.start()
    dma.wait()

    # ---- input transform: 8 phase blocks -> 64 point blocks (VPU) ----
    # Taps along an axis at tile t are (e[t], o[t], e[t+1], o[t+1]) of
    # that axis' even/odd phase lattices — unit-offset slices only.
    # stage D: (pd in 8ph) -> a[4][ph][pw], each (tdb, thb+1, tw+1, ci)
    a = [[[None] * 2 for _ in range(2)] for _ in range(4)]
    for ph in range(2):
        for pw in range(2):
            e = xblk[0 * 4 + ph * 2 + pw]  # pd=0 (even)
            o = xblk[1 * 4 + ph * 2 + pw]  # pd=1 (odd)
            res = _bt4(e[:tdb], o[:tdb], e[1:tdb + 1], o[1:tdb + 1])
            for p, v in enumerate(res):
                a[p][ph][pw] = v
    # stage H: -> bb[4][4][pw], each (tdb, thb, tw+1, ci)
    bb = [[[None] * 2 for _ in range(4)] for _ in range(4)]
    for pd in range(4):
        for pw in range(2):
            e = a[pd][0][pw]
            o = a[pd][1][pw]
            res = _bt4(e[:, :thb], o[:, :thb],
                       e[:, 1:thb + 1], o[:, 1:thb + 1])
            for q, v in enumerate(res):
                bb[pd][q][pw] = v
    # stage W + the per-point MXU dot: V (T, ci) @ U[p] (ci, co) -> M f32
    t_rows = tdb * thb * tw
    m = [[[None] * 4 for _ in range(4)] for _ in range(4)]
    for pd in range(4):
        for ph in range(4):
            e = bb[pd][ph][0]
            o = bb[pd][ph][1]
            res = _bt4(e[:, :, :tw], o[:, :, :tw],
                       e[:, :, 1:tw + 1], o[:, :, 1:tw + 1])
            for r, v in enumerate(res):
                p = pd * 16 + ph * 4 + r
                vp = v.reshape(t_rows, ci)
                m[pd][ph][r] = jnp.dot(
                    vp, u_ref[p], preferred_element_type=jnp.float32
                ).astype(m_dtype)

    # ---- inverse transform: 64 -> 8 output phase planes (VPU) ----
    # stage D: 64 -> 32
    s1 = [[[None] * 4 for _ in range(4)] for _ in range(2)]
    for ph in range(4):
        for pw in range(4):
            res = _at2(m[0][ph][pw], m[1][ph][pw],
                       m[2][ph][pw], m[3][ph][pw])
            for sd, v in enumerate(res):
                s1[sd][ph][pw] = v
    # stage H: 32 -> 16
    s2 = [[[None] * 4 for _ in range(2)] for _ in range(2)]
    for sd in range(2):
        for pw in range(4):
            res = _at2(s1[sd][0][pw], s1[sd][1][pw],
                       s1[sd][2][pw], s1[sd][3][pw])
            for sh, v in enumerate(res):
                s2[sd][sh][pw] = v
    # stage W: 16 -> 8, then write the phase plane (static indices; the
    # caller's free reshape interleaves them back into NDHWC)
    for sd in range(2):
        for sh in range(2):
            res = _at2(s2[sd][sh][0], s2[sd][sh][1],
                       s2[sd][sh][2], s2[sd][sh][3])
            for sw, v in enumerate(res):
                y = v.reshape(tdb, thb, tw, co)
                out_ref[0, :, sd, :, sh, :, sw, :] = y.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("tdb", "thb", "m_bf16", "interpret"),
)
def conv3d_winograd(
    x: jnp.ndarray,
    w: jnp.ndarray,
    *,
    tdb: int = 1,
    thb: int = 8,
    m_bf16: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """SAME stride-1 3^3 conv, x (B, D, H, W, Ci) bf16, w (3,3,3,Ci,Co).

    Constraints: D % (2*tdb) == 0, H % (2*thb) == 0, W even — satisfied
    by every conv in the flagship s2d U-Net. f32 accumulation in the
    core dot; ``m_bf16`` stores the transformed product bf16 to halve
    VMEM/VPU cost of the inverse at one rounding step of extra error.
    """
    B, D, H, W, Ci = x.shape
    k0, k1, k2, wCI, Co = w.shape
    assert (k0, k1, k2) == (3, 3, 3) and wCI == Ci, (w.shape, x.shape)
    assert D % (2 * tdb) == 0 and H % (2 * thb) == 0 and W % 2 == 0, (
        (D, H, W), (tdb, thb))
    td, th, tw = D // 2, H // 2, W // 2

    u = transform_weights(w).astype(x.dtype)

    # Phase-split relayout: x8[b, pd*4+ph*2+pw, i, j, k, c]
    #   = xpad[b, 2i+pd, 2j+ph, 2k+pw, c]   (~1.1x input, one transpose)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    x8 = (
        xp.reshape(B, td + 1, 2, th + 1, 2, tw + 1, 2, Ci)
        .transpose(0, 2, 4, 6, 1, 3, 5, 7)
        .reshape(B, 8, td + 1, th + 1, tw + 1, Ci)
    )

    grid = (B, td // tdb, th // thb)
    m_dtype = jnp.bfloat16 if m_bf16 else jnp.float32
    kernel = functools.partial(
        _kernel, tdb=tdb, thb=thb, tw=tw, ci=Ci, co=Co, m_dtype=m_dtype)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # U, replicated
            pl.BlockSpec(memory_space=pl.ANY),      # x8, halo-DMA'd
        ],
        out_specs=pl.BlockSpec(
            (1, tdb, 2, thb, 2, tw, 2, Co),
            lambda b, i, j: (b, i, 0, j, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B, td, 2, th, 2, tw, 2, Co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((8, tdb + 1, thb + 1, tw + 1, Ci), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(u, x8)
    # Contiguous-dims-only reshape: a bitcast, not a relayout.
    return out.reshape(B, D, H, W, Co)
