"""Mosaic capability probes for the Winograd kernel design space.

Each probe is a minimal pallas_call exercising ONE op the VMEM-resident
Winograd kernel (ops/pallas_winograd.py) wants to use, at flagship-like
minor dims (tw=32/33 sublanes, ci=64 lanes, bf16). PASS/FAIL decides the
kernel's data layout:

  P1 collapse-cast   (tdb,thb,tw,ci) -> (t_rows,ci) before the MXU dot
  P2 lane-slice      x[..., 0:64] / x[..., 64:128] of a 128-lane reg
  P3 sublane-slice   x[:, 0:tw] / x[:, 1:tw+1] of (tw+1, ci), bf16+f32
  P4 halo-DMA        HBM memref_slice along MAJOR dims with full minor
                     dims (tw+1=33, ci=64) that are tile-PADDED
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def report(name, fn):
    try:
        ok, detail = fn()
        print(f"{name}: {'PASS' if ok else 'WRONG'} {detail}", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")
        key = next((l for l in msg if "unsupported" in l.lower()
                    or "error" in l.lower()), msg[0] if msg else "")
        print(f"{name}: FAIL {type(e).__name__}: {key[:160]}", flush=True)


def p1_collapse():
    tdb, thb, tw, ci, co = 2, 4, 32, 64, 64

    def kernel(x_ref, u_ref, o_ref):
        v = x_ref[:].reshape(tdb * thb * tw, ci)
        o_ref[:] = jnp.dot(v, u_ref[:], preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)

    x = jax.random.normal(jax.random.PRNGKey(0), (tdb, thb, tw, ci),
                          jnp.bfloat16)
    u = jax.random.normal(jax.random.PRNGKey(1), (ci, co), jnp.bfloat16)
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((tdb * thb * tw, co), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, u)
    ref = jnp.dot(x.reshape(-1, ci).astype(jnp.float32),
                  u.astype(jnp.float32))
    err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - ref)))
    return err < 0.1, f"err={err:.2e}"


def p2_laneslice():
    n, ci = 64, 64

    def kernel(x_ref, o_ref):
        e = x_ref[:, 0:ci]
        o = x_ref[:, ci:2 * ci]
        o_ref[:] = e + o

    x = jax.random.normal(jax.random.PRNGKey(0), (n, 2 * ci), jnp.bfloat16)
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, ci), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    ref = x[:, :ci] + x[:, ci:]
    err = float(jnp.max(jnp.abs((y - ref).astype(jnp.float32))))
    return err == 0.0, f"err={err:.2e}"


def _p3(dtype):
    tw, ci = 32, 64

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:, 0:tw, :] + x_ref[:, 1:tw + 1, :]

    x = jax.random.normal(jax.random.PRNGKey(0), (4, tw + 1, ci), dtype)
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4, tw, ci), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    ref = x[:, :tw] + x[:, 1:]
    err = float(jnp.max(jnp.abs((y - ref).astype(jnp.float32))))
    return err == 0.0, f"err={err:.2e}"


def p4_halodma():
    # x (B, 8, td+1, th+1, tw+1, ci): slice dims 0/2/3 only, minors full.
    B, td, th, tw, ci = 2, 8, 8, 32, 64
    tdb, thb = 2, 4

    def kernel(x_ref, o_ref, blk, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        dma = pltpu.make_async_copy(
            x_ref.at[0, :, pl.ds(i * tdb, tdb + 1),
                     pl.ds(j * thb, thb + 1), :, :],
            blk, sem)
        dma.start()
        dma.wait()
        o_ref[:] = blk[:, 0:tdb, 0:thb, 0:tw, :] + 1.0

    x = jax.random.normal(
        jax.random.PRNGKey(0), (B, 8, td + 1, th + 1, tw + 1, ci),
        jnp.bfloat16)
    y = pl.pallas_call(
        kernel,
        grid=(td // tdb, th // thb),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (8, tdb, thb, tw, ci),
            lambda i, j: (0, i, j, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, td, th, tw, ci), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((8, tdb + 1, thb + 1, tw + 1, ci), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(x)
    ref = (x[0, :, :td, :th, :tw] + 1.0).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - ref)))
    return err == 0.0, f"err={err:.2e}"


def main():
    print("devices:", jax.devices(), flush=True)
    report("P1 collapse-cast ", p1_collapse)
    report("P2 lane-slice    ", p2_laneslice)
    report("P3 sublane bf16  ", functools.partial(_p3, jnp.bfloat16))
    report("P3 sublane f32   ", functools.partial(_p3, jnp.float32))
    report("P4 halo-DMA      ", p4_halodma)


if __name__ == "__main__":
    main()
