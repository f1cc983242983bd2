"""Fused InstanceNorm + activation (SURVEY.md N2).

The reference runs ATen ``instance_norm`` followed by a separate activation
(two kernels, extra HBM round-trips). Here the op is a single fused primitive
with two backends:

* ``jnp``   — masked/plain reductions; XLA fuses normalize+scale+act into the
  surrounding graph. Always available; the correctness oracle.
* ``pallas`` — a single-pass TPU kernel (see ``brats2019_tpu.ops.pallas_norm``)
  that computes per-(n, c) statistics and writes the activated output in one
  HBM read + one HBM write.

Layout is NDHWC: reduction axes are the spatial (1, 2, 3); statistics are
per (batch, channel) — that is InstanceNorm3d semantics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_BACKEND = "jnp"  # flipped to "pallas" once the kernel lands / by config


def set_backend(name: str) -> None:
    global _BACKEND
    assert name in ("jnp", "pallas")
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND


def _act(x: jnp.ndarray, activation: str) -> jnp.ndarray:
    if activation == "relu":
        return jax.nn.relu(x)
    if activation == "leaky_relu":
        return jax.nn.leaky_relu(x, negative_slope=0.01)
    if activation == "gelu":
        return jax.nn.gelu(x)
    if activation == "none":
        return x
    raise ValueError(f"unknown activation {activation}")


def instance_norm_act_jnp(
    x: jnp.ndarray,
    scale: Optional[jnp.ndarray],
    bias: Optional[jnp.ndarray],
    *,
    eps: float = 1e-5,
    activation: str = "relu",
) -> jnp.ndarray:
    """x: (N, D, H, W, C); scale/bias: (C,) or None."""
    red = tuple(range(1, x.ndim - 1))
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=red, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=red, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        y = y * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return _act(y, activation).astype(x.dtype)


def instance_norm_act(
    x: jnp.ndarray,
    scale: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    *,
    eps: float = 1e-5,
    activation: str = "relu",
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """Fused InstanceNorm3d + activation. NDHWC; stats per (N, C)."""
    b = backend or _BACKEND
    if b == "pallas":
        from .pallas_norm import instance_norm_act_pallas

        return instance_norm_act_pallas(
            x, scale, bias, eps=eps, activation=activation
        )
    return instance_norm_act_jnp(x, scale, bias, eps=eps, activation=activation)
