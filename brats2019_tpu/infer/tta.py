"""8-way flip test-time augmentation (SURVEY.md C15).

The reference loops the 2^3 axis-flip combinations per tile on the host and
averages un-flipped probability maps. TPU-first: all 8 variants are stacked
into one batch of 8 so a single conv3d forward fills the MXU; flips compile
to free layout reversals. Flip set and averaging order are fixed so results
are deterministic (SURVEY.md §7.3.4 mask-parity note).
"""

from __future__ import annotations

import itertools
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

# all 8 combinations, identity first; order is part of the spec
FLIPS: Tuple[Tuple[bool, bool, bool], ...] = tuple(
    itertools.product((False, True), repeat=3)
)


def flip_volume(x: jnp.ndarray, flags: Sequence[bool]) -> jnp.ndarray:
    """Flip spatial axes 0..2 of (X, Y, Z, C) where flags are set."""
    axes = [ax for ax, f in enumerate(flags) if f]
    return jnp.flip(x, axis=axes) if axes else x


def tta_probs(
    apply_fn: Callable,
    params,
    tile: jnp.ndarray,
    enabled: bool = True,
    precision: str = "float32",
) -> jnp.ndarray:
    """Mean softmax probabilities over the 8 flip variants of one tile.

    apply_fn(params, batch (N,X,Y,Z,C)) -> logits (N,X,Y,Z,K).

    precision="bfloat16" stores the flipped inputs and per-flip probability
    maps in bf16 (softmax itself is f32, the 8-way mean accumulates in f32).
    The small-C channel-minor f32 tensors around the flips are the measured
    hot spot on TPU (259 ms -> 110 ms per 128^3 tile, max prob delta ~1e-3;
    PERF.md) — bf16 is the default in InferenceConfig; use float32 for
    bit-parity testing.
    """
    if not enabled:
        logits = apply_fn(params, tile[None])[0]
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    store_dt = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    tiles = tta_stack(tile, precision)
    logits = apply_fn(params, tiles)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return tta_reduce(probs.astype(store_dt))


def tta_stack(tile: jnp.ndarray, precision: str = "float32") -> jnp.ndarray:
    """The 8 flip variants of one tile, stacked into a batch of 8.

    TPU layout note (PERF.md "TTA flip layout"): a spatial-permutation
    producer (lax.rev OR gather) poisons the layout of everything
    downstream — the SAME b8 forward measures 81 ms from a canonically
    laid-out input and 104 ms from a flip-stack, and optimization_barrier
    does not stop layout propagation. The barrier below still buys ~25 ms
    vs letting the reverses fuse into the first conv (129 -> 104 ms
    standalone); the full fix is a jit boundary between the stack and the
    forward (jit RESULTS get the canonical layout) — models/cascade.py
    splits the single-tile cascade predict program exactly there."""
    store_dt = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    tile = tile.astype(store_dt)
    tiles = jnp.stack([flip_volume(tile, f) for f in FLIPS])
    return jax.lax.optimization_barrier(tiles)


def tta_reduce(probs: jnp.ndarray) -> jnp.ndarray:
    """Un-flip the per-variant probability maps and average (f32 acc)."""
    acc = jnp.zeros(probs.shape[1:], jnp.float32)
    for i, f in enumerate(FLIPS):
        acc = acc + flip_volume(probs[i], f).astype(jnp.float32)
    return acc * (1.0 / len(FLIPS))
