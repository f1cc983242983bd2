"""Soft Dice (+ cross-entropy) loss (SURVEY.md C9).

Both Lachinov papers use Dice-family losses [P]; we use mean soft Dice over
the non-background classes plus a cross-entropy term — the standard robust
mix for BraTS (also nnU-Net's default, arXiv:1809.10486). All reductions in
fp32.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def soft_dice_loss(
    logits: jnp.ndarray,          # (N, D, H, W, K)
    labels: jnp.ndarray,          # (N, D, H, W) int
    *,
    include_background: bool = False,
    eps: float = 1e-5,
) -> jnp.ndarray:
    k = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(labels, k, dtype=jnp.float32)
    red = tuple(range(1, logits.ndim - 1))  # spatial
    inter = jnp.sum(probs * onehot, axis=red)          # (N, K)
    denom = jnp.sum(probs + onehot, axis=red)          # (N, K)
    dice = (2.0 * inter + eps) / (denom + eps)         # (N, K)
    if not include_background:
        dice = dice[:, 1:]
    return 1.0 - jnp.mean(dice)


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    k = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, k, dtype=jnp.float32)
    return -jnp.mean(jnp.sum(onehot * logp, axis=-1))


def segmentation_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    dice_weight: float = 1.0,
    ce_weight: float = 1.0,
) -> Tuple[jnp.ndarray, dict]:
    d = soft_dice_loss(logits, labels)
    ce = cross_entropy_loss(logits, labels)
    loss = dice_weight * d + ce_weight * ce
    return loss, {"loss": loss, "dice_loss": d, "ce_loss": ce}
