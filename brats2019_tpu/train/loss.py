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


# BraTS evaluation regions over internal classes (see train/metrics.py)
_REGION_CLASSES = ((1, 2, 3), (1, 3), (3,))  # WT, TC, ET


def region_soft_dice_loss(
    logits: jnp.ndarray, labels: jnp.ndarray, eps: float = 1e-5
) -> jnp.ndarray:
    """Soft Dice on the WT/TC/ET region probabilities (sums of class
    softmax) — trains the exact quantities BraTS scores on (common winning
    trick for this family)."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    red = tuple(range(1, logits.ndim - 1))
    total = 0.0
    for classes in _REGION_CLASSES:
        p = sum(probs[..., c] for c in classes)
        g = sum((labels == c).astype(jnp.float32) for c in classes)
        inter = jnp.sum(p * g, axis=red)
        denom = jnp.sum(p + g, axis=red)
        total = total + (1.0 - jnp.mean((2 * inter + eps) / (denom + eps)))
    return total / len(_REGION_CLASSES)


def blockify_labels(labels: jnp.ndarray, r: int) -> jnp.ndarray:
    """(N, D, H, W) int labels -> (N, D/r, H/r, W/r, r, r, r) s2d block
    form, matching the PRE-depth-to-space head output's channel structure
    (models/unet3d.py ``subpixel=False``)."""
    n, D, H, W = labels.shape
    x = labels.reshape(n, D // r, r, H // r, r, W // r, r)
    return x.transpose(0, 1, 3, 5, 2, 4, 6)


def segmentation_loss_lowres(
    logits_lr: jnp.ndarray,   # (N, D/r, H/r, W/r, K*r^3) pre-d2s head output
    labels: jnp.ndarray,      # (N, D, H, W) int
    r: int,
    **kwargs,
) -> Tuple[jnp.ndarray, dict]:
    """segmentation_loss computed on the PRE-depth-to-space head output:
    logits reshaped to (N, d, h, w, r, r, r, K) and labels block-reshaped.
    Same loss value as the full-res form (verified to 0 diff on TPU) but
    the softmax/one-hot passes run on (K*r^3)-channel-minor tensors —
    ~2.4 ms/step cheaper on v5e (PERF.md round 3, the same VPU-packing
    argument as the inference low-res TTA reduce). Deep-supervision aux
    logits are NOT supported here (their label downsampling assumes
    full-res labels) — callers keep the full-res path when aux heads are
    on."""
    n, d, h, w, kr3 = logits_lr.shape
    k = kr3 // (r ** 3)
    lb = logits_lr.reshape(n, d, h, w, r, r, r, k)
    return segmentation_loss(lb, blockify_labels(labels, r), **kwargs)


def _downsample_labels(labels: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Stride-subsample integer labels (center offset), per aux-head scale."""
    o = factor // 2
    return labels[:, o::factor, o::factor, o::factor]


def segmentation_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    dice_weight: float = 1.0,
    ce_weight: float = 1.0,
    region_weight: float = 0.0,
    aux_logits: Optional[Tuple[jnp.ndarray, ...]] = None,
    aux_weight: float = 0.5,
) -> Tuple[jnp.ndarray, dict]:
    """Dice(+CE) loss with optional region-Dice term and deep supervision.

    aux_logits: lower-resolution decoder heads; each is scored against
    stride-subsampled labels with geometrically decaying weights
    (aux_weight^depth), normalized so the total loss scale is stable.
    """
    d = soft_dice_loss(logits, labels)
    ce = cross_entropy_loss(logits, labels)
    loss = dice_weight * d + ce_weight * ce
    aux = {"dice_loss": d, "ce_loss": ce}
    if region_weight > 0.0:
        r = region_soft_dice_loss(logits, labels)
        loss = loss + region_weight * r
        aux["region_dice_loss"] = r
    if aux_logits:
        # sort shallow (highest resolution) first so weights decay with depth
        ordered = sorted(aux_logits, key=lambda al: -al.shape[1])
        w_total = 1.0
        acc = loss
        w = 1.0
        for al in ordered:
            factor = labels.shape[1] // al.shape[1]
            yl = _downsample_labels(labels, factor)
            w = w * aux_weight
            al_loss = (
                dice_weight * soft_dice_loss(al, yl)
                + ce_weight * cross_entropy_loss(al, yl)
            )
            acc = acc + w * al_loss
            w_total += w
        loss = acc / w_total
    aux["loss"] = loss
    return loss, aux
