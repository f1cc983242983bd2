"""BraTS region Dice metrics: WT / TC / ET (SURVEY.md C11, [B]).

Operates on *internal* labels {0,1,2,3} (3 = ET). Region definitions:
  WT = {1, 2, 3}, TC = {1, 3}, ET = {3}.

Both a jnp (on-device, e.g. validation inside the train loop) and a NumPy
(host, e.g. the predict CLI / tests oracle) implementation.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

REGIONS = {
    "WT": (1, 2, 3),
    "TC": (1, 3),
    "ET": (3,),
}


def _region_mask(labels, classes, xp):
    m = xp.zeros(labels.shape, dtype=bool)
    for c in classes:
        m = m | (labels == c)
    return m


def _binary_dice(pred, gt, xp):
    inter = xp.sum(pred & gt)
    denom = xp.sum(pred) + xp.sum(gt)
    # empty-vs-empty counts as perfect (BraTS online evaluator convention)
    if xp is jnp:
        return xp.where(denom == 0, 1.0, (2.0 * inter) / xp.maximum(denom, 1))
    return 1.0 if denom == 0 else float(2.0 * inter / denom)


def region_dice_np(pred: np.ndarray, gt: np.ndarray) -> Dict[str, float]:
    out = {}
    for name, classes in REGIONS.items():
        p = _region_mask(pred, classes, np)
        g = _region_mask(gt, classes, np)
        out[name] = _binary_dice(p, g, np)
    return out


def region_dice(pred: jnp.ndarray, gt: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """jit-able region Dice on internal labels."""
    out = {}
    for name, classes in REGIONS.items():
        p = _region_mask(pred, classes, jnp)
        g = _region_mask(gt, classes, jnp)
        out[name] = _binary_dice(p, g, jnp)
    return out
