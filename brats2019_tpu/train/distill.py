"""Knowledge-distillation trainer (SURVEY.md C18; arXiv:2002.03688 [P] —
the BraTS-2019-specific addition: teacher(-ensemble) soft labels supervise
a student alongside the ground-truth loss).

TPU-first: the teacher ensemble forward runs inside the SAME jitted
shard_map step as the student update (teachers are frozen pytrees closed
over as constants replicated on the mesh), so distillation adds zero host
round-trips — one compiled program per step, identical DP semantics to
train/step.py.

Loss: L = seg_loss(student, y) + kd_weight * T^2 * KL(teacher_T || student_T)
with temperature-T softened distributions, KL averaged over voxels.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from ..configs.presets import TrainConfig
from ..parallel.mesh import MeshEnv
from .loss import segmentation_loss
from .step import TrainStep


@dataclasses.dataclass(frozen=True)
class KDConfig:
    kd_weight: float = 1.0
    temperature: float = 2.0
    # weight of the ground-truth (Dice+CE) term; 0 = pure distillation
    gt_weight: float = 1.0


def kd_loss(
    student_logits: jnp.ndarray,
    teacher_probs_T: jnp.ndarray,
    temperature: float,
) -> jnp.ndarray:
    """KL(teacher_T || student_T), mean over voxels, scaled by T^2."""
    t = temperature
    logp_s = jax.nn.log_softmax(student_logits.astype(jnp.float32) / t, axis=-1)
    kl = jnp.sum(
        teacher_probs_T * (jnp.log(jnp.maximum(teacher_probs_T, 1e-9)) - logp_s),
        axis=-1,
    )
    return (t * t) * jnp.mean(kl)


def ensemble_teacher_probs(
    teacher_apply_fns: Sequence[Callable],
    teacher_params: Sequence,
    x: jnp.ndarray,
    temperature: float,
) -> jnp.ndarray:
    """Mean temperature-softened probabilities over a teacher ensemble."""
    probs = None
    for apply_fn, p in zip(teacher_apply_fns, teacher_params):
        out = apply_fn(p, x)
        if isinstance(out, tuple):
            out = out[0]
        logits = jax.lax.stop_gradient(out).astype(jnp.float32)
        pt = jax.nn.softmax(logits / temperature, axis=-1)
        probs = pt if probs is None else probs + pt
    return probs / len(teacher_params)


def make_kd_train_step(
    student_apply: Callable,
    teacher_apply_fns: Sequence[Callable],
    teacher_params: Sequence,
    cfg: TrainConfig,
    kd: KDConfig,
    env: MeshEnv,
) -> TrainStep:
    """DP shard_map train step with in-graph teacher ensemble supervision.

    Composes train.step.make_train_step with a KD microbatch loss — one
    sampling/accumulation/pmean implementation for both trainers, so the KD
    path inherits grad_accum_steps and any future step machinery.
    """
    from .step import make_train_step

    def kd_microbatch_loss(params, imgs, segs):
        # teacher forward carries no gradient (stop_gradient inside
        # ensemble_teacher_probs); one student forward serves both terms
        t_probs = ensemble_teacher_probs(
            teacher_apply_fns, teacher_params, imgs, kd.temperature
        )
        out = student_apply(params, imgs)
        logits, aux_logits = out if isinstance(out, tuple) else (out, None)
        gt_loss, aux = segmentation_loss(
            logits,
            segs,
            dice_weight=cfg.dice_weight,
            ce_weight=cfg.ce_weight,
            region_weight=cfg.region_weight,
            aux_logits=aux_logits,
            aux_weight=cfg.deep_supervision_weight,
        )
        l_kd = kd_loss(logits, t_probs, kd.temperature)
        total = kd.gt_weight * gt_loss + kd.kd_weight * l_kd
        aux = dict(aux, kd_loss=l_kd, loss=total)
        return total, aux

    return make_train_step(
        student_apply, cfg, env, microbatch_loss=kd_microbatch_loss
    )
