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
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..configs.presets import TrainConfig
from ..parallel.mesh import DATA_AXIS, MeshEnv
from .loss import segmentation_loss
from .step import TrainStep, make_optimizer


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

    Same pool/batch contract as train.step.make_train_step.
    """
    from .step import make_train_step  # reuse the sampling machinery

    tx = make_optimizer(cfg)
    # borrow the sampling closure by constructing a bare step and rebuilding
    # the loss; simpler: re-implement the local step inline with sampling
    from ..data.augment import augment
    from ..data.sampling import sample_patch_impl

    def sample_local_batch(step, pool_img, pool_seg, fg_tables):
        key = jax.random.PRNGKey(cfg.seed)
        key = jax.random.fold_in(key, step)
        key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        keys = jax.random.split(key, cfg.batch_per_device)

        def sample_one(k):
            k_case, k_patch, k_aug = jax.random.split(k, 3)
            ci = jax.random.randint(k_case, (), 0, pool_img.shape[0])
            img = jax.lax.dynamic_index_in_dim(pool_img, ci, keepdims=False)
            seg = jax.lax.dynamic_index_in_dim(pool_seg, ci, keepdims=False)
            fg = jax.lax.dynamic_index_in_dim(fg_tables, ci, keepdims=False)
            pi, ps = sample_patch_impl(k_patch, img, seg, cfg.patch, fg, cfg.fg_prob)
            if cfg.augment:
                pi, ps = augment(
                    k_aug, pi, ps,
                    scale_range=cfg.intensity_scale,
                    shift_range=cfg.intensity_shift,
                )
            return pi, ps

        return jax.vmap(sample_one)(keys)

    def local_step(params, opt_state, pool_img, pool_seg, fg_tables, step):
        imgs, segs = sample_local_batch(step, pool_img, pool_seg, fg_tables)
        segs = segs.astype(jnp.int32)
        t_probs = ensemble_teacher_probs(
            teacher_apply_fns, teacher_params, imgs, kd.temperature
        )

        def loss_fn(p):
            out = student_apply(p, imgs)
            logits, aux_logits = out if isinstance(out, tuple) else (out, None)
            gt_loss, aux = segmentation_loss(
                logits, segs, dice_weight=cfg.dice_weight, ce_weight=cfg.ce_weight,
                region_weight=cfg.region_weight,
                aux_logits=aux_logits, aux_weight=cfg.deep_supervision_weight,
            )
            l_kd = kd_loss(logits, t_probs, kd.temperature)
            total = kd.gt_weight * gt_loss + kd.kd_weight * l_kd
            aux = dict(aux, kd_loss=l_kd, loss=total)
            return total, aux

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        aux = jax.lax.pmean(aux, DATA_AXIS)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        aux = dict(aux, grad_norm=optax.global_norm(grads))
        return new_params, new_opt, aux

    sharded = jax.shard_map(
        local_step,
        mesh=env.mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    repl = NamedSharding(env.mesh, P())
    fn = jax.jit(sharded, donate_argnums=(0, 1), out_shardings=(repl, repl, repl))
    return TrainStep(fn=fn, tx=tx)
