"""Training loop orchestration (SURVEY.md C10, C12, C13).

One ``train_stage`` call trains one U-Net stage (the cascade = two calls:
coarse at ``downsample=2``, fine at full resolution — SURVEY.md C8). The
loop is thin by design: all per-step compute is inside the jitted shard_map
step (train/step.py); the host refreshes the case pool, logs, validates, and
checkpoints.
"""

from __future__ import annotations

import dataclasses
import os
import signal
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.presets import ExperimentConfig, TrainConfig
from ..data.case import load_case
from ..data.pipeline import CasePool, prepare_training_case
from ..models.unet3d import UNet3D, UNetConfig
from ..parallel.mesh import MeshEnv, make_mesh
from ..utils.logging import MetricsLogger
from .checkpoint import CheckpointManager
from .metrics import region_dice_np
from .step import make_batched_eval_step, make_optimizer, make_train_step


@dataclasses.dataclass
class StageResult:
    params: object
    final_metrics: Dict[str, float]
    workdir: str
    # True when the stage stopped early on SIGTERM (preemption): a final
    # checkpoint was saved and the run is resumable, but later stages
    # must not start
    preempted: bool = False


def init_stage(
    unet_cfg: UNetConfig, train_cfg: TrainConfig, env: MeshEnv
) -> Tuple[UNet3D, object, object]:
    """Build model + replicated params/opt state on the mesh."""
    model = UNet3D(unet_cfg)
    sample = jnp.zeros((1,) + tuple(train_cfg.patch) + (4,), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(train_cfg.seed), sample,
        deep_outputs=unet_cfg.deep_supervision,
    )
    tx = make_optimizer(train_cfg)
    opt_state = tx.init(params)
    repl = env.replicated()
    params = jax.device_put(params, repl)
    opt_state = jax.device_put(opt_state, repl)
    return model, params, opt_state


def _load_init_params(path: str, params_like):
    """Warm-start source by extension: exported flat params (npz /
    safetensors) or a reference torch state dict (pt/pth). Shapes are
    validated against the stage template either way."""
    if path.endswith((".pt", ".pth")):
        from ..utils.torch_import import import_torch_params, load_torch_state

        loaded, notes = import_torch_params(load_torch_state(path), params_like)
        for n in notes:
            print(f"[init-from] note: {n}", flush=True)
        return loaded
    from .checkpoint import import_params

    return import_params(path, params_like)


def _validate(
    eval_step,
    params,
    val_canvases: List[Dict[str, np.ndarray]],
    n_devices: int = 1,
) -> Dict[str, float]:
    """Validation Dice over canvases, striped across local devices: batches
    of n_devices canvases run in ONE sharded dispatch each (the last batch
    pads by repetition; padded outputs are dropped)."""
    dices = {"WT": [], "TC": [], "ET": []}
    for i0 in range(0, len(val_canvases), n_devices):
        chunk = val_canvases[i0 : i0 + n_devices]
        n_real = len(chunk)
        while len(chunk) < n_devices:  # pad to the mesh size
            chunk = chunk + [chunk[-1]]
        batch = np.stack([c["image"] for c in chunk])
        preds = np.asarray(eval_step(params, jnp.asarray(batch)))
        for j in range(n_real):
            d = region_dice_np(preds[j], val_canvases[i0 + j]["seg"])
            for k in dices:
                dices[k].append(d[k])
    out = {f"dice_{k}": float(np.mean(v)) for k, v in dices.items()}
    out["dice_mean"] = float(np.mean([out[f"dice_{k}"] for k in dices]))
    return out


def _validate_pool_sampling(pool: CasePool, cfg: TrainConfig) -> None:
    """--debug-checks startup sanitizer (SURVEY.md §5): discharge checkify
    bounds checks on every local pool slot's fg table + one real sampled
    patch, so a mis-built pool fails loudly before step 0 instead of
    silently clamping inside the jitted step."""
    from ..data.sampling import checked_sample_batch

    for dev_i in range(len(pool.devices)):
        for slot in range(pool.k_local):
            img = pool._shards["image"][dev_i][slot]
            seg = pool._shards["seg"][dev_i][slot]
            fg = pool._shards["fg"][dev_i][slot]
            checked_sample_batch(
                jax.random.PRNGKey(0),
                jnp.asarray(img),
                jnp.asarray(seg),
                tuple(cfg.patch),
                batch=1,
                fg_table=jnp.asarray(fg),
                fg_prob=1.0,  # force the fg path so the table is exercised
            )


def train_stage(
    exp: ExperimentConfig,
    case_dirs: Sequence[str],
    *,
    stage: str = "fine",
    val_dirs: Sequence[str] = (),
    env: Optional[MeshEnv] = None,
    profile: bool = False,
    kd_teachers=None,  # [(apply_fn, params), ...] -> distillation (C18)
    kd_config=None,
    init_from: Optional[str] = None,
) -> StageResult:
    """Train one stage to completion (or resume+continue); returns params.

    ``init_from``: warm-start the stage's params from a file — an exported
    ``params.{npz,safetensors}`` (train/checkpoint.py) or a reference
    torch checkpoint ``.pt/.pth`` (utils/torch_import.py) — the
    fine-tune-imported-weights migration path. Fresh optimizer state,
    step 0. A resumable checkpoint in the workdir ALWAYS wins over
    init_from: restarts of a warm-started run must continue it, not
    reset it."""
    env = env or make_mesh()
    cfg = exp.train
    unet_cfg = exp.unet if stage == "fine" else exp.coarse_unet
    assert unet_cfg is not None, f"no unet config for stage '{stage}'"
    if stage == "coarse":
        # stage 1 sees the whole brain at 1/2 resolution on a halved canvas,
        # training on 64^3 patches (BASELINE.json:9 "coarse 64^3 localization")
        downsample = 2
        m = unet_cfg.min_spatial
        canvas = tuple(max(m, (s // 2 // m) * m) for s in cfg.pool_shape)
        cfg = dataclasses.replace(cfg, patch=cfg.coarse_patch, pool_shape=canvas)
    else:
        downsample = cfg.train_downsample
    workdir = os.path.join(exp.workdir, stage)
    os.makedirs(workdir, exist_ok=True)

    model, params, opt_state = init_stage(unet_cfg, cfg, env)
    apply_fn = lambda p, x: model.apply(p, x)
    # training apply requests the deep-supervision heads when configured
    train_apply = (
        (lambda p, x: model.apply(p, x, deep_outputs=True))
        if unet_cfg.deep_supervision
        else apply_fn
    )
    if kd_teachers:
        from .distill import KDConfig, make_kd_train_step

        train_step = make_kd_train_step(
            train_apply,
            [t[0] for t in kd_teachers],
            [jax.device_put(t[1], env.replicated()) for t in kd_teachers],
            cfg,
            kd_config or KDConfig(),
            env,
        )
    else:
        # sub-pixel-head nets train with the low-res loss form (identical
        # value, cheaper VPU passes; train/loss.py) unless deep
        # supervision needs full-res labels
        from .step import make_segmentation_microbatch_loss

        lowres_apply = None
        if unet_cfg.stem_downsample > 1 and not unet_cfg.deep_supervision:
            lowres_apply = lambda p, x: model.apply(p, x, subpixel=False)
        train_step = make_train_step(
            train_apply, cfg, env,
            microbatch_loss=make_segmentation_microbatch_loss(
                train_apply, cfg, lowres_apply=lowres_apply,
                stem=unet_cfg.stem_downsample,
            ),
        )
    eval_step = make_batched_eval_step(apply_fn, env)

    ckpt = CheckpointManager(workdir, keep=cfg.keep_checkpoints)
    logger = MetricsLogger(workdir, name=f"{stage}")

    pool = CasePool(
        case_dirs,
        env,
        canvas=cfg.pool_shape,
        cases_per_device=cfg.pool_cases_per_device,
        downsample=downsample,
        seed=cfg.seed,
        prep_cache_dir=cfg.prep_cache_dir,
    )
    if cfg.debug_checks:
        _validate_pool_sampling(pool, cfg)
        print(f"[{stage}] --debug-checks: pool sampling bounds OK", flush=True)

    start_step = 0
    try:
        restored = ckpt.restore(params, opt_state)
    except Exception:
        # structure mismatch — most commonly a resume with --ema-decay
        # flipped relative to the run that wrote the checkpoint. Restore
        # with the FLIPPED optimizer-state structure and migrate (strip
        # the EMA, or seed a fresh one from the restored params).
        from .step import migrate_opt_state

        alt_cfg = dataclasses.replace(
            cfg, ema_decay=0.0 if cfg.ema_decay > 0 else 0.5
        )
        # replicate the template like init_stage does — freshly-init'd
        # scalars (optimizer counts) otherwise sit on one device and the
        # restored state inherits that placement
        alt_opt = jax.device_put(
            make_optimizer(alt_cfg).init(params), env.replicated()
        )
        restored = ckpt.restore(params, alt_opt)
        if restored is not None:
            p_, o_, s_, c_ = restored
            o_ = jax.device_put(
                migrate_opt_state(o_, opt_state, p_), env.replicated()
            )
            restored = (p_, o_, s_, c_)
            print(
                f"[{stage}] note: checkpoint optimizer state "
                f"{'carried' if cfg.ema_decay <= 0 else 'lacked'} a weight "
                f"EMA; migrated to match ema_decay={cfg.ema_decay}",
                flush=True,
            )
    if restored is not None:
        params, opt_state, start_step, cursor = restored
        pool.load_state(cursor)
        print(f"[{stage}] resumed from step {start_step}", flush=True)
        if init_from:
            print(
                f"[{stage}] note: --init-from {init_from} IGNORED — a "
                "resumable checkpoint exists and continuing it wins",
                flush=True,
            )
    elif init_from:
        params = jax.device_put(
            _load_init_params(init_from, params), env.replicated()
        )
        # re-init the optimizer AFTER the swap: tx.init seeded state from
        # the discarded random init — with --ema-decay the EMA would
        # otherwise stay contaminated by random weights for ~1/(1-decay)
        # steps, and export --ema would ship that blend
        opt_state = jax.device_put(
            make_optimizer(cfg).init(params), env.replicated()
        )
        print(f"[{stage}] warm-started params from {init_from} "
              "(fresh optimizer state, step 0)", flush=True)

    # validation canvases prepared once, cached on host
    val_canvases: List[Dict[str, np.ndarray]] = []
    for d in val_dirs:
        c = prepare_training_case(load_case(d), cfg.pool_shape, downsample=downsample)
        val_canvases.append({"image": np.asarray(c["image"], np.float32), "seg": c["seg"]})

    pool.start()
    step_arr = None
    t_last = time.time()
    steps_since_log = 0
    last_metrics: Dict[str, float] = {}
    # analytic per-device step FLOPs -> MFU in every log line (VERDICT
    # round-2 weak #4: train MFU must be reported, not just patches/s)
    from ..utils.flops import mfu as _mfu, unet_forward_flops

    step_flops = (
        3.0 * unet_forward_flops(unet_cfg, tuple(cfg.patch))
        * cfg.batch_per_device * max(cfg.grad_accum_steps, 1)
    )
    log_device = jax.devices()[0]
    trace_on = False
    # graceful preemption (TPU pools send SIGTERM before reclaiming): stop
    # at the next step boundary, save a resumable checkpoint, exit cleanly.
    # signal.signal only works on the main thread — embedded callers
    # (tests, dryrun threads) simply don't get the handler
    preempt = {"sig": None}
    prev_handler = None
    try:
        prev_handler = signal.signal(
            signal.SIGTERM, lambda s, f: preempt.__setitem__("sig", s)
        )
    except ValueError:
        pass
    preempted = False
    try:
        for step in range(start_step, cfg.steps):
            if profile and step == start_step + 10:
                jax.profiler.start_trace(os.path.join(workdir, "profile"))
                trace_on = True
            if trace_on and step == start_step + 20:
                jax.block_until_ready(params)
                jax.profiler.stop_trace()
                trace_on = False

            step_arr = jnp.int32(step)
            params, opt_state, aux = train_step.fn(
                params, opt_state, pool.image, pool.seg, pool.fg, step_arr
            )
            steps_since_log += 1

            if cfg.pool_refresh_every and step % cfg.pool_refresh_every == 0:
                pool.maybe_refresh()

            if cfg.log_every and (step + 1) % cfg.log_every == 0 or step == cfg.steps - 1:
                aux = jax.device_get(aux)
                dt = time.time() - t_last
                sps = steps_since_log / max(dt, 1e-9)
                last_metrics = {k: float(v) for k, v in aux.items()}
                last_metrics["steps_per_sec"] = sps
                last_metrics["patches_per_sec"] = (
                    sps * cfg.batch_per_device * env.n_data
                )
                m = _mfu(step_flops, 1.0 / max(sps, 1e-9), log_device)
                if m is not None:
                    last_metrics["mfu"] = m
                logger.log(step + 1, last_metrics)
                t_last = time.time()
                steps_since_log = 0

            do_eval = (
                cfg.eval_every and (step + 1) % cfg.eval_every == 0 and val_canvases
            )
            if do_eval:
                vm = _validate(eval_step, params, val_canvases, env.n_data)
                logger.log(step + 1, vm, prefix="val_")
                # best export keys on EVALS, not on eval/checkpoint step
                # alignment — a new best between checkpoint steps must
                # still become the serving weights
                ckpt.maybe_save_best(step + 1, params, vm["dice_mean"])
            saved_now = bool(cfg.checkpoint_every) and (
                (step + 1) % cfg.checkpoint_every == 0 or step == cfg.steps - 1
            )
            if saved_now:
                ckpt.save(step + 1, params, opt_state, pool.state())
            if preempt["sig"] is not None:
                if not saved_now:  # same step saved twice would collide
                    ckpt.save(step + 1, params, opt_state, pool.state())
                ckpt.wait()
                preempted = True
                print(
                    f"[{stage}] SIGTERM at step {step + 1}: checkpoint "
                    "saved, stopping gracefully (resume continues here)",
                    flush=True,
                )
                break
    finally:
        if prev_handler is not None:
            try:
                signal.signal(signal.SIGTERM, prev_handler)
            except ValueError:
                pass
        if trace_on:
            # short runs (< start+20 steps) or a mid-window exception must
            # still finalize the trace — an open trace is unreadable and
            # the profiler session would leak until process exit
            try:
                jax.block_until_ready(params)
                jax.profiler.stop_trace()
            except Exception:
                pass
        pool.stop()
        ckpt.wait()
        logger.close()

    # final checkpoint for short runs that never hit checkpoint_every —
    # but NOT after preemption: the preempt save already recorded the true
    # step, and stamping cfg.steps would claim a completed run
    if not preempted and (
        cfg.checkpoint_every == 0 or cfg.steps < (cfg.checkpoint_every or 1)
    ):
        ckpt.save(cfg.steps, params, opt_state, pool.state(), metric=None)
        ckpt.wait()
    ckpt.close()
    return StageResult(
        params=params, final_metrics=last_metrics, workdir=workdir,
        preempted=preempted,
    )


def train_experiment(
    exp: ExperimentConfig,
    case_dirs: Sequence[str],
    val_dirs: Sequence[str] = (),
    profile: bool = False,
) -> Dict[str, StageResult]:
    """Train all stages of an experiment (coarse first when cascaded).
    A SIGTERM-preempted stage stops the experiment — later stages must
    not start on a machine that was told to shut down; the returned
    results carry ``preempted`` for the caller."""
    env = make_mesh()
    results: Dict[str, StageResult] = {}
    if exp.coarse_unet is not None:
        results["coarse"] = train_stage(
            exp, case_dirs, stage="coarse", val_dirs=val_dirs, env=env, profile=profile
        )
        if results["coarse"].preempted:
            return results
    results["fine"] = train_stage(
        exp, case_dirs, stage="fine", val_dirs=val_dirs, env=env, profile=profile
    )
    return results
