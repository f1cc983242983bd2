"""Shared CLI plumbing: preset overrides + checkpoint param loading."""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp

from ..configs.presets import ExperimentConfig, get_preset
from ..models.unet3d import UNet3D, UNetConfig
from ..train.checkpoint import CheckpointManager, import_params


def resolve_experiment(args) -> ExperimentConfig:
    exp = get_preset(args.preset)
    if getattr(args, "workdir", None):
        exp = dataclasses.replace(exp, workdir=args.workdir)
    if getattr(args, "steps", None):
        exp = dataclasses.replace(
            exp, train=dataclasses.replace(exp.train, steps=args.steps)
        )
    for flag in ("checkpoint_every", "eval_every", "log_every", "ema_decay",
                 "prep_cache_dir", "rot90_axial", "gamma_range"):
        v = getattr(args, flag, None)
        if v is not None:
            exp = dataclasses.replace(
                exp, train=dataclasses.replace(exp.train, **{flag: v})
            )
    # postproc-threshold overrides (docs/ACCURACY.md: et_min_voxels is
    # the measured empty-ET lever; 0 disables a filter, so test is-None)
    for flag in ("min_component_voxels", "et_min_voxels"):
        v = getattr(args, flag, None)
        if v is not None:
            exp = dataclasses.replace(
                exp, infer=dataclasses.replace(exp.infer, **{flag: v})
            )
    if getattr(args, "seed", None) is not None:
        exp = dataclasses.replace(
            exp, train=dataclasses.replace(exp.train, seed=args.seed)
        )
    if getattr(args, "debug_checks", False):
        exp = dataclasses.replace(
            exp, train=dataclasses.replace(exp.train, debug_checks=True)
        )
    return exp


def params_like_for(unet_cfg: UNetConfig, patch=(32, 32, 32)):
    model = UNet3D(unet_cfg)
    # Init with deep_outputs matching the training config: a checkpoint
    # trained with deep_supervision carries aux_head_* params, and orbax
    # restore needs a structurally identical template (ADVICE round-1 low).
    return jax.eval_shape(
        lambda k: model.init(
            k,
            jnp.zeros((1,) + tuple(patch) + (4,)),
            deep_outputs=unet_cfg.deep_supervision,
        ),
        jax.random.PRNGKey(0),
    )


def _latest_checkpoint_mtime(workdir: str) -> float:
    """Newest mtime among the orbax step dirs and the best-params state
    under ``<workdir>/checkpoints`` (0.0 when none exist)."""
    root = os.path.join(workdir, "checkpoints")
    newest = 0.0
    try:
        for name in os.listdir(root):
            p = os.path.join(root, name)
            if name.isdigit() or (
                name == "best" and os.path.exists(os.path.join(p, "state"))
            ):
                newest = max(newest, os.path.getmtime(p))
    except OSError:
        pass
    return newest


def _stage_param_template(exp: ExperimentConfig, stage: str):
    """Zeroed params tree matching a stage's checkpoint layout (the orbax
    restore template — ONE recipe shared by load/average paths)."""
    unet_cfg = exp.unet if stage == "fine" else exp.coarse_unet
    assert unet_cfg is not None
    like = params_like_for(unet_cfg)
    return jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), like
    )


def _stage_opt_template(exp: ExperimentConfig, params_like):
    """Zeroed optimizer-state tree matching the stage checkpoint."""
    from ..train.step import make_optimizer

    tx = make_optimizer(exp.train)
    opt_like = jax.eval_shape(lambda p: tx.init(p), params_like)
    return jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), opt_like
    )


def _restore_with_either_template(restore_fn, exp: ExperimentConfig, like):
    """Run ``restore_fn(opt_template)`` with the caller's optimizer-state
    structure, falling back to the ema/no-ema FLIPPED structure — a
    checkpoint written by an --ema-decay run must stay restorable from a
    preset without it (and vice versa)."""
    try:
        return restore_fn(_stage_opt_template(exp, like))
    except Exception:
        alt = 0.0 if exp.train.ema_decay > 0 else 0.5
        exp_alt = dataclasses.replace(
            exp, train=dataclasses.replace(exp.train, ema_decay=alt)
        )
        return restore_fn(_stage_opt_template(exp_alt, like))


def _opt_template_with_ema(exp: ExperimentConfig, like):
    """Opt-state template whose STRUCTURE includes the EMA tracker (the
    decay value never affects the state shape) — for restoring checkpoints
    written by an --ema-decay run regardless of the caller's preset."""
    exp_ema = dataclasses.replace(
        exp, train=dataclasses.replace(exp.train, ema_decay=0.5)
    )
    return _stage_opt_template(exp_ema, like)


def ema_stage_params(exp: ExperimentConfig, stage: str):
    """The weight-EMA tree from a stage's latest FULL checkpoint (the EMA
    rides in the optimizer state — train/step.py params_ema_tracker).
    Raises FileNotFoundError when there is no checkpoint or the run was
    trained without ``--ema-decay``."""
    from ..train.step import get_ema_params

    workdir = os.path.join(exp.workdir, stage)
    like = _stage_param_template(exp, stage)
    ckpt = CheckpointManager(workdir)
    try:
        if ckpt.latest_step() is None:
            raise FileNotFoundError(
                f"No checkpoint for stage '{stage}' under {workdir}"
            )
        try:
            restored = ckpt.restore(like, _opt_template_with_ema(exp, like))
        except Exception as e:
            # a structure mismatch here means the checkpoint has no EMA
            # element (trained without --ema-decay); keep the underlying
            # error visible — a wrong preset / corrupt checkpoint raises
            # the SAME way and 'retrain with --ema-decay' would mislead
            raise FileNotFoundError(
                f"Could not restore an EMA state for stage '{stage}' "
                f"under {workdir}. Most likely the run was trained "
                f"without --ema-decay; underlying error: "
                f"{type(e).__name__}: {str(e)[:300]}"
            ) from e
        ema = get_ema_params(restored[1]) if restored is not None else None
        if ema is None:
            raise FileNotFoundError(
                f"No EMA state in stage '{stage}' checkpoints under "
                f"{workdir} (train with --ema-decay to record one)"
            )
        return ema
    finally:
        ckpt.close()


def average_stage_params(exp: ExperimentConfig, stage: str, last_k: int):
    """Uniform weight average of the last ``last_k`` retained step
    checkpoints of a stage (SWA-style checkpoint averaging — the classic
    cheap alternative to probability ensembling: ONE averaged model, one
    forward pass at serving time). Leaves are averaged in f32 and cast
    back to their stored dtype. Exact for this net's inference semantics
    only in the sense every SWA use is: the averaged weights define a new
    model, evaluated like any other.

    Raises FileNotFoundError when no step checkpoints exist; averages
    fewer than ``last_k`` (with a note) when the retention window
    (CheckpointManager ``keep``) holds fewer."""
    import sys

    import numpy as np

    workdir = os.path.join(exp.workdir, stage)
    like = _stage_param_template(exp, stage)
    ckpt = CheckpointManager(workdir)
    try:
        steps = ckpt.all_steps()
        if not steps:
            raise FileNotFoundError(
                f"No step checkpoints to average for stage '{stage}' "
                f"under {workdir}"
            )
        steps = steps[-last_k:]
        if len(steps) < last_k:
            print(
                f"[average] {stage}: only {len(steps)} retained "
                f"checkpoint(s) (requested {last_k}) — averaging those",
                file=sys.stderr, flush=True,
            )
        # resolve the matching opt-state template ONCE on the first step
        # (all retained steps share one structure) instead of paying a
        # failed restore + template rebuild per step
        opt_like = None

        def _restore_step(s):
            nonlocal opt_like
            if opt_like is not None:
                return ckpt.restore_params_at(s, like, opt_like)

            def attempt(ol):
                nonlocal opt_like
                out = ckpt.restore_params_at(s, like, ol)
                opt_like = ol
                return out

            return _restore_with_either_template(attempt, exp, like)

        acc = None
        for s in steps:
            p = _restore_step(s)
            p32 = jax.tree_util.tree_map(
                lambda x: np.asarray(x, np.float32), p
            )
            acc = p32 if acc is None else jax.tree_util.tree_map(
                lambda a, b: a + b, acc, p32
            )
        inv = 1.0 / len(steps)
        mean = jax.tree_util.tree_map(
            lambda a, l: jnp.asarray(a * inv, l.dtype), acc, like
        )
        print(
            f"[average] {stage}: averaged steps {steps}",
            file=sys.stderr, flush=True,
        )
        return mean
    finally:
        ckpt.close()


def load_ensemble_members(exp: ExperimentConfig, workdirs, primary):
    """Primary model + one member per extra workdir, for
    ``EnsemblePredictor``. Each member workdir is loaded with the SAME
    preset/stage rules as the primary (load_stage_params: exported params
    or orbax checkpoint, newest-wins); a member missing a coarse
    checkpoint reuses the primary's coarse stage (the cascade only
    localizes the ROI — sharing it keeps members comparable) with a
    warning."""
    import sys

    # duplicated workdirs silently double-weight a member in the mean
    # (predict --workdir A --ensemble A B gives (2a+b)/3); warn, don't
    # forbid — deliberate weighting via repetition stays possible
    seen = {os.path.abspath(exp.workdir)}
    for w in workdirs:
        a = os.path.abspath(w)
        if a in seen:
            print(f"warning: ensemble member {w} appears more than once "
                  f"(or is the primary --workdir); its probabilities are "
                  f"double-weighted in the mean", file=sys.stderr)
        seen.add(a)

    members = [primary]
    for w in workdirs:
        exp_w = dataclasses.replace(exp, workdir=w)
        pf = load_stage_params(exp_w, "fine")
        pc = None
        if exp.infer.cascade and exp.coarse_unet is not None:
            try:
                pc = load_stage_params(exp_w, "coarse")
            except FileNotFoundError:
                print(f"warning: no coarse checkpoint under {w}; this "
                      f"member reuses the primary coarse stage",
                      file=sys.stderr)
                pc = primary[1]
        members.append((pf, pc))
    return members


def shard_of(name: str, n: int) -> int:
    """Stable shard assignment by case name — the SAME on every host and
    every run (Python's hash() is salted per process, so it cannot be
    used here)."""
    import zlib

    return zlib.crc32(name.encode()) % n


def parse_shard(spec: str):
    try:
        i_s, n_s = spec.split("/")
        i, n = int(i_s), int(n_s)
    except ValueError:
        raise ValueError(f"--shard must be I/N (got {spec!r})")
    if not (n >= 1 and 0 <= i < n):
        raise ValueError(f"--shard needs 0 <= I < N (got {spec!r})")
    return i, n


def filter_shard(case_dirs, spec):
    """Apply an ``I/N`` shard spec to a case list (None = everything);
    the batch CLIs' scale-out filter."""
    if not spec:
        return list(case_dirs)
    i, n = parse_shard(spec)
    return [
        d for d in case_dirs
        if shard_of(os.path.basename(os.path.normpath(d)), n) == i
    ]


def load_serving_params(exp: ExperimentConfig):
    """Load the serving weights for an experiment: fine always, coarse
    when the cascade wants it — degrading to cascade=False (returned in
    the adjusted exp) when no coarse checkpoint exists. The ONE recipe
    shared by serve startup and the stablehlo export; the serve SIGHUP
    reload deliberately does NOT use it (degrading cascade off there
    would require rebuilding the compiled programs)."""
    import sys

    params_fine = load_stage_params(exp, "fine")
    params_coarse = None
    if exp.infer.cascade and exp.coarse_unet is not None:
        try:
            params_coarse = load_stage_params(exp, "coarse")
        except FileNotFoundError:
            print("warning: no coarse checkpoint; cascade off",
                  file=sys.stderr)
            exp = dataclasses.replace(
                exp, infer=dataclasses.replace(exp.infer, cascade=False)
            )
    return exp, params_fine, params_coarse


def load_stage_params(
    exp: ExperimentConfig, stage: str, prefer_best: bool = True,
    from_checkpoint_only: bool = False,
):
    """Load trained params for a stage from its checkpoint directory.

    Accepts the orbax checkpoints under ``<workdir>/<stage>`` or an
    exported ``params.{safetensors,npz}`` (train/checkpoint.py
    export_params). When both exported files exist the NEWEST by mtime
    wins, and an export is used only while it is at least as new as the
    newest checkpoint — after a retrain WITHOUT re-export the checkpoint
    must win or predict/serve silently serve stale weights (ADVICE round
    2). ``from_checkpoint_only`` skips exported files entirely — the
    export CLI uses it so re-exporting always reads the current
    checkpoint, never a previous export."""
    import sys

    workdir = os.path.join(exp.workdir, stage)
    like = _stage_param_template(exp, stage)
    if not from_checkpoint_only:
        exported = [
            p
            for p in (
                os.path.join(workdir, "params.safetensors"),
                os.path.join(workdir, "params.npz"),
            )
            if os.path.exists(p)
        ]
        if exported:
            newest = max(exported, key=os.path.getmtime)
            ckpt_mtime = _latest_checkpoint_mtime(workdir)
            if ckpt_mtime > os.path.getmtime(newest):
                print(
                    f"[params] {stage}: checkpoint is NEWER than exported "
                    f"{newest} — loading the checkpoint (re-run the export "
                    f"CLI to refresh the export)",
                    file=sys.stderr, flush=True,
                )
            else:
                print(f"[params] {stage}: loading exported {newest}",
                      file=sys.stderr, flush=True)
                return import_params(newest, like)
    ckpt = CheckpointManager(workdir)
    try:
        if prefer_best:
            best = ckpt.restore_best_params(like)
            if best is not None:
                return best
        # fall back to latest full checkpoint (params only)
        restored = _restore_with_either_template(
            lambda opt_like: ckpt.restore(like, opt_like), exp, like
        )
        if restored is None:
            raise FileNotFoundError(
                f"No checkpoint found for stage '{stage}' under {workdir}"
            )
        return restored[0]
    finally:
        ckpt.close()


def multichip_mode_notes(mode: str, exp: ExperimentConfig,
                         batch_volumes=None, serving_depth=None) -> None:
    """Operator notes shared by the three --multichip CLIs (predict,
    serve, evaluate), so the contracts stay in one place: the single-stage
    modes bypass a cascade preset's coarse stage, postprocessing runs on
    the host, and the single-device serving knobs don't apply."""
    import sys

    if mode != "cascade" and exp.infer.cascade and exp.coarse_unet is not None:
        print("note: --multichip spatial/sweep run a single-stage "
              "whole-canvas decomposition; the preset's coarse/fine "
              "cascade is bypassed (use --multichip cascade for "
              "flagship-parity masks — measured Dice deltas: "
              "docs/MULTIHOST.md accuracy table)", file=sys.stderr)
    if exp.infer.postproc == "device":
        print("note: --multichip postprocesses on the host (the in-graph "
              "device CC lives in the single-device label program)",
              file=sys.stderr)
    for flag, name in ((batch_volumes, "--batch-volumes"),
                       (serving_depth, "--serving-depth")):
        if flag and flag > 1:
            print(f"note: {name} has no effect with --multichip "
                  "(cases run one at a time over the whole mesh)",
                  file=sys.stderr)
    if exp.infer.prep_cache_dir:
        print("note: --prep-cache has no effect with --multichip (the "
              "payload cache serves the single-device transfer encoding)",
              file=sys.stderr)
