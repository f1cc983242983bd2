"""End-to-end training-loop integration: train, checkpoint, resume
(SURVEY.md §4.3 "Integration" + §5 fault-injection resume test)."""

import dataclasses
import glob
import json
import os

import numpy as np
import pytest

from brats2019_tpu.configs.presets import (
    ExperimentConfig,
    InferenceConfig,
    TrainConfig,
)
from brats2019_tpu.data import synthetic
from brats2019_tpu.models.unet3d import UNetConfig
from brats2019_tpu.train.loop import train_stage

UCFG = UNetConfig(levels=2, base_features=4, compute_dtype="float32")


def make_exp(tmpdir, steps=4):
    return ExperimentConfig(
        name="test",
        unet=UCFG,
        coarse_unet=None,
        train=TrainConfig(
            patch=(16, 16, 16),
            pool_shape=(32, 32, 32),
            pool_cases_per_device=1,
            batch_per_device=1,
            steps=steps,
            warmup_steps=0,
            lr=1e-3,
            log_every=2,
            eval_every=2,
            checkpoint_every=2,
            pool_refresh_every=2,
        ),
        infer=InferenceConfig(
            canvas=None, tile=(16, 16, 16), cascade=False, tta_flips=False
        ),
        workdir=str(tmpdir / "run"),
    )


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    dirs = synthetic.write_dataset(str(root), 3, shape=(40, 40, 32))
    return dirs


def test_train_checkpoint_resume(tmp_path, dataset):
    exp = make_exp(tmp_path, steps=4)
    res = train_stage(exp, dataset[:2], stage="fine", val_dirs=dataset[2:])
    assert np.isfinite(res.final_metrics["loss"])

    # metrics jsonl written with train and val entries
    mfile = os.path.join(res.workdir, "fine_metrics.jsonl")
    recs = [json.loads(l) for l in open(mfile)]
    assert any("loss" in r for r in recs)
    assert any("val_dice_mean" in r for r in recs)

    # checkpoints exist
    assert glob.glob(os.path.join(res.workdir, "checkpoints", "*"))

    # "kill and restart": training again with more steps resumes, not restarts
    exp2 = dataclasses.replace(
        exp, train=dataclasses.replace(exp.train, steps=6)
    )
    res2 = train_stage(exp2, dataset[:2], stage="fine", val_dirs=dataset[2:])
    assert np.isfinite(res2.final_metrics["loss"])
    recs2 = [json.loads(l) for l in open(mfile)]
    steps_logged = [r["step"] for r in recs2 if "loss" in r]
    assert max(steps_logged) == 6


def test_resume_across_ema_flag_flip(tmp_path, dataset):
    """A checkpoint written WITHOUT --ema-decay must resume into a run
    WITH it (fresh EMA seeded from the restored params) and vice versa
    (EMA stripped) — not crash on the optimizer-state structure change."""
    import jax

    from brats2019_tpu.cli.common import ema_stage_params

    exp = make_exp(tmp_path, steps=2)
    res = train_stage(exp, dataset[:2], stage="fine", val_dirs=dataset[2:])
    assert np.isfinite(res.final_metrics["loss"])

    # resume WITH ema: migration seeds EMA from restored params
    exp_ema = dataclasses.replace(
        exp, train=dataclasses.replace(exp.train, steps=4, ema_decay=0.9)
    )
    res2 = train_stage(exp_ema, dataset[:2], stage="fine",
                       val_dirs=dataset[2:])
    assert np.isfinite(res2.final_metrics["loss"])
    # the EMA made it into the new checkpoints
    ema = ema_stage_params(exp_ema, "fine")
    assert all(
        np.isfinite(np.asarray(l)).all()
        for l in jax.tree_util.tree_leaves(ema)
    )

    # and back: resume WITHOUT ema strips the state
    exp_off = dataclasses.replace(
        exp, train=dataclasses.replace(exp.train, steps=6)
    )
    res3 = train_stage(exp_off, dataset[:2], stage="fine",
                       val_dirs=dataset[2:])
    assert np.isfinite(res3.final_metrics["loss"])


def test_best_export_with_nonaligned_eval_and_checkpoint(tmp_path, dataset):
    """Best-checkpoint selection keys on EVALS, not on eval/checkpoint step
    alignment: with eval_every=2 and checkpoint_every=3 (never aligned in a
    6-step run except step 6), the best/ export must still exist and carry
    the metric of an eval step."""
    exp = make_exp(tmp_path, steps=6)
    exp = dataclasses.replace(
        exp, train=dataclasses.replace(exp.train, eval_every=2,
                                       checkpoint_every=3)
    )
    res = train_stage(exp, dataset[:2], stage="fine", val_dirs=dataset[2:])
    best_metric = os.path.join(res.workdir, "checkpoints", "best", "metric.json")
    assert os.path.exists(best_metric), "best/ export missing (eval decoupling)"
    rec = json.load(open(best_metric))
    # the recorded best must come from an eval step (multiples of 2),
    # including ones that are NOT checkpoint steps
    assert rec["step"] % 2 == 0 and 0 < rec["step"] <= 6
    from brats2019_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(res.workdir)
    restored = mgr.restore_best_params(res.params)
    assert restored is not None
    mgr.close()
