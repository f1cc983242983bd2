"""Pinned-bound regression tests for the hard accuracy benchmark
(VERDICT r4 #4 done-bar): the measured deltas in docs/ACCURACY.md must
not silently evaporate.

Uses the committed member/EMA fixtures from
``tools/exp_accuracy_ablation.py --save-fixtures`` (4 members x 600
steps on 10 hard cases, 2026-08-20) and re-derives a 3-case subset of
the ablation table: val seeds 10/11 (hard-ET cases) for the model-side
arms, val seed 13 (empty-ET case, the generator's 25% regime) for the
empty-ET postprocessing pin. All Dice on internal labels {0..3}
(train/metrics.py REGIONS).

If a deliberate model/infer change moves these pins, re-run the
ablation tool (``--resume-dir`` reuses trained checkpoints) and update
BOTH docs/ACCURACY.md and the bounds here.
"""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from brats2019_tpu.configs.presets import (
    ExperimentConfig, InferenceConfig, TrainConfig,
)
from brats2019_tpu.data.synthetic import make_hard_case_arrays
from brats2019_tpu.infer.ensemble import EnsemblePredictor
from brats2019_tpu.infer.postprocess import postprocess_labels
from brats2019_tpu.infer.predictor import Predictor
from brats2019_tpu.models import UNet3D
from brats2019_tpu.models.unet3d import UNetConfig
from brats2019_tpu.train.checkpoint import import_params
from brats2019_tpu.train.metrics import region_dice_np

SHAPE = (64, 64, 48)
REGIONS = ("WT", "TC", "ET")
FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "accuracy")


def _exp(tta=True):
    ucfg = UNetConfig(levels=2, base_features=8, compute_dtype="float32")
    return ExperimentConfig(
        name="accuracy_benchmark",
        unet=ucfg,
        coarse_unet=None,
        train=TrainConfig(pool_shape=SHAPE),
        infer=InferenceConfig(
            canvas=SHAPE, tile=(32, 32, 32), cascade=False, tta_flips=tta,
            min_component_voxels=0, et_min_voxels=0,
            compute_dtype="float32", tta_precision="float32",
        ),
    )


def _params(name):
    ucfg = UNetConfig(levels=2, base_features=8, compute_dtype="float32")
    like = UNet3D(ucfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 4))
    )
    return import_params(os.path.join(FIXTURES, f"{name}.npz"), like)


def _mean(rows, region):
    return float(np.mean([r[region] for r in rows]))


@pytest.fixture(scope="module")
def benchmark():
    """One prediction pass per arm, shared across the pins below."""
    exp = _exp(tta=True)
    exp_no = _exp(tta=False)
    m0 = _params("hard_member0")
    m1 = _params("hard_member1")
    ema = _params("hard_member0_ema")

    hard_cases = [make_hard_case_arrays(seed=s, shape=SHAPE)
                  for s in (10, 11)]
    empty_et_case = make_hard_case_arrays(seed=13, shape=SHAPE)
    assert not (empty_et_case[1] == 3).any(), "seed 13 must be empty-ET"

    def run(pred, cases):
        out = []
        for image, seg in cases:
            labels, _ = pred.predict_arrays(image)
            out.append((labels, seg))
        return out

    p_no = Predictor(exp_no, m0)
    return {
        "no_tta": run(p_no, hard_cases),
        "tta": run(Predictor(exp, m0), hard_cases),
        "ensemble2": run(
            EnsemblePredictor(exp, [(m0, None), (m1, None)]), hard_cases
        ),
        "ema": run(Predictor(exp, ema), hard_cases),
        "no_tta_empty_et": run(p_no, [empty_et_case]),
    }


def _dice(arm):
    return [region_dice_np(labels, seg) for labels, seg in arm]


def test_fixture_validity(benchmark):
    """The flagship-arm quality must be at its measured level, else the
    delta pins below test nothing (tool run 2026-08-20, seeds 10/11:
    WT 0.918 / TC 0.931 / ET 0.873)."""
    tta = _dice(benchmark["tta"])
    assert _mean(tta, "WT") >= 0.88
    assert _mean(tta, "TC") >= 0.88
    assert _mean(tta, "ET") >= 0.80


def test_tta_beats_single_view(benchmark):
    """TTA's measured benefit (docs/ACCURACY.md: +0.026 WT / +0.034 TC /
    +0.177 ET over 6 cases; on this 2-case subset +0.013/+0.046/+0.052)
    must not flip sign."""
    no = _dice(benchmark["no_tta"])
    tta = _dice(benchmark["tta"])
    assert _mean(tta, "WT") >= _mean(no, "WT") - 0.005
    assert _mean(tta, "TC") >= _mean(no, "TC") + 0.01
    assert _mean(tta, "ET") >= _mean(no, "ET") + 0.01


def test_ensemble_beats_member_on_wt_tc(benchmark):
    """2-member ensembling buys WT/TC (subset: +0.004 WT / +0.021 TC
    vs the TTA baseline). ET is NOT pinned upward: the 6-case table
    records ensembling COSTS ET without the empty-ET relabel."""
    tta = _dice(benchmark["tta"])
    ens = _dice(benchmark["ensemble2"])
    assert _mean(ens, "WT") >= _mean(tta, "WT") - 0.01
    assert _mean(ens, "TC") >= _mean(tta, "TC") + 0.005


def test_ema_tracks_final_weights(benchmark):
    """EMA weights are measured ~neutral-to-slightly-positive (subset
    deltas vs TTA baseline: -0.003 WT / -0.001 TC / +0.002 ET); pin
    that they stay within a band rather than degrading."""
    tta = _dice(benchmark["tta"])
    ema = _dice(benchmark["ema"])
    for r in REGIONS:
        assert abs(_mean(ema, r) - _mean(tta, r)) <= 0.05, r


def test_empty_et_relabel_flips_the_empty_case(benchmark):
    """The classic BraTS empty-ET trick, measured: on the empty-ET val
    case (seed 13) the raw prediction has a small spurious ET component
    (Dice 0); et_min_voxels=200 relabels it to NCR (Dice 1). This is
    the +0.33 ET lever in docs/ACCURACY.md."""
    labels, seg = benchmark["no_tta_empty_et"][0]
    spurious = int((labels == 3).sum())
    assert 0 < spurious < 200, spurious
    raw = region_dice_np(labels, seg)
    assert raw["ET"] == 0.0
    cleaned = postprocess_labels(
        labels.copy(), min_component_voxels=0, et_min_voxels=200
    )
    fixed = region_dice_np(cleaned, seg)
    assert fixed["ET"] == 1.0
    # the relabel must send ET to NCR, preserving WT/TC region masks
    assert fixed["WT"] == raw["WT"] and fixed["TC"] == raw["TC"]


def test_small_component_filter_helps_wt(benchmark):
    """min_component_voxels=16 deletes the hard generator's distractor
    foci: WT must not get worse, and on the measured subset it improves
    (+0.003 over 3 cases)."""
    arms = benchmark["no_tta"] + benchmark["no_tta_empty_et"]
    raw = [region_dice_np(l, s) for l, s in arms]
    filt = [
        region_dice_np(
            postprocess_labels(l.copy(), min_component_voxels=16,
                               et_min_voxels=0),
            s,
        )
        for l, s in arms
    ]
    assert _mean(filt, "WT") >= _mean(raw, "WT")
    assert _mean(filt, "TC") >= _mean(raw, "TC")


def test_postproc_threshold_cli_overrides():
    """--min-component-voxels/--et-min-voxels flow through
    resolve_experiment into exp.infer on predict, serve, and evaluate
    (0 must override too — it disables a preset filter)."""
    from brats2019_tpu.cli import evaluate as cli_evaluate
    from brats2019_tpu.cli import predict as cli_predict
    from brats2019_tpu.cli import serve as cli_serve
    from brats2019_tpu.cli.common import resolve_experiment

    for mod, pre in ((cli_predict, ["case"]), (cli_serve, ["watch"]),
                     (cli_evaluate, ["root"])):
        args = mod.build_parser().parse_args(
            pre + ["--preset", "cascade", "--et-min-voxels", "200",
                   "--min-component-voxels", "0"]
        )
        exp = resolve_experiment(args)
        assert exp.infer.et_min_voxels == 200, mod.__name__
        assert exp.infer.min_component_voxels == 0, mod.__name__
        # and the preset default survives when the flag is absent
        args = mod.build_parser().parse_args(pre + ["--preset", "cascade"])
        exp = resolve_experiment(args)
        assert exp.infer.et_min_voxels == 32, mod.__name__
        assert exp.infer.min_component_voxels == 16, mod.__name__
