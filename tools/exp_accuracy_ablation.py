"""Round-5 measurement for VERDICT r4 #4: quantify what the accuracy
machinery actually buys on a benchmark it can move.

The v1 synthetic task saturates the flagship at Dice ~0.998, so TTA,
checkpoint ensembling, EMA/SWA, and the connected-component thresholds
could only ever be tested for exactness/cost, never benefit. This tool
runs the ablation grid on the HARD generator
(data/synthetic.py make_hard_case_arrays: irregular multi-component
tumors, low-contrast ET rims, bias fields, empty-ET cases, distractor
foci):

  1. train M members (distinct seeds) with --ema-decay and retained step
     checkpoints on hard cases;
  2. evaluate on held-out hard cases: no-TTA vs TTA, ensemble K=1/2/M,
     EMA weights, SWA (uniform checkpoint average), and a
     min_component_voxels x et_min_voxels postprocessing sweep (the
     classic empty-ET trick);
  3. print the docs/ACCURACY.md table rows.

Runs on the forced 8-virtual-device CPU mesh (self-configured like
tests/conftest.py). Pinned-bound regression:
tests/test_accuracy_benchmark.py (uses --save-fixtures output).
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import json
import shutil
import tempfile

import jax

jax.config.update("jax_platforms", "cpu")
_flags = _os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

from brats2019_tpu.configs.presets import (
    ExperimentConfig, InferenceConfig, TrainConfig,
)
from brats2019_tpu.data import synthetic
from brats2019_tpu.data.case import load_case
from brats2019_tpu.infer.ensemble import EnsemblePredictor
from brats2019_tpu.infer.postprocess import postprocess_labels
from brats2019_tpu.infer.predictor import Predictor
from brats2019_tpu.models.unet3d import UNetConfig
from brats2019_tpu.train.loop import train_stage
from brats2019_tpu.train.metrics import region_dice_np

REGIONS = ("WT", "TC", "ET")
SHAPE = (64, 64, 48)


def log(*a):
    print(*a, file=_sys.stderr, flush=True)


def make_exp(workdir, steps, seed, tta=True):
    ucfg = UNetConfig(levels=2, base_features=8, compute_dtype="float32")
    return ExperimentConfig(
        name="accuracy_ablation",
        unet=ucfg,
        coarse_unet=None,
        train=TrainConfig(
            patch=(16, 16, 16),
            pool_shape=SHAPE,
            pool_cases_per_device=2,
            batch_per_device=1,
            steps=steps,
            warmup_steps=20,
            lr=3e-3,
            seed=seed,
            log_every=100,
            eval_every=0,
            # retain step checkpoints for SWA averaging + the EMA restore
            checkpoint_every=max(steps // 4, 1),
            keep_checkpoints=3,
            pool_refresh_every=50,
            # horizon 1/(1-d)=50 steps — an EMA sized to the short run
            # (0.995's 200-step horizon stayed contaminated by the random
            # init on the 300-step calibration: WT -0.199)
            ema_decay=0.98,
        ),
        infer=InferenceConfig(
            canvas=SHAPE, tile=(32, 32, 32), cascade=False,
            tta_flips=tta, min_component_voxels=0, et_min_voxels=0,
            compute_dtype="float32", tta_precision="float32",
        ),
        workdir=workdir,
    )


def mean_dice(rows):
    return {r: float(np.mean([c[r] for c in rows])) for r in REGIONS}


def eval_predictor(pred, val_cases):
    rows = []
    for case in val_cases:
        labels, _ = pred.predict_arrays(case.image)
        rows.append(region_dice_np(labels, case.seg))
    return mean_dice(rows)


def main(steps=600, n_train=10, n_val=6, members=4, save_fixtures=None,
         out_json=None, resume_dir=None):
    # --resume-dir: reuse a previous (interrupted) run's tmp dir — the
    # written dataset plus the run{m}/fine step checkpoints — and skip
    # straight to the eval arms. Member params come from each run's
    # latest retained checkpoint, which IS the final step (steps is a
    # multiple of checkpoint_every = steps//4). The resumed dir is kept
    # on exit so a second interruption stays resumable.
    tmp = resume_dir or tempfile.mkdtemp(prefix="exp_accuracy_ablation_")
    results = {}
    try:
        log(f"devices: {jax.devices()}")
        if resume_dir:
            data_dir = _os.path.join(tmp, "data")
            dirs = sorted(
                _os.path.join(data_dir, d) for d in _os.listdir(data_dir)
            )
            assert len(dirs) == n_train + n_val, (len(dirs), n_train, n_val)
        else:
            dirs = synthetic.write_dataset(
                _os.path.join(tmp, "data"), n_train + n_val, shape=SHAPE,
                hard=True,
            )
        train_dirs, val_dirs = dirs[:n_train], dirs[n_train:]
        val_cases = [load_case(d, load_seg=True) for d in val_dirs]
        log(f"hard benchmark: {n_train} train / {n_val} val cases; "
            f"empty-ET val cases: "
            f"{sum(1 for c in val_cases if not (c.seg == 3).any())}/{n_val}")

        member_params = []
        exps = []
        for m in range(members):
            exp = make_exp(_os.path.join(tmp, f"run{m}"), steps, seed=100 + m)
            if resume_dir:
                from brats2019_tpu.cli.common import load_stage_params

                log(f"resuming member {m} from {exp.workdir}/fine ...")
                member_params.append(
                    jax.device_get(load_stage_params(exp, "fine"))
                )
            else:
                log(f"training member {m} ({steps} steps, seed {100 + m}) ...")
                res = train_stage(exp, train_dirs, stage="fine", val_dirs=[])
                member_params.append(jax.device_get(res.params))
            exps.append(exp)

        exp0 = exps[0]
        exp0_notta = dataclasses.replace(
            exp0, infer=dataclasses.replace(exp0.infer, tta_flips=False)
        )

        # arm 1/2: member0, TTA off vs on (no postproc)
        results["no_tta"] = eval_predictor(
            Predictor(exp0_notta, member_params[0]), val_cases
        )
        results["tta"] = eval_predictor(
            Predictor(exp0, member_params[0]), val_cases
        )

        # arm 3/4: ensembles (TTA on)
        if members >= 2:
            results["ensemble2"] = eval_predictor(
                EnsemblePredictor(
                    exp0, [(p, None) for p in member_params[:2]]
                ),
                val_cases,
            )
        if members >= 3:
            results[f"ensemble{members}"] = eval_predictor(
                EnsemblePredictor(
                    exp0, [(p, None) for p in member_params]
                ),
                val_cases,
            )

        # arm 5: EMA weights of member0
        from brats2019_tpu.cli.common import (
            average_stage_params, ema_stage_params,
        )

        ema_params = ema_stage_params(exp0, "fine")
        results["ema"] = eval_predictor(
            Predictor(exp0, ema_params), val_cases
        )
        # arm 6: SWA (uniform average of the last 3 retained checkpoints)
        swa_params = average_stage_params(exp0, "fine", 3)
        results["swa"] = eval_predictor(
            Predictor(exp0, swa_params), val_cases
        )

        # arm 7: postprocessing sweep on member0 raw labels, BOTH with and
        # without TTA (postproc operates on labels, so one prediction pass
        # per arm feeds the whole grid; the no-TTA arm is noisier, which
        # is where the small-component and empty-ET tricks earn their keep)
        results["postproc_sweep"] = {}
        for arm, arm_exp in (("tta", exp0), ("no_tta", exp0_notta)):
            raw = []
            pred0 = Predictor(arm_exp, member_params[0])
            for case in val_cases:
                labels, _ = pred0.predict_arrays(case.image)
                raw.append((labels, case.seg))
            sweep = {}
            for mcv in (0, 16, 64):
                for etv in (0, 50, 200):
                    rows = [
                        region_dice_np(
                            postprocess_labels(
                                lab.copy(), min_component_voxels=mcv,
                                et_min_voxels=etv,
                            ),
                            seg,
                        )
                        for lab, seg in raw
                    ]
                    sweep[f"mcv{mcv}_etv{etv}"] = mean_dice(rows)
            results["postproc_sweep"][arm] = sweep

        if save_fixtures:
            from brats2019_tpu.train.checkpoint import export_params

            _os.makedirs(save_fixtures, exist_ok=True)
            for m in range(min(2, members)):
                export_params(
                    _os.path.join(save_fixtures, f"hard_member{m}.npz"),
                    member_params[m],
                )
            export_params(
                _os.path.join(save_fixtures, "hard_member0_ema.npz"),
                ema_params,
            )
            log(f"fixtures saved under {save_fixtures}")

        log("")
        log("| arm | WT | TC | ET | vs TTA baseline (WT/TC/ET) |")
        log("|---|---|---|---|---|")
        base = results["tta"]
        for arm in ("no_tta", "tta", "ensemble2", f"ensemble{members}",
                    "ema", "swa"):
            if arm not in results:
                continue
            r = results[arm]
            delta = " / ".join(
                f"{r[k] - base[k]:+.4f}" for k in REGIONS
            )
            log(f"| {arm} | {r['WT']:.4f} | {r['TC']:.4f} | "
                f"{r['ET']:.4f} | {delta} |")
        for arm, sweep in results["postproc_sweep"].items():
            log("")
            log(f"postproc sweep (member0, {arm}):")
            log("| min_component_voxels | et_min_voxels | WT | TC | ET |")
            log("|---|---|---|---|---|")
            for key, r in sweep.items():
                mcv, etv = key.replace("mcv", "").split("_etv")
                log(f"| {mcv} | {etv} | {r['WT']:.4f} | {r['TC']:.4f} | "
                    f"{r['ET']:.4f} |")
        if out_json:
            with open(out_json, "w") as f:
                json.dump(results, f, indent=1)
            log(f"results -> {out_json}")
        return 0
    finally:
        if not resume_dir:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--n-train", type=int, default=10)
    ap.add_argument("--n-val", type=int, default=6)
    ap.add_argument("--members", type=int, default=4)
    ap.add_argument("--save-fixtures", default=None, metavar="DIR",
                    help="export member0/1 + EMA params (npz) for the "
                         "pinned regression test")
    ap.add_argument("--out-json", default=None)
    ap.add_argument("--resume-dir", default=None, metavar="DIR",
                    help="reuse an interrupted run's tmp dir (dataset + "
                         "run{m}/fine checkpoints); skips training")
    a = ap.parse_args()
    raise SystemExit(main(a.steps, a.n_train, a.n_val, a.members,
                          a.save_fixtures, a.out_json, a.resume_dir))
