"""Round-4 measurement for VERDICT r3 #6: quantify --multichip spatial's
accuracy delta vs the flagship tiled predictor.

``--multichip spatial`` is ONE whole-volume forward (global InstanceNorm
stats, no sliding window, no TTA); the product path `evaluate` validates
is the tiled sliding-window + 8-flip TTA predictor. The two are different
computations that produce close-but-not-identical masks. This tool puts a
NUMBER on the difference:

  1. train a small single-stage UNet on synthetic cases to a useful Dice
     (the same synthetic task BASELINE.md's cascade numbers use);
  2. on held-out cases, predict with (a) the single-device flagship
     predictor and (b) MultichipPredictor(mode='spatial') on the forced
     8-virtual-device CPU mesh;
  3. report per-region Dice of each vs GT, and of spatial vs flagship
     (agreement), mean over the held-out cases.

Runs on the forced 8-virtual-device CPU mesh (self-configured, like
tests/conftest.py — the delta is a semantics property, not a hardware
one). Results ->
docs/MULTIHOST.md accuracy-delta table; the pinned-bound regression test is
tests/test_multichip_cli.py::test_spatial_accuracy_delta_bounded.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import shutil
import tempfile

import jax

# sitecustomize imports jax and registers the axon tunnel before env vars
# can take effect; backends init lazily, so config.update still routes to
# CPU (same trick as tests/conftest.py)
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
from brats2019_tpu.infer.multichip import MultichipPredictor
from brats2019_tpu.infer.predictor import Predictor
from brats2019_tpu.models.unet3d import UNetConfig
from brats2019_tpu.train.loop import train_stage
from brats2019_tpu.train.metrics import region_dice_np

REGIONS = ("WT", "TC", "ET")


def log(*a):
    print(*a, file=_sys.stderr, flush=True)


def make_exp(workdir, steps):
    # single-stage config (spatial mode is a single-stage decomposition);
    # canvas X=64 is divisible by stem*2^(levels-1)*8 = 16 for the 8-dev mesh
    ucfg = UNetConfig(levels=2, base_features=8, compute_dtype="float32")
    return ExperimentConfig(
        name="spatial_delta",
        unet=ucfg,
        coarse_unet=None,
        train=TrainConfig(
            # sized for the 1-core CPU host: 8 virtual devices x 1 patch
            # of 16^3 per step trains the easy synthetic blob task to a
            # useful Dice in a few hundred steps
            patch=(16, 16, 16),
            pool_shape=(64, 64, 48),
            pool_cases_per_device=2,
            batch_per_device=1,
            steps=steps,
            warmup_steps=20,
            lr=3e-3,
            log_every=50,
            eval_every=0,
            checkpoint_every=0,
            pool_refresh_every=50,
        ),
        infer=InferenceConfig(
            canvas=(64, 64, 48), tile=(32, 32, 32), cascade=False,
            tta_flips=True, min_component_voxels=0, et_min_voxels=0,
            compute_dtype="float32", tta_precision="float32",
        ),
        workdir=workdir,
    )


def main(steps=400, n_train=8, n_val=4, save_params=None):
    tmp = tempfile.mkdtemp(prefix="exp_spatial_delta_")
    try:
        log(f"devices: {jax.devices()}")
        dirs = synthetic.write_dataset(
            _os.path.join(tmp, "data"), n_train + n_val, shape=(64, 64, 48)
        )
        train_dirs, val_dirs = dirs[:n_train], dirs[n_train:]
        exp = make_exp(_os.path.join(tmp, "run"), steps)
        log(f"training {steps} steps on {n_train} synthetic cases ...")
        res = train_stage(exp, train_dirs, stage="fine", val_dirs=[])
        params = jax.device_get(res.params)
        if save_params:
            from brats2019_tpu.train.checkpoint import export_params

            export_params(save_params, params)
            log(f"saved trained params to {save_params} "
                "(fixture for test_spatial_accuracy_delta_bounded)")

        flagship = Predictor(exp, params)
        spatial = MultichipPredictor(exp, params, mode="spatial")

        acc = {k: [] for k in ("flag_gt", "spat_gt", "agree")}
        for d in val_dirs:
            case = load_case(d, load_seg=True)
            ref, _ = flagship.predict_arrays(case.image, meta=case.meta)
            got = spatial.predict_arrays(case.image)
            acc["flag_gt"].append(region_dice_np(ref, case.seg))
            acc["spat_gt"].append(region_dice_np(got, case.seg))
            acc["agree"].append(region_dice_np(got, ref))
            log(f"  {_os.path.basename(d)}: "
                f"flagship-vs-GT {acc['flag_gt'][-1]} | "
                f"spatial-vs-GT {acc['spat_gt'][-1]} | "
                f"agreement {acc['agree'][-1]}")

        def mean(key):
            return {
                r: float(np.mean([c[r] for c in acc[key]])) for r in REGIONS
            }

        fg, sg, ag = mean("flag_gt"), mean("spat_gt"), mean("agree")
        log("")
        log("| region | flagship vs GT | spatial vs GT | delta (GT Dice) | spatial-vs-flagship agreement |")
        log("|---|---|---|---|---|")
        for r in REGIONS:
            log(f"| {r} | {fg[r]:.4f} | {sg[r]:.4f} | "
                f"{sg[r] - fg[r]:+.4f} | {ag[r]:.4f} |")
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--n-train", type=int, default=8)
    ap.add_argument("--n-val", type=int, default=4)
    ap.add_argument("--save-params", default=None, metavar="PATH",
                    help="export the trained params (npz) so the pinned "
                         "regression test can skip the training step")
    a = ap.parse_args()
    raise SystemExit(main(a.steps, a.n_train, a.n_val, a.save_params))
