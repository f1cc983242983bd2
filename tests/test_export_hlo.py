"""StableHLO deployment export (infer/export_hlo.py, export --stablehlo):
serialized modules must reproduce the live predict program exactly when
deserialized, and the manifest must describe the real input signatures."""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brats2019_tpu.configs.presets import (
    ExperimentConfig,
    InferenceConfig,
    TrainConfig,
)
from brats2019_tpu.data.synthetic import make_case_arrays
from brats2019_tpu.infer.export_hlo import export_predict_stablehlo, run_exported
from brats2019_tpu.infer.predictor import Predictor
from brats2019_tpu.models import UNet3D, UNetConfig

UCFG = UNetConfig(
    levels=2, base_features=4, max_features=8, compute_dtype="float32"
)
INFER = InferenceConfig(
    canvas=None,
    tile=(16, 16, 16),
    cascade=True,
    tta_flips=True,
    coarse_shape=(16, 16, 16),
    roi_shape=(16, 16, 16),  # roi == tile, single origin -> split path
    min_component_voxels=0,
    et_min_voxels=0,
    compute_dtype="float32",
    tta_precision="float32",
)


def _init_params(seed):
    model = UNet3D(UCFG)
    return model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, 16, 16, 16, 4))
    )


def _exp(infer):
    return ExperimentConfig(
        name="hlo", unet=UCFG, coarse_unet=UCFG,
        train=TrainConfig(pool_shape=(32, 32, 32)), infer=infer,
    )


def test_split_path_export_roundtrip(tmp_path):
    pred = Predictor(_exp(INFER), _init_params(0), _init_params(1))
    out = str(tmp_path / "hlo")
    written = export_predict_stablehlo(pred, out, check=True)  # exact-eq
    names = {os.path.basename(w) for w in written}
    assert names == {"stage_roi.stablehlo", "stage_fine.stablehlo",
                     "manifest.json"}
    man = json.load(open(os.path.join(out, "manifest.json")))
    assert man["checked"] and set(man["modules"]) == {"stage_roi",
                                                      "stage_fine"}
    # signatures are flat and carry the canvas-shaped image input
    roi_sig = man["modules"]["stage_roi"]["inputs_flat"]
    assert any(s["shape"] == [32, 32, 32, 4] for s in roi_sig)

    # an independent consumer call on REAL data matches the live program
    image = jnp.asarray(
        make_case_arrays(seed=2, shape=(32, 32, 32))[0], jnp.bfloat16
    )
    live = jax.tree_util.tree_map(
        np.asarray, pred._fn(pred.params_fine, pred.params_coarse, image)
    )
    got = jax.tree_util.tree_map(
        np.asarray,
        run_exported(out, pred.params_fine, pred.params_coarse, image),
    )
    np.testing.assert_array_equal(live[0], got[0])
    np.testing.assert_array_equal(live[1], got[1])


def test_monolithic_export_roundtrip(tmp_path):
    infer = dataclasses.replace(INFER, cascade=False)
    pred = Predictor(_exp(infer), _init_params(0))
    out = str(tmp_path / "hlo")
    export_predict_stablehlo(pred, out, check=True)
    assert os.path.exists(os.path.join(out, "predict.stablehlo"))
    man = json.load(open(os.path.join(out, "manifest.json")))
    assert list(man["modules"]) == ["predict"]


def test_flagship_scale_export(tmp_path):
    """The JUDGED flagship preset exports at its real shapes — jax.export
    only traces and serializes (no backend compile), so this is fast even
    on CPU; weights stay runtime inputs so the modules are tiny."""
    from brats2019_tpu.configs.presets import get_preset

    exp = get_preset("inference")

    def zero_params(cfg, sz):
        like = jax.eval_shape(
            lambda k: UNet3D(cfg).init(k, jnp.zeros((1, sz, sz, sz, 4))),
            jax.random.PRNGKey(0),
        )
        return jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), like
        )

    pred = Predictor(exp, zero_params(exp.unet, 64),
                     zero_params(exp.coarse_unet, 32))
    out = str(tmp_path / "hlo")
    export_predict_stablehlo(pred, out)  # no check: that would compile
    man = json.load(open(os.path.join(out, "manifest.json")))
    assert set(man["modules"]) == {"stage_roi", "stage_fine"}
    roi_sig = man["modules"]["stage_roi"]["inputs_flat"]
    # the canvas-shaped bf16 image input at the judged flagship size
    assert any(
        s["shape"] == [192, 224, 160, 4] and s["dtype"] == "bfloat16"
        for s in roi_sig
    )


def test_reexport_cleans_stale_modules(tmp_path):
    """A config flip (cascade -> no-cascade) into the same out_dir must
    not leave the old stage modules behind — run_exported dispatches on
    file existence."""
    out = str(tmp_path / "hlo")
    export_predict_stablehlo(
        Predictor(_exp(INFER), _init_params(0), _init_params(1)), out
    )
    assert os.path.exists(os.path.join(out, "stage_roi.stablehlo"))
    infer = dataclasses.replace(INFER, cascade=False)
    export_predict_stablehlo(Predictor(_exp(infer), _init_params(0)), out)
    names = sorted(os.listdir(out))
    assert names == ["manifest.json", "predict.stablehlo"]


@pytest.mark.slow
def test_cli_export_stablehlo(tmp_path, monkeypatch):
    from brats2019_tpu.cli import export as cli_export
    from brats2019_tpu.cli import train as cli_train

    monkeypatch.chdir(tmp_path)
    workdir = str(tmp_path / "run")
    rc = cli_train.main([
        "--data", str(tmp_path / "data"), "--synthetic", "2",
        "--synthetic-shape", "32", "32", "32", "--preset", "unit",
        "--steps", "3", "--checkpoint-every", "2", "--workdir", workdir,
    ])
    assert rc == 0
    rc = cli_export.main([
        "--preset", "unit", "--workdir", workdir,
        "--stablehlo", "--stablehlo-check",
    ])
    assert rc == 0
    hlo_dir = os.path.join(workdir, "stablehlo")
    assert os.path.exists(os.path.join(hlo_dir, "predict.stablehlo"))
    man = json.load(open(os.path.join(hlo_dir, "manifest.json")))
    assert man["checked"] and man["preset"] == "unit"
