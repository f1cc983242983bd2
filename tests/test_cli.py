"""CLI surface: train -> export -> predict -> evaluate, in-process on the
unit preset (config-1-style acceptance, SURVEY.md §4.2)."""

import json
import os

import numpy as np
import pytest

from brats2019_tpu.cli import evaluate as cli_evaluate
from brats2019_tpu.cli import export as cli_export
from brats2019_tpu.cli import predict as cli_predict
from brats2019_tpu.cli import train as cli_train
from brats2019_tpu.utils.nifti import read_nifti


@pytest.mark.slow
def test_cli_end_to_end(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    data = str(tmp_path / "data")
    workdir = str(tmp_path / "run")

    rc = cli_train.main([
        "--data", data, "--synthetic", "2", "--synthetic-shape", "32", "32", "32",
        "--preset", "unit", "--steps", "3", "--checkpoint-every", "2",
        "--workdir", workdir,
    ])
    assert rc == 0
    assert os.path.isdir(os.path.join(workdir, "fine", "checkpoints"))

    rc = cli_export.main(["--preset", "unit", "--workdir", workdir])
    assert rc == 0
    assert os.path.exists(os.path.join(workdir, "fine", "params.npz"))

    case = os.path.join(data, "BraTS19_SYN_000_1")
    rc = cli_predict.main([case, "--preset", "unit", "--workdir", workdir])
    assert rc == 0
    pred_path = os.path.join(case, "BraTS19_SYN_000_1_pred.nii.gz")
    seg, _ = read_nifti(pred_path, apply_scaling=False)
    assert seg.shape == (32, 32, 32)
    assert set(np.unique(seg)) <= {0, 1, 2, 4}

    out_json = str(tmp_path / "metrics.json")
    rc = cli_evaluate.main([
        data, "--preset", "unit", "--workdir", workdir,
        "--use-existing", "--out", out_json,
    ])
    assert rc == 0
    metrics = json.load(open(out_json))
    assert set(metrics["mean"]) == {"WT", "TC", "ET"}
    assert metrics["n_cases"] == 1  # only one case predicted


def test_train_cli_errors():
    assert cli_train.main([]) == 2  # --data required
    assert cli_train.main(["--data", "/nonexistent_dir_xyz"]) == 2


def test_predict_cli_errors(tmp_path):
    assert cli_predict.main([str(tmp_path)]) == 2  # no cases found
