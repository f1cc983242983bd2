"""Real-data parity harness on synthetic stand-ins (VERDICT round-1
missing #3): the script must run end-to-end and produce a well-formed
verdict JSON, so it's ready to fire the day real BraTS19 data appears."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)
import parity_harness  # noqa: E402

from brats2019_tpu.cli import train as cli_train
from brats2019_tpu.data.constants import internal_to_disk
from brats2019_tpu.utils.nifti import write_nifti


@pytest.mark.slow
def test_parity_harness_end_to_end(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    data = str(tmp_path / "data")
    workdir = str(tmp_path / "run")

    rc = cli_train.main([
        "--data", data, "--synthetic", "2", "--synthetic-shape", "32", "32", "32",
        "--preset", "unit", "--steps", "2", "--checkpoint-every", "2",
        "--workdir", workdir,
    ])
    assert rc == 0

    # fabricate "reference masks": copy each case's GT seg into a ref dir,
    # so exact-agreement has something meaningful to compare against
    ref_dir = str(tmp_path / "refmasks")
    os.makedirs(ref_dir)
    from brats2019_tpu.data.case import discover_cases, load_case

    for d in discover_cases(data):
        case = load_case(d)
        write_nifti(
            os.path.join(ref_dir, f"{case.name}.nii.gz"),
            internal_to_disk(case.seg).astype(np.uint8),
        )

    out = str(tmp_path / "parity.json")
    rc = parity_harness.main([
        data, "--preset", "unit", "--workdir", workdir,
        "--reference-masks", ref_dir, "--out", out,
    ])
    assert rc == 0
    verdict = json.load(open(out))
    assert verdict["n_cases"] == 2
    assert set(verdict["mean_dice"]) == {"WT", "TC", "ET"}
    assert set(verdict["within_paper_tolerance"]) == {"WT", "TC", "ET"}
    assert verdict["expected_paper_dice"]["unverified"] is True
    assert 0.0 <= verdict["mean_voxel_agreement"] <= 1.0
    assert isinstance(verdict["all_masks_identical"], bool)
    for name, entry in verdict["per_case"].items():
        assert "dice" in entry and "exact_agreement" in entry


@pytest.mark.slow
def test_parity_harness_with_torch_checkpoint(tmp_path, monkeypatch):
    """--torch-checkpoint: the sweep runs with reference torch weights
    imported on the fly — no trained workdir needed at all."""
    import torch

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_golden_parity import TorchMirror

    from brats2019_tpu.configs.presets import get_preset
    from brats2019_tpu.data.synthetic import write_dataset

    monkeypatch.chdir(tmp_path)
    data = str(tmp_path / "data")
    write_dataset(data, 1, shape=(32, 32, 32))
    torch.manual_seed(3)
    ckpt = str(tmp_path / "ref.pt")
    torch.save(TorchMirror(get_preset("unit").unet).state_dict(), ckpt)

    out = str(tmp_path / "parity.json")
    rc = parity_harness.main([
        data, "--preset", "unit", "--torch-checkpoint", ckpt, "--out", out,
    ])
    assert rc == 0
    verdict = json.load(open(out))
    assert verdict["n_cases"] == 1 and "mean_dice" in verdict


def test_find_reference_mask(tmp_path):
    open(tmp_path / "CASE_A_pred.nii.gz", "w").close()
    open(tmp_path / "CASE_B.nii", "w").close()
    assert parity_harness.find_reference_mask(str(tmp_path), "CASE_A").endswith(
        "CASE_A_pred.nii.gz"
    )
    assert parity_harness.find_reference_mask(str(tmp_path), "CASE_B").endswith(
        "CASE_B.nii"
    )
    assert parity_harness.find_reference_mask(str(tmp_path), "CASE_C") is None
    assert parity_harness.find_reference_mask(None, "CASE_A") is None
