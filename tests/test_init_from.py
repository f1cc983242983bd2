"""Warm-start training (train --init-from): exported-params and torch-
checkpoint seeds, resume-wins semantics, and the cascade-stage guard."""

import os
import sys

import jax
import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_golden_parity import TorchMirror  # noqa: E402

from brats2019_tpu.cli import train as cli_train
from brats2019_tpu.configs.presets import get_preset
from brats2019_tpu.train.checkpoint import export_params
from brats2019_tpu.train.loop import _load_init_params


def _unit_template():
    from brats2019_tpu.cli.common import _stage_param_template

    return _stage_param_template(get_preset("unit"), "fine")


def test_load_init_params_from_export(tmp_path):
    like = _unit_template()
    src = jax.tree_util.tree_map(
        lambda a: np.random.default_rng(0).normal(size=a.shape).astype(a.dtype),
        like,
    )
    path = str(tmp_path / "params.npz")
    export_params(path, src)
    loaded = _load_init_params(path, like)
    for a, b in zip(jax.tree_util.tree_leaves(src),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_init_params_from_torch(tmp_path):
    torch.manual_seed(0)
    ckpt = str(tmp_path / "ref.pt")
    torch.save(TorchMirror(get_preset("unit").unet).state_dict(), ckpt)
    like = _unit_template()
    loaded = _load_init_params(ckpt, like)
    # spot-check one kernel made it through the OIDHW->DHWIO transpose
    k = np.asarray(
        loaded["params"]["DoubleConv_0"]["ConvNormAct_0"]["Conv_0"]["kernel"]
    )
    assert k.shape[-2:] == (4, 4) and np.abs(k).sum() > 0


@pytest.mark.slow
def test_cli_warm_start_then_resume_wins(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    torch.manual_seed(1)
    ckpt = str(tmp_path / "ref.pt")
    torch.save(TorchMirror(get_preset("unit").unet).state_dict(), ckpt)
    data = str(tmp_path / "data")
    workdir = str(tmp_path / "run")

    rc = cli_train.main([
        "--data", data, "--synthetic", "2", "--synthetic-shape",
        "32", "32", "32", "--preset", "unit", "--steps", "2",
        "--checkpoint-every", "2", "--workdir", workdir, "--stage", "fine",
        "--init-from", ckpt,
    ])
    out = capsys.readouterr().out
    assert rc == 0 and "warm-started params from" in out

    # second run: the checkpoint written above must win over --init-from
    rc = cli_train.main([
        "--data", data, "--preset", "unit", "--steps", "4",
        "--checkpoint-every", "2", "--workdir", workdir, "--stage", "fine",
        "--init-from", ckpt,
    ])
    out = capsys.readouterr().out
    assert rc == 0 and "IGNORED" in out and "resumed from step 2" in out


@pytest.mark.slow
def test_warm_start_seeds_the_ema(tmp_path, monkeypatch):
    """--init-from + --ema-decay: the EMA must be seeded from the
    IMPORTED weights, not the discarded random init (export --ema would
    otherwise ship a random-contaminated blend)."""
    import dataclasses

    import jax.numpy as jnp

    from brats2019_tpu.cli.common import ema_stage_params
    from brats2019_tpu.models import UNet3D
    from brats2019_tpu.utils.torch_import import (
        import_torch_params,
        load_torch_state,
    )

    monkeypatch.chdir(tmp_path)
    exp = get_preset("unit")
    torch.manual_seed(5)
    ckpt = str(tmp_path / "ref.pt")
    torch.save(TorchMirror(exp.unet).state_dict(), ckpt)
    workdir = str(tmp_path / "run")
    rc = cli_train.main([
        "--data", str(tmp_path / "data"), "--synthetic", "2",
        "--synthetic-shape", "32", "32", "32", "--preset", "unit",
        "--steps", "2", "--checkpoint-every", "2", "--workdir", workdir,
        "--stage", "fine", "--init-from", ckpt, "--ema-decay", "0.9",
    ])
    assert rc == 0

    exp = dataclasses.replace(
        exp, workdir=workdir,
        train=dataclasses.replace(exp.train, ema_decay=0.9),
    )
    ema = ema_stage_params(exp, "fine")
    imported, _ = import_torch_params(load_torch_state(ckpt),
                                      _unit_template())
    random_init = UNet3D(exp.unet).init(
        jax.random.PRNGKey(exp.train.seed), jnp.zeros((1, 16, 16, 16, 4))
    )

    def flat(t):
        return np.concatenate(
            [np.ravel(np.asarray(l, np.float32))
             for l in jax.tree_util.tree_leaves(t)]
        )

    d_imported = np.linalg.norm(flat(ema) - flat(imported))
    d_random = np.linalg.norm(flat(ema) - flat(random_init))
    assert d_imported < 0.25 * d_random, (d_imported, d_random)


def test_cli_init_from_requires_single_stage(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    rc = cli_train.main([
        "--data", str(tmp_path / "data"), "--synthetic", "1",
        "--synthetic-shape", "32", "32", "32", "--preset", "cascade",
        "--stage", "all", "--init-from", str(tmp_path / "x.npz"),
    ])
    assert rc == 2
    assert "requires an explicit --stage" in capsys.readouterr().err
