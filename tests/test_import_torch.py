"""torch-checkpoint importer (utils/torch_import.py, cli/import_torch.py).

Migration-path guarantee: a reference-topology torch state dict imports
into a forward-identical JAX net (SURVEY.md §2 C12; the inverse direction
of tests/test_golden_parity.py's port).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from brats2019_tpu.models import UNet3D, UNetConfig
from brats2019_tpu.train.checkpoint import import_params
from brats2019_tpu.utils import torch_import as ti

from test_golden_parity import TorchMirror

CFG = UNetConfig(
    levels=3, base_features=8, max_features=32, compute_dtype="float32"
)


def _template(cfg):
    model = UNet3D(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 4)))
    return model, params


def _forward_torch(tmodel, x):
    with torch.no_grad():
        tl = tmodel(torch.from_numpy(x.transpose(0, 4, 1, 2, 3).copy()))
    return tl.numpy().transpose(0, 2, 3, 4, 1)


def _assert_forward_match(model, params, tmodel, atol=2e-4):
    x = np.random.default_rng(3).normal(size=(1, 16, 16, 16, 4)).astype(
        np.float32
    )
    jl = np.asarray(model.apply(params, jnp.asarray(x)))
    tl = _forward_torch(tmodel, x)
    np.testing.assert_allclose(jl, tl, atol=atol, rtol=1e-3)


def test_structural_import_roundtrip(tmp_path):
    """TorchMirror weights -> importer -> forward-identical JAX net."""
    torch.manual_seed(0)
    tmodel = TorchMirror(CFG).eval()
    model, like = _template(CFG)
    state = ti.flatten_state_dict(tmodel.state_dict())
    params, notes = ti.import_torch_params(state, like)
    assert notes == []
    _assert_forward_match(model, params, tmodel)


def test_wrapper_and_dataparallel_prefix(tmp_path):
    """{'state_dict': ...} wrapper + 'module.' prefixes are unwrapped."""
    torch.manual_seed(1)
    tmodel = TorchMirror(CFG).eval()
    wrapped = {
        "epoch": 7,
        "state_dict": {
            "module." + k: v for k, v in tmodel.state_dict().items()
        },
    }
    path = os.path.join(tmp_path, "ckpt.pt")
    torch.save(wrapped, path)
    state = ti.load_torch_state(path)
    model, like = _template(CFG)
    params, _ = ti.import_torch_params(state, like)
    _assert_forward_match(model, params, tmodel)


class _BiasedMirror(TorchMirror):
    """Reference variant: conv bias=True before InstanceNorm (the IN mean
    subtraction makes the bias a no-op — the importer drops it)."""

    def __init__(self, cfg):
        super().__init__(cfg)
        with torch.no_grad():
            for blk in self.blocks:
                for c in ("c1", "c2"):
                    old = blk[c]
                    new = nn.Conv3d(
                        old.in_channels, old.out_channels, 3, padding=1,
                        bias=True,
                    )
                    new.weight.copy_(old.weight)
                    nn.init.normal_(new.bias, std=0.5)  # nonzero on purpose
                    blk[c] = new


def test_conv_bias_absorbed_by_instancenorm():
    torch.manual_seed(2)
    tmodel = _BiasedMirror(CFG).eval()
    model, like = _template(CFG)
    state = ti.flatten_state_dict(tmodel.state_dict())
    params, notes = ti.import_torch_params(state, like)
    assert any("absorbed" in n for n in notes)
    # the forward itself proves absorption: biased torch == bias-free JAX
    _assert_forward_match(model, params, tmodel)


class _NoAffineMirror(TorchMirror):
    """InstanceNorm3d(affine=False) variant -> identity scale/bias fill."""

    def __init__(self, cfg):
        super().__init__(cfg)
        for blk in self.blocks:
            for n in ("n1", "n2"):
                blk[n] = nn.InstanceNorm3d(
                    blk[n].num_features, affine=False, eps=1e-5
                )


def test_instancenorm_without_affine_fills_identity():
    torch.manual_seed(4)
    tmodel = _NoAffineMirror(CFG).eval()
    model, like = _template(CFG)
    state = ti.flatten_state_dict(tmodel.state_dict())
    params, notes = ti.import_torch_params(state, like)
    assert any("affine=False" in n for n in notes)
    _assert_forward_match(model, params, tmodel)


def test_shape_mismatch_is_a_clear_error():
    torch.manual_seed(5)
    tmodel = TorchMirror(
        UNetConfig(levels=3, base_features=16, max_features=64)
    ).eval()
    _, like = _template(CFG)  # template at base 8 — widths disagree
    state = ti.flatten_state_dict(tmodel.state_dict())
    with pytest.raises(ti.TorchImportError, match="does not match"):
        ti.import_torch_params(state, like)


def test_explicit_mapping(tmp_path):
    """--map path: every slot looked up by torch key, order-independent."""
    torch.manual_seed(6)
    tmodel = TorchMirror(CFG).eval()
    model, like = _template(CFG)
    state = ti.flatten_state_dict(tmodel.state_dict())
    params, _ = ti.import_torch_params(state, like, _mirror_mapping(like))
    _assert_forward_match(model, params, tmodel)


def test_cli_end_to_end(tmp_path, monkeypatch):
    """CLI writes the export predict/serve load (unit preset has no plain-
    stem parity net small enough, so drive the library path through the
    CLI's own template recipe via --out + reference_parity would be huge;
    instead patch a tiny preset)."""
    import dataclasses

    from brats2019_tpu.cli import import_torch as cli
    from brats2019_tpu.configs import presets

    tiny = dataclasses.replace(
        presets.get_preset("reference_parity"),
        unet=CFG,
        workdir=os.path.join(tmp_path, "run"),
    )
    monkeypatch.setitem(presets.PRESETS, "reference_parity", tiny)

    torch.manual_seed(7)
    tmodel = TorchMirror(CFG).eval()
    src = os.path.join(tmp_path, "ref.pt")
    torch.save(tmodel.state_dict(), src)

    rc = cli.main([src, "--preset", "reference_parity", "--stage", "fine"])
    assert rc == 0
    out = os.path.join(tmp_path, "run", "fine", "params.npz")
    assert os.path.exists(out)

    model, like = _template(CFG)
    params = import_params(out, like)
    _assert_forward_match(model, params, tmodel)


def test_cli_rejects_s2d_preset(tmp_path):
    from brats2019_tpu.cli import import_torch as cli

    torch.manual_seed(8)
    src = os.path.join(tmp_path, "ref.pt")
    torch.save(TorchMirror(CFG).state_dict(), src)
    rc = cli.main([src, "--preset", "inference", "--stage", "fine"])
    assert rc == 2


def _mirror_mapping(like):
    mapping = {}
    dc = sorted(
        (k for k in like["params"] if k.startswith("DoubleConv_")),
        key=lambda s: int(s.split("_")[1]),
    )
    for bi, name in enumerate(dc):
        for cna, (c, n) in (("ConvNormAct_0", ("c1", "n1")),
                            ("ConvNormAct_1", ("c2", "n2"))):
            mapping[f"{name}/{cna}/Conv_0/kernel"] = f"blocks.{bi}.{c}.weight"
            mapping[f"{name}/{cna}/in_scale"] = f"blocks.{bi}.{n}.weight"
            mapping[f"{name}/{cna}/in_bias"] = f"blocks.{bi}.{n}.bias"
    mapping["head/kernel"] = "head.weight"
    mapping["head/bias"] = "head.bias"
    return mapping


def test_safetensors_checkpoint_import(tmp_path):
    """A .safetensors checkpoint loads; because safetensors writers sort
    keys (destroying registration order), the structural matcher must
    fail LOUDLY on shape checks, and an explicit --map must succeed."""
    from safetensors.numpy import save_file

    torch.manual_seed(9)
    tmodel = TorchMirror(CFG).eval()
    path = os.path.join(tmp_path, "ref.safetensors")
    save_file(
        {k: v.numpy() for k, v in tmodel.state_dict().items()}, path
    )
    state = ti.load_torch_state(path)
    model, like = _template(CFG)
    with pytest.raises(ti.TorchImportError):  # sorted order: loud failure
        ti.import_torch_params(state, like)
    params, _ = ti.import_torch_params(state, like, _mirror_mapping(like))
    _assert_forward_match(model, params, tmodel)


@pytest.mark.parametrize(
    "levels,base,maxf",
    [(2, 4, 8), (3, 8, 16), (4, 6, 48)],
)
def test_structural_import_across_topologies(levels, base, maxf):
    """The order+shape matcher must hold for any depth/width the config
    space allows, not just the golden-parity size."""
    cfg = UNetConfig(
        levels=levels, base_features=base, max_features=maxf,
        compute_dtype="float32",
    )
    torch.manual_seed(levels * 100 + base)
    tmodel = TorchMirror(cfg).eval()
    model = UNet3D(cfg)
    sz = max(16, 2 ** (levels - 1) * 2)
    like = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, sz, sz, sz, 4))
    )
    params, notes = ti.import_torch_params(
        ti.flatten_state_dict(tmodel.state_dict()), like
    )
    assert notes == []
    x = np.random.default_rng(1).normal(size=(1, sz, sz, sz, 4)).astype(
        np.float32
    )
    jl = np.asarray(model.apply(params, jnp.asarray(x)))
    tl = _forward_torch(tmodel, x)
    np.testing.assert_allclose(jl, tl, atol=5e-4, rtol=1e-3)


def test_mapping_file_validation(tmp_path):
    bad = os.path.join(tmp_path, "m.json")
    with open(bad, "w") as f:
        json.dump(["not", "a", "dict"], f)
    with pytest.raises(ti.TorchImportError, match="--map"):
        ti.load_mapping(bad)
