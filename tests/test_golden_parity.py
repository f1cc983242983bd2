"""Golden parity: JAX UNet vs an independent torch-CPU mirror
(SURVEY.md §4.3 "Golden parity" — stands in for exact-reference comparison
while the reference mount is empty).

Weights are ported JAX -> torch; logits must match to float tolerance and
argmax masks exactly. This pins the semantics of every building block
(conv padding, InstanceNorm epsilon/biased-variance, avg-pool downsample,
half-pixel trilinear upsample, head conv).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from brats2019_tpu.models import UNet3D, UNetConfig

LEVELS = 3
BASE = 8
CFG = UNetConfig(
    levels=LEVELS, base_features=BASE, max_features=32, compute_dtype="float32"
)


class TorchMirror(nn.Module):
    """Independent torch re-statement of UNet3D (plain stem)."""

    def __init__(self, cfg: UNetConfig):
        super().__init__()
        feats = [cfg.feats(l) for l in range(cfg.levels)]
        self.levels = cfg.levels

        def double(cin, cout):
            return nn.ModuleDict(
                {
                    "c1": nn.Conv3d(cin, cout, 3, padding=1, bias=False),
                    "n1": nn.InstanceNorm3d(cout, affine=True, eps=1e-5),
                    "c2": nn.Conv3d(cout, cout, 3, padding=1, bias=False),
                    "n2": nn.InstanceNorm3d(cout, affine=True, eps=1e-5),
                }
            )

        self.blocks = nn.ModuleList()
        c = cfg.in_channels
        for f in feats:  # encoder order
            self.blocks.append(double(c, f))
            c = f
        for l in reversed(range(cfg.levels - 1)):  # decoder application order
            self.blocks.append(double(feats[l] + feats[l + 1 if l + 1 < cfg.levels else l], feats[l]))
        self.head = nn.Conv3d(feats[0], cfg.num_classes, 1)

    @staticmethod
    def _apply_double(blk, x):
        x = F.relu(blk["n1"](blk["c1"](x)))
        return F.relu(blk["n2"](blk["c2"](x)))

    def forward(self, x):  # x: NCDHW
        skips = []
        bi = 0
        for l in range(self.levels):
            x = self._apply_double(self.blocks[bi], x)
            bi += 1
            if l < self.levels - 1:
                skips.append(x)
                x = F.avg_pool3d(x, 2)
        for l in reversed(range(self.levels - 1)):
            x = F.interpolate(
                x, scale_factor=2, mode="trilinear", align_corners=False
            )
            x = torch.cat([x, skips[l]], dim=1)
            x = self._apply_double(self.blocks[bi], x)
            bi += 1
        return self.head(x)


def port_jax_to_torch(params, tmodel: TorchMirror):
    p = params["params"]
    dc_names = sorted(
        (k for k in p if k.startswith("DoubleConv_")),
        key=lambda s: int(s.split("_")[1]),
    )
    assert len(dc_names) == len(tmodel.blocks)
    with torch.no_grad():
        for name, blk in zip(dc_names, tmodel.blocks):
            for cna, (c, n) in (("ConvNormAct_0", ("c1", "n1")),
                                ("ConvNormAct_1", ("c2", "n2"))):
                sub = p[name][cna]
                kernel = np.asarray(sub["Conv_0"]["kernel"])  # (3,3,3,in,out)
                blk[c].weight.copy_(
                    torch.from_numpy(kernel.transpose(4, 3, 0, 1, 2).copy())
                )
                blk[n].weight.copy_(torch.from_numpy(np.asarray(sub["in_scale"])))
                blk[n].bias.copy_(torch.from_numpy(np.asarray(sub["in_bias"])))
        hk = np.asarray(p["head"]["kernel"])  # (1,1,1,in,out)
        tmodel.head.weight.copy_(
            torch.from_numpy(hk.transpose(4, 3, 0, 1, 2).copy())
        )
        tmodel.head.bias.copy_(torch.from_numpy(np.asarray(p["head"]["bias"])))


@pytest.fixture(scope="module")
def models():
    model = UNet3D(CFG)
    params = model.init(
        jax.random.PRNGKey(42), jnp.zeros((1, 16, 16, 16, 4))
    )
    tmodel = TorchMirror(CFG).eval()
    port_jax_to_torch(params, tmodel)
    return model, params, tmodel


def test_logits_match(models):
    model, params, tmodel = models
    x = np.random.default_rng(0).normal(size=(2, 16, 16, 16, 4)).astype(np.float32)
    jl = np.asarray(model.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        tl = tmodel(torch.from_numpy(x.transpose(0, 4, 1, 2, 3).copy()))
    tl = tl.numpy().transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(jl, tl, atol=2e-4, rtol=1e-3)


def test_argmax_masks_match_exactly(models):
    model, params, tmodel = models
    x = np.random.default_rng(1).normal(size=(1, 32, 32, 16, 4)).astype(np.float32)
    jl = np.asarray(model.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        tl = tmodel(torch.from_numpy(x.transpose(0, 4, 1, 2, 3).copy()))
    tl = tl.numpy().transpose(0, 2, 3, 4, 1)
    jm, tm = jl.argmax(-1), tl.argmax(-1)
    # near-ties can legally differ across backends; require <0.1% disagreement
    # and exact agreement away from ties
    disagree = (jm != tm).mean()
    assert disagree < 1e-3, f"mask disagreement {disagree:.5f}"
    margin = np.sort(jl, axis=-1)
    tie = (margin[..., -1] - margin[..., -2]) < 1e-4
    assert (jm == tm)[~tie].all()


def test_gradients_match(models):
    """Backward parity: d(loss)/d(input) and d(loss)/d(params) must match
    torch autograd through the full net. Pins the BACKWARD semantics of
    every block (conv transpose, InstanceNorm backward incl. the biased-
    variance correction, avg-pool backward, half-pixel trilinear VJP) the
    same way the forward tests pin the forward. Loss = mean(softmax(l)*W)
    with fixed W: smooth, touches every output, framework-neutral."""
    model, params, tmodel = models
    rng = np.random.default_rng(7)
    x = rng.normal(size=(1, 16, 16, 16, 4)).astype(np.float32)
    w = rng.normal(size=(1, 16, 16, 16, CFG.num_classes)).astype(np.float32)

    def jloss(params, x):
        logits = model.apply(params, x)
        return jnp.mean(jax.nn.softmax(logits, -1) * w)

    jgx, jgp = jax.grad(jloss, argnums=(1, 0))(params, jnp.asarray(x))
    jgx = np.asarray(jgx)

    tx = torch.from_numpy(x.transpose(0, 4, 1, 2, 3).copy()).requires_grad_()
    tw = torch.from_numpy(w.transpose(0, 4, 1, 2, 3).copy())
    tmodel.zero_grad()
    tloss = (torch.softmax(tmodel(tx), dim=1) * tw).mean()
    tloss.backward()
    tgx = tx.grad.numpy().transpose(0, 2, 3, 4, 1)

    scale = np.abs(tgx).max()
    np.testing.assert_allclose(jgx, tgx, atol=2e-5 * scale, rtol=2e-3)

    # parameter grads: first conv kernel, a decoder IN scale, head kernel
    p = jgp["params"]
    first = np.asarray(
        p["DoubleConv_0"]["ConvNormAct_0"]["Conv_0"]["kernel"]
    ).transpose(4, 3, 0, 1, 2)
    t_first = tmodel.blocks[0]["c1"].weight.grad.numpy()
    np.testing.assert_allclose(
        first, t_first, atol=2e-5 * np.abs(t_first).max(), rtol=2e-3
    )

    last_dc = sorted(
        (k for k in p if k.startswith("DoubleConv_")),
        key=lambda s: int(s.split("_")[1]),
    )[-1]
    j_scale = np.asarray(p[last_dc]["ConvNormAct_1"]["in_scale"])
    t_scale = tmodel.blocks[-1]["n2"].weight.grad.numpy()
    np.testing.assert_allclose(
        j_scale, t_scale, atol=2e-5 * np.abs(t_scale).max(), rtol=2e-3
    )

    head = np.asarray(p["head"]["kernel"]).transpose(4, 3, 0, 1, 2)
    t_head = tmodel.head.weight.grad.numpy()
    np.testing.assert_allclose(
        head, t_head, atol=2e-5 * np.abs(t_head).max(), rtol=2e-3
    )
