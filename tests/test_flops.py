"""FLOPs accounting (utils/flops.py) vs XLA's own cost analysis — the
numbers behind the reported MFU must track the real program."""

import jax
import jax.numpy as jnp
import pytest

from brats2019_tpu.models import UNet3D, UNetConfig
from brats2019_tpu.utils.flops import unet_forward_flops


@pytest.mark.parametrize(
    "cfg,spatial",
    [
        (UNetConfig(levels=2, base_features=8, compute_dtype="float32"), (16, 16, 16)),
        (
            UNetConfig(
                levels=3, base_features=8, max_features=32,
                stem_downsample=2, compute_dtype="float32",
            ),
            (32, 32, 32),
        ),
    ],
)
def test_unet_flops_match_xla_cost_analysis(cfg, spatial):
    model = UNet3D(cfg)
    x = jnp.zeros((1,) + spatial + (4,))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8, 4)))
    compiled = jax.jit(lambda p, v: model.apply(p, v)).lower(params, x).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    xla_flops = float(ca["flops"])
    ours = unet_forward_flops(cfg, spatial)
    # convs carry >99% of the arithmetic; XLA counts every op, we count
    # convs only — agree within 15%
    assert ours == pytest.approx(xla_flops, rel=0.15), (ours, xla_flops)
