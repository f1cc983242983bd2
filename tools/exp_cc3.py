"""Round-3: acceptance measurement for the two-phase CC rework — new
label_components + component_sizes on the realistic mask, and the FULL
predict program with postproc="device" vs "host" (the serve-default
decision, VERDICT round-2 #5).
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses
import time

import jax.numpy as jnp
import numpy as np

from brats2019_tpu.ops.connected_components import component_sizes, label_components
from tools.exp_cc import make_mask, timed


def main():
    fg = jnp.asarray(make_mask())
    t_label = timed(label_components, fg)
    comp = label_components(fg)
    t_sizes = timed(component_sizes, comp)
    print(f"two-phase label_components: {t_label*1e3:6.1f} ms")
    print(f"component_sizes:            {t_sizes*1e3:6.1f} ms")

    # full predict program A/B: postproc device vs host
    from brats2019_tpu.configs import get_preset
    from brats2019_tpu.data.synthetic import make_case_arrays
    from brats2019_tpu.infer.predictor import Predictor
    from brats2019_tpu.models import UNet3D

    exp = get_preset("inference")

    def init_params(cfg, seed):
        return UNet3D(cfg).init(jax.random.PRNGKey(seed),
                                jnp.zeros((1, 16, 16, 16, 4)))

    pf, pc = init_params(exp.unet, 0), init_params(exp.coarse_unet, 1)
    case = make_case_arrays(seed=0, shape=(240, 240, 155))[0]

    results = {}
    for mode in ("host", "device"):
        e = dataclasses.replace(
            exp, infer=dataclasses.replace(exp.infer, postproc=mode)
        )
        pred = Predictor(e, pf, pc)
        x = pred._prep_to(case, pred._default_dev)[0]

        def run(pf_, pc_, x_):
            return pred._fn(pf_, pc_, x_)

        t = timed(run, pred.params_fine, pred.params_coarse, x)
        results[mode] = t
        print(f"predict program, postproc={mode}: {t*1e3:6.1f} ms")
    print(f"device-postproc overhead: "
          f"{(results['device']-results['host'])*1e3:+.1f} ms "
          f"(host scipy CC costs ~108 ms host-side per volume)")


if __name__ == "__main__":
    main()
