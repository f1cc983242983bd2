"""Round-3 (VERDICT #1b closing measurement): interleaved e2e A/B of the
two serving knobs under driver conditions — transfer encoding
(bfloat16 vs int8) x serving depth (1 vs 2) — run in a session where the
transfer-bound telemetry actually fired (prep+transfer ~= 69% of the
pipeline cadence), i.e. exactly the regime the int8 knob targets.

One Predictor serves all four configs: transfer_dtype and serving_depth
are read per call, the big predict program's input is the bf16 canvas
either way, and the tiny _embed program just gains an int8-input cache
entry — so no multi-minute recompiles between arms.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import statistics
import time

import jax
import jax.numpy as jnp

from brats2019_tpu.configs import get_preset
from brats2019_tpu.data.synthetic import make_case_arrays
from brats2019_tpu.infer.predictor import Predictor
from brats2019_tpu.models import UNet3D


def main():
    exp = get_preset("inference")

    def init_params(cfg, seed):
        return UNet3D(cfg).init(jax.random.PRNGKey(seed),
                                jnp.zeros((1, 16, 16, 16, 4)))

    pred = Predictor(exp, init_params(exp.unet, 0),
                     init_params(exp.coarse_unet, 1))
    cases = [make_case_arrays(seed=i, shape=(240, 240, 155))[0]
             for i in range(4)]

    print("warmup/compile ...", flush=True)
    pred.predict_arrays_many([cases[i % 4] for i in range(3)])
    # warm the int8 embed path too
    pred.exp = dataclasses.replace(
        exp, infer=dataclasses.replace(exp.infer, transfer_dtype="int8"))
    pred.predict_arrays_many([cases[i % 4] for i in range(2)])

    configs = [("bf16", 1), ("bf16", 2), ("int8", 1), ("int8", 2)]
    results = {c: [] for c in configs}
    N = 8
    for rnd in range(3):
        for dtype, depth in configs:
            pred.exp = dataclasses.replace(
                exp,
                infer=dataclasses.replace(
                    exp.infer,
                    transfer_dtype="bfloat16" if dtype == "bf16" else "int8",
                    serving_depth=depth,
                ),
            )
            pred._transfer_hinted = True  # silence the advisory mid-A/B
            stream = [cases[i % 4] for i in range(N)]
            t0 = time.time()
            outs = pred.predict_arrays_many(stream)
            wall = time.time() - t0
            assert len(outs) == N
            vps = N / wall
            results[(dtype, depth)].append(vps)
            print(f"round {rnd} {dtype} depth={depth}: {vps:.3f} vol/s "
                  f"(wall {wall:.1f}s)", flush=True)
    print("\nmedians:")
    for c, vs in results.items():
        print(f"  {c[0]} depth={c[1]}: {statistics.median(vs):.3f} vol/s "
              f"(rounds: {', '.join(f'{v:.3f}' for v in vs)})")


if __name__ == "__main__":
    main()
