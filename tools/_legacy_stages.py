"""Reconstruct the PRE-merge 3-stage split-predict decomposition
(roi | fine -> probs8 | reduce) that several round-3 archival experiments
measured against. HEAD ships the merged 2-stage path
(models/cascade.py: ``predict_split.stages == (j_roi, j_finish)``, commit
12c9fc8 "Low-res TTA reduce"), so the old fine/reduce programs no longer
exist in the library; this shim rebuilds them so the experiments that
recorded the PERF.md round-3 comparisons stay runnable at HEAD.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from brats2019_tpu.infer.tta import tta_reduce


def legacy_stages(predict_split, fine_apply, store_dt=jnp.bfloat16):
    """(j_roi, j_fine, j_reduce) with the pre-12c9fc8 semantics:
    j_fine emits the full-res 8-flip softmax probs stack in ``store_dt``;
    j_reduce unflips/means/argmaxes it at full resolution."""
    j_roi = predict_split.stages[0]

    def stage_fine(params, tiles):
        logits = fine_apply(params, tiles)
        return jax.nn.softmax(
            logits.astype(jnp.float32), -1
        ).astype(store_dt)

    def stage_reduce(probs8, start):
        probs = tta_reduce(probs8)
        return jnp.argmax(probs, -1).astype(jnp.uint8), start

    return j_roi, jax.jit(stage_fine), jax.jit(stage_reduce)
