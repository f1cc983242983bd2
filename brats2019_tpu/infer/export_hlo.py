"""Serialized StableHLO export of the predict program (deployment interop).

``export --stablehlo`` emits the compiled-from-anywhere form of the
serving program: portable StableHLO modules (jax.export serialization)
that any PJRT-based runtime — another JAX process, IFRT proxy, a C++
loader — can deserialize and run WITHOUT this package or Python model
code. The reference has no deployment-artifact story (its checkpoint IS
torch pickle); this is the TPU-native equivalent of an ONNX export.

Artifacts, written to ``<workdir>/<stage-dir>/stablehlo/``:

* split cascade fast path (the flagship serving program): two modules —
  ``stage_roi.stablehlo``   (params_coarse, image canvas) -> (tiles, start)
  ``stage_fine.stablehlo``  (params_fine, tiles, start) -> (labels_roi, start)
  — mirroring the two-program structure the serving path runs (the split
  exists for XLA layout reasons, PERF.md "TTA flip layout"; a fused
  export would reintroduce the poisoned-layout tax on real hardware).
* every other config: one ``predict.stablehlo``
  (params_fine, params_coarse_or_none, image) -> (labels_roi, start).
* ``manifest.json``: jax/serialization versions, preset, canvas/tile,
  per-module flattened input signatures (shape + dtype strings), so a
  non-Python consumer can wire buffers without tracing anything.

Weights are runtime INPUTS (the module is weight-agnostic); pair it with
the ``params.{npz,safetensors}`` export from the same CLI.
"""

from __future__ import annotations

import json
import os
from typing import List

import jax
import numpy as np


def _sig(exp_module) -> list:
    return [
        {"shape": list(a.shape), "dtype": str(a.dtype)}
        for a in exp_module.in_avals
    ]


def _serialize(fn, args, path: str) -> dict:
    from jax import export as jex

    exported = jex.export(jax.jit(fn))(*args)
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)
    return {
        "file": os.path.basename(path),
        "bytes": len(data),
        "inputs_flat": _sig(exported),
    }


def export_predict_stablehlo(
    predictor, out_dir: str, check: bool = False
) -> List[str]:
    """Export ``predictor``'s device program(s) as serialized StableHLO.

    check=True deserializes each module and runs it on a zeros canvas,
    asserting exact equality with the live program (compile-time cost —
    meant for CI/spot checks, not every export).
    """
    os.makedirs(out_dir, exist_ok=True)
    # remove stale artifacts first: run_exported dispatches on file
    # existence, so a leftover stage_roi.stablehlo from a previous cascade
    # export would shadow a freshly-written no-cascade program
    for fn_old in os.listdir(out_dir):
        if fn_old.endswith(".stablehlo") or fn_old == "manifest.json":
            os.remove(os.path.join(out_dir, fn_old))
    fn = predictor._fn
    canvas = predictor.canvas
    image_aval = jax.ShapeDtypeStruct(tuple(canvas) + (4,), jax.numpy.bfloat16)
    pf = predictor.params_fine
    pc = predictor.params_coarse
    manifest: dict = {
        "jax_version": jax.__version__,
        "preset": predictor.exp.name,
        "canvas": list(canvas),
        "tile": list(predictor.exp.infer.tile),
        "modules": {},
    }
    written: List[str] = []

    if hasattr(fn, "stages"):
        j_roi, j_finish = fn.stages
        roi_path = os.path.join(out_dir, "stage_roi.stablehlo")
        manifest["modules"]["stage_roi"] = _serialize(
            j_roi, (pc, image_aval), roi_path
        )
        written.append(roi_path)
        tiles_aval, start_aval = jax.eval_shape(j_roi, pc, image_aval)
        fine_path = os.path.join(out_dir, "stage_fine.stablehlo")
        manifest["modules"]["stage_fine"] = _serialize(
            j_finish, (pf, tiles_aval, start_aval), fine_path
        )
        written.append(fine_path)
        manifest["pipeline"] = [
            "stage_roi(params_coarse, image) -> (tiles, start)",
            "stage_fine(params_fine, tiles, start) -> (labels_roi, start)",
        ]
    else:
        pred_path = os.path.join(out_dir, "predict.stablehlo")
        manifest["modules"]["predict"] = _serialize(
            fn, (pf, pc, image_aval), pred_path
        )
        written.append(pred_path)
        manifest["pipeline"] = [
            "predict(params_fine, params_coarse_or_none, image)"
            " -> (labels_roi, start)"
        ]

    if check:
        _roundtrip_check(predictor, out_dir, image_aval)
        manifest["checked"] = True

    man_path = os.path.join(out_dir, "manifest.json")
    with open(man_path, "w") as f:
        json.dump(manifest, f, indent=1)
    written.append(man_path)
    return written


def run_exported(out_dir: str, params_fine, params_coarse, image):
    """Drive the exported module(s) end-to-end via jax.export.deserialize —
    exactly what a JAX-side consumer does. Returns (labels_roi, start)."""
    from jax import export as jex

    def load(name):
        with open(os.path.join(out_dir, name), "rb") as f:
            return jex.deserialize(f.read())

    if os.path.exists(os.path.join(out_dir, "stage_roi.stablehlo")):
        tiles, start = load("stage_roi.stablehlo").call(params_coarse, image)
        return load("stage_fine.stablehlo").call(params_fine, tiles, start)
    return load("predict.stablehlo").call(params_fine, params_coarse, image)


def _roundtrip_check(predictor, out_dir: str, image_aval) -> None:
    image = np.zeros(image_aval.shape, dtype=np.float32)
    # a deterministic non-trivial pattern so argmax paths are exercised
    image[...] = np.linspace(-1, 1, image.size).reshape(image.shape)
    image_bf16 = jax.numpy.asarray(image, dtype=image_aval.dtype)
    live_labels, live_start = jax.tree_util.tree_map(
        np.asarray,
        predictor._fn(predictor.params_fine, predictor.params_coarse,
                      image_bf16),
    )
    exp_labels, exp_start = jax.tree_util.tree_map(
        np.asarray,
        run_exported(out_dir, predictor.params_fine,
                     predictor.params_coarse, image_bf16),
    )
    np.testing.assert_array_equal(live_labels, exp_labels)
    np.testing.assert_array_equal(live_start, exp_start)
