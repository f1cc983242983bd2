"""Full predict-pipeline golden parity (SURVEY.md §4.3; north-star
"matching the reference's segmentation masks ... exactly"):

the whole jitted path — z-score -> static tile grid -> 8-flip TTA ->
Gaussian overlap blending -> argmax — against an independent torch/NumPy
re-implementation of the reference's per-tile loop, sharing only the
ported weights. Probabilities must match to float tolerance; argmax masks
must agree everywhere away from numerical ties."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import torch

from brats2019_tpu.configs.presets import (
    ExperimentConfig,
    InferenceConfig,
    TrainConfig,
)
from brats2019_tpu.data.synthetic import make_case_arrays
from brats2019_tpu.infer.predictor import Predictor
from brats2019_tpu.infer.tiling import blend_weight, tile_origins
from brats2019_tpu.models import UNet3D, UNetConfig

from test_golden_parity import TorchMirror, port_jax_to_torch

CFG = UNetConfig(
    levels=2, base_features=4, max_features=8, compute_dtype="float32"
)
TILE = (16, 16, 16)


def _torch_reference_pipeline(image: np.ndarray, tmodel) -> np.ndarray:
    """Reference-style host pipeline: NumPy z-score + bbox crop + canvas fit
    (the shared host helpers), python tile loop, per-flip torch forwards,
    NumPy weighted blending."""
    from brats2019_tpu.data.pipeline import fit_to_canvas
    from brats2019_tpu.data.preprocess import brain_bbox_np, crop_np, zscore_np

    import ml_dtypes

    bbox = brain_bbox_np(image)
    cropped = crop_np(image, bbox)
    canvas = fit_to_canvas(cropped.astype(np.float32), (32, 32, 32))
    # the pipeline spec ships the canvas bf16 (PERF.md); quantize identically
    canvas = canvas.astype(ml_dtypes.bfloat16).astype(np.float32)
    z = zscore_np(canvas)
    X, Y, Z = z.shape[:3]
    origins = tile_origins((X, Y, Z), TILE, overlap=0.5)
    w = blend_weight(TILE, "gaussian")  # (t,t,t,1)
    canvas = np.zeros((X, Y, Z, 4), np.float64)
    wsum = np.zeros((X, Y, Z, 1), np.float64)
    flips = list(itertools.product((False, True), repeat=3))
    with torch.no_grad():
        for o in origins:
            tile = z[o[0]:o[0]+TILE[0], o[1]:o[1]+TILE[1], o[2]:o[2]+TILE[2]]
            acc = np.zeros(TILE + (4,), np.float64)
            for f in flips:
                t = tile
                for ax, flag in enumerate(f):
                    if flag:
                        t = np.flip(t, axis=ax)
                x = torch.from_numpy(
                    np.ascontiguousarray(t.transpose(3, 0, 1, 2)[None])
                )
                logits = tmodel(x).numpy()[0].transpose(1, 2, 3, 0)
                probs = np.exp(logits - logits.max(-1, keepdims=True))
                probs = probs / probs.sum(-1, keepdims=True)
                for ax, flag in enumerate(f):
                    if flag:
                        probs = np.flip(probs, axis=ax)
                acc += probs
            acc /= len(flips)
            sl = tuple(slice(o[i], o[i] + TILE[i]) for i in range(3))
            canvas[sl] += acc * w
            wsum[sl] += w
    return canvas / np.maximum(wsum, 1e-8)


def test_whole_pipeline_matches_torch_reference():
    exp = ExperimentConfig(
        name="parity",
        unet=CFG,
        coarse_unet=None,
        train=TrainConfig(pool_shape=(32, 32, 32)),
        infer=InferenceConfig(
            canvas=(32, 32, 32), tile=TILE, overlap=0.5, blend="gaussian",
            tta_flips=True, tta_precision="float32", cascade=False,
            min_component_voxels=0, et_min_voxels=0, postproc="host",
            compute_dtype="float32",
        ),
    )
    model = UNet3D(CFG)
    params = model.init(jax.random.PRNGKey(11), jnp.zeros((1, 16, 16, 16, 4)))
    tmodel = TorchMirror(CFG).eval()
    port_jax_to_torch(params, tmodel)

    image, _ = make_case_arrays(seed=7, shape=(32, 32, 32))
    pred = Predictor(exp, params)
    ours, _ = pred.predict_arrays(image)

    ref_probs = _torch_reference_pipeline(image, tmodel)
    ref_mask_canvas = ref_probs.argmax(-1).astype(np.uint8)
    # un-fit/un-crop the reference mask with the same predictor helpers
    from brats2019_tpu.data.preprocess import brain_bbox_np, crop_np

    bbox = brain_bbox_np(image)
    ref_mask = pred._uncrop(
        ref_mask_canvas, crop_np(image, bbox).shape[:3], bbox
    )
    margin = np.sort(ref_probs, axis=-1)
    tie_canvas = (margin[..., -1] - margin[..., -2]) < 2e-4
    tie = pred._uncrop(
        tie_canvas.astype(np.uint8), crop_np(image, bbox).shape[:3], bbox
    ).astype(bool)
    agree = (ours == ref_mask) | tie
    assert agree.mean() > 0.999, f"mask agreement {agree.mean():.5f}"
    assert (ours == ref_mask)[~tie].all()
