"""Two-stage coarse-to-fine cascade with on-device crop handoff
(SURVEY.md C8; BASELINE.json:9 "coarse 64^3 localization -> fine 128^3
refinement crop").

The reference runs stage 1 on a downsampled volume on the GPU, pulls the
argmax to the host, computes a tumor bounding box in NumPy, crops, and feeds
stage 2. Here the ENTIRE cascade — downsample, coarse forward, tumor-bbox
extraction (masked index reductions), clamped fixed-size ROI crop, fine
sliding-window sweep with TTA, and paste-back — is one jitted XLA program:
the handoff never leaves the device, and every shape is static (the ROI is a
fixed-size window clamped inside the canvas; SURVEY.md §7.3.2).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.presets import InferenceConfig
from ..data.preprocess import centered_crop_start, mask_bbox_center, zscore
from ..ops.resize import resize_trilinear
from ..infer.tiling import blend_weight, sliding_window_probs, tile_origins
from ..infer.tta import tta_probs, tta_reduce, tta_stack


def make_predict_fn(
    fine_apply: Callable,
    cfg: InferenceConfig,
    canvas: Tuple[int, int, int],
    num_classes: int = 4,
    coarse_apply: Optional[Callable] = None,
    allow_split: bool = True,
):
    """Build the jitted whole-canvas predictor.

    fine_apply/coarse_apply: (params, batch) -> logits.
    Returns predict(params_fine, params_coarse_or_None, image (X,Y,Z,C) raw)
    -> (labels_roi uint8, start int32 (3,)): the segmented ROI plus its
    placement in the canvas (the full canvas is ROI-labels pasted on zeros —
    done host-side to keep the device->host fetch small).

    The canvas is the static padded shape every case is fitted to
    (host-side bbox crop + center pad; see infer/predictor.py).
    """
    tile = tuple(cfg.tile)
    use_cascade = cfg.cascade and coarse_apply is not None
    weight_np = blend_weight(tile, cfg.blend, cfg.gaussian_sigma_frac)

    roi = tuple(min(r, c) for r, c in zip(cfg.roi_shape, canvas))
    sweep_shape = roi if use_cascade else canvas
    origins_np = tile_origins(sweep_shape, tile, cfg.overlap)

    # flagship fast path: single-tile ROI + 8-flip TTA is split into TWO
    # chained programs at the flip-stack so the b8 forward consumes a
    # canonically laid-out jit RESULT — any spatial-permutation producer
    # (rev/gather) inside one program re-lays-out the conv input and costs
    # ~23 ms/volume on v5e even behind an optimization_barrier (PERF.md
    # "TTA flip layout"). Blending is skipped: with one origin the
    # weight-normalized canvas equals the tile probs exactly.
    split_tta = (
        allow_split and use_cascade and cfg.tta_flips
        and len(origins_np) == 1 and tuple(roi) == tile
    )

    def fine_tile_probs(params, patch):
        return tta_probs(
            fine_apply, params, patch,
            enabled=cfg.tta_flips, precision=cfg.tta_precision,
        )

    def predict(params_fine, params_coarse, image):
        image = zscore(image.astype(jnp.float32))
        weight = jnp.asarray(weight_np)

        if use_cascade:
            # stage 1: whole volume at low resolution
            coarse_in = resize_trilinear(image, cfg.coarse_shape)
            logits_c = coarse_apply(params_coarse, coarse_in[None])[0]
            tumor = jnp.argmax(logits_c, axis=-1) > 0
            center_c = mask_bbox_center(tumor)
            # map coarse-grid center back to canvas coordinates
            scale = jnp.array(
                [c / s for c, s in zip(canvas, cfg.coarse_shape)], jnp.float32
            )
            center = (center_c.astype(jnp.float32) * scale).astype(jnp.int32)
            start = centered_crop_start(center, roi, canvas)
            o = (start[0], start[1], start[2], jnp.int32(0))
            region = jax.lax.dynamic_slice(
                image, o, roi + (image.shape[-1],)
            )
        else:
            region = image

        probs_r = sliding_window_probs(
            lambda p: fine_tile_probs(params_fine, p),
            region,
            origins_np,
            tile,
            weight,
            num_classes,
        )

        labels_r = jnp.argmax(probs_r, axis=-1).astype(jnp.uint8)
        if cfg.postproc == "device":
            labels_r = _postprocess_device(
                labels_r, cfg.min_component_voxels, cfg.et_min_voxels
            )

        # return only the ROI labels + placement: the fetch back to the host
        # is 3-4x smaller than a full canvas and the host paste is a memcpy
        # (the probability canvas was dead weight — never fetched)
        if use_cascade:
            return labels_r, start
        return labels_r, jnp.zeros((3,), jnp.int32)

    if not split_tta:
        return jax.jit(predict)

    store_dt = (
        jnp.bfloat16 if cfg.tta_precision == "bfloat16" else jnp.float32
    )

    def stage_roi(params_coarse, image):
        """z-score + coarse localization + ROI slice + flip-stack."""
        image = zscore(image.astype(jnp.float32))
        coarse_in = resize_trilinear(image, cfg.coarse_shape)
        logits_c = coarse_apply(params_coarse, coarse_in[None])[0]
        tumor = jnp.argmax(logits_c, axis=-1) > 0
        center_c = mask_bbox_center(tumor)
        scale = jnp.array(
            [c / s for c, s in zip(canvas, cfg.coarse_shape)], jnp.float32
        )
        center = (center_c.astype(jnp.float32) * scale).astype(jnp.int32)
        start = centered_crop_start(center, roi, canvas)
        o = (start[0], start[1], start[2], jnp.int32(0))
        region = jax.lax.dynamic_slice(image, o, roi + (image.shape[-1],))
        return tta_stack(region, cfg.tta_precision), start

    def stage_fine(params_fine, tiles):
        """Pure b8 TTA forward + softmax — NO spatial permutations in this
        program: the unflips live in stage_reduce behind another jit
        boundary, because reverses poison the conv layouts from the output
        side exactly as from the input side (PERF.md)."""
        logits = fine_apply(params_fine, tiles)
        probs8 = jax.nn.softmax(logits.astype(jnp.float32), -1)
        return probs8.astype(store_dt)

    def stage_reduce(probs8, start):
        """Unflip + mean + argmax (+ device postproc). ``start`` is
        threaded through so every output depends on the whole chain — a
        fetch of either output synchronizes all three programs."""
        probs = tta_reduce(probs8)
        labels_r = jnp.argmax(probs, axis=-1).astype(jnp.uint8)
        if cfg.postproc == "device":
            labels_r = _postprocess_device(
                labels_r, cfg.min_component_voxels, cfg.et_min_voxels
            )
        return labels_r, start

    def stage_fine_pair(params_fine, tiles_a, tiles_b):
        """Two volumes' TTA stacks through ONE b16 fine program — ~13%
        better per-sample device throughput than two b8 dispatches
        (PERF.md "Cross-volume batching headroom"); used by the serving
        path when InferenceConfig.batch_volumes >= 2."""
        n = tiles_a.shape[0]
        logits = fine_apply(params_fine, jnp.concatenate([tiles_a, tiles_b]))
        probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(store_dt)
        return probs[:n], probs[n:]

    j_roi = jax.jit(stage_roi)
    j_fine = jax.jit(stage_fine)
    j_reduce = jax.jit(stage_reduce)

    def predict_split(params_fine, params_coarse, image):
        tiles, start = j_roi(params_coarse, image)
        probs8 = j_fine(params_fine, tiles)
        return j_reduce(probs8, start)

    predict_split.stages = (j_roi, j_fine, j_reduce)  # for stage profiling
    predict_split.fine_pair = jax.jit(stage_fine_pair)
    return predict_split


def _postprocess_device(
    labels: jnp.ndarray, min_component_voxels: int, et_min_voxels: int
) -> jnp.ndarray:
    """C16 postprocessing fused into the predict program: small-component
    removal (26-connectivity label propagation) + tiny-ET suppression.
    Runs on the ROI/canvas labels so the host only un-crops and writes."""
    from ..ops.connected_components import component_sizes, label_components

    if min_component_voxels > 1:
        comp = label_components(labels > 0)
        sizes = component_sizes(comp)
        labels = jnp.where(sizes >= min_component_voxels, labels, 0).astype(
            jnp.uint8
        )
    if et_min_voxels > 0:
        et = labels == 3
        n_et = jnp.sum(et)
        relabel = (n_et > 0) & (n_et < et_min_voxels)
        labels = jnp.where(relabel & et, jnp.uint8(1), labels)
    return labels
