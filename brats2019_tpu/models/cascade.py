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
    fine_lowres_apply: Optional[Callable] = None,
    stem: int = 1,
):
    """Build the jitted whole-canvas predictor.

    fine_apply/coarse_apply: (params, batch) -> logits.
    Returns predict(params_fine, params_coarse_or_None, image (X,Y,Z,C) raw)
    -> (labels_roi uint8, start int32 (3,)): the segmented ROI plus its
    placement in the canvas (the full canvas is ROI-labels pasted on zeros —
    done host-side to keep the device->host fetch small).

    The canvas is the static padded shape every case is fitted to
    (host-side bbox crop + center pad; see infer/predictor.py).

    ``fine_lowres_apply``: (params, batch) -> PRE-depth-to-space logits
    (models/unet3d.py ``subpixel=False``) for a ``stem``-downsampled head.
    When provided (stem > 1), the split fast path runs the whole TTA
    reduce — groupwise softmax, unflips, mean, argmax — at low resolution
    on the 32-channel-minor head output and emits labels directly from the
    fine program: bitwise-identical to the full-res reduce (d2s is a pure
    permutation; a full-res flip is a low-res flip + r-block bit swap) and
    ~20 ms/volume faster on v5e, where the full-res (...,4)-minor unflip
    passes are VPU-bound (PERF.md round 3 "Low-res TTA reduce").
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

    use_lowres = fine_lowres_apply is not None and stem > 1

    def _reduce_fullres(logits):
        """softmax -> bf16 store -> unflip -> f32 mean -> argmax at full
        resolution (stem=1 fallback; the unflips fuse with argmax so this
        merged form matches the old fine+reduce chain's cost)."""
        probs8 = jax.nn.softmax(logits.astype(jnp.float32), -1)
        probs = tta_reduce(probs8.astype(store_dt))
        return jnp.argmax(probs, axis=-1).astype(jnp.uint8)

    def _reduce_lowres(logits_lr):
        """The same math on the PRE-d2s head output (bitwise-identical):
        groupwise softmax over the K sub-axis, unflips as low-res flips +
        r-block bit swaps, f32 mean, per-block argmax, then the d2s label
        rearrange. Runs on (K*r^3)-channel-minor tensors at 1/r^3 spatial
        — ~8x better VPU utilization than the (...,K)-minor full-res form."""
        b, d, h, w, _ = logits_lr.shape
        r = stem
        g = logits_lr.reshape(b, d, h, w, r, r, r, num_classes)
        p = jax.nn.softmax(g.astype(jnp.float32), -1).astype(store_dt)
        acc = jnp.zeros(p.shape[1:], jnp.float32)
        from ..infer.tta import FLIPS

        for i, f in enumerate(FLIPS):
            q = p[i]
            axes = [ax for ax, flag in enumerate(f) if flag]
            axes += [ax + 3 for ax, flag in enumerate(f) if flag]
            if axes:
                q = jnp.flip(q, axes)
            acc = acc + q.astype(jnp.float32)
        blk = jnp.argmax(acc, -1).astype(jnp.uint8)  # (d,h,w,r,r,r)
        return blk.transpose(0, 3, 1, 4, 2, 5).reshape(d * r, h * r, w * r)

    def _finish_one(labels_r):
        if cfg.postproc == "device":
            return _postprocess_device(
                labels_r, cfg.min_component_voxels, cfg.et_min_voxels
            )
        return labels_r

    def stage_finish(params_fine, tiles, start):
        """Merged fine forward + TTA reduce: one program, labels out (the
        b8 probs stack never materializes as a program output). ``start``
        is threaded through so a fetch of either output synchronizes the
        chain."""
        if use_lowres:
            labels = _reduce_lowres(fine_lowres_apply(params_fine, tiles))
        else:
            labels = _reduce_fullres(fine_apply(params_fine, tiles))
        return _finish_one(labels), start

    def stage_finish_pair(params_fine, tiles_a, tiles_b, start_a, start_b):
        """Two volumes' TTA stacks through ONE b16 fine forward — ~13%
        better per-sample device throughput than two b8 dispatches
        (PERF.md "Cross-volume batching headroom"); used by the serving
        path when InferenceConfig.batch_volumes >= 2."""
        n = tiles_a.shape[0]
        tiles = jnp.concatenate([tiles_a, tiles_b])
        if use_lowres:
            logits = fine_lowres_apply(params_fine, tiles)
            la = _reduce_lowres(logits[:n])
            lb = _reduce_lowres(logits[n:])
        else:
            logits = fine_apply(params_fine, tiles)
            la = _reduce_fullres(logits[:n])
            lb = _reduce_fullres(logits[n:])
        return _finish_one(la), start_a, _finish_one(lb), start_b

    j_roi = jax.jit(stage_roi)
    j_finish = jax.jit(stage_finish)

    def predict_split(params_fine, params_coarse, image):
        tiles, start = j_roi(params_coarse, image)
        return j_finish(params_fine, tiles, start)

    predict_split.stages = (j_roi, j_finish)  # for stage profiling
    predict_split.fine_pair = jax.jit(stage_finish_pair)
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
