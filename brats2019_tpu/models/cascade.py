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


def coarse_locate(
    coarse_apply: Callable,
    params_coarse,
    image: jnp.ndarray,
    cfg: InferenceConfig,
    canvas: Tuple[int, int, int],
    roi: Tuple[int, int, int],
):
    """Stage-1 localization: coarse forward on the resized canvas, tumor-bbox
    center mapped back to canvas coordinates, clamped fixed-size ROI slice.
    ONE module-level definition shared by the single-device predict programs
    (make_predict_fn) and the mesh-distributed cascade sweep
    (parallel/spatial.py distributed_cascade_sweep) — their output-parity
    tests assume identical localization semantics, so they must share code,
    not mirror it. ``image`` is the already z-scored (X, Y, Z, C) canvas.
    Returns (region (roi + (C,)), start (3,) int32)."""
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
    return region, start


def lowres_blend_weight(
    weight_np: np.ndarray, tile: Tuple[int, int, int], stem: int
) -> np.ndarray:
    """Blend weight in low-res block form:
    (tx, ty, tz, 1) -> (tx/r, ty/r, tz/r, r, r, r, 1) — the space-to-depth
    rearrange of the full-res weight, so low-res blended accumulation is
    the exact permutation of full-res blended accumulation. Shared by the
    staged sweep below and the distributed cascade sweep."""
    r = stem
    return weight_np.reshape(
        tile[0] // r, r, tile[1] // r, r, tile[2] // r, r, 1
    ).transpose(0, 2, 4, 1, 3, 5, 6)


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

    def _coarse_roi(params_coarse, image):
        """Module-level coarse_locate bound to this config (shared with the
        distributed cascade sweep — see coarse_locate's docstring)."""
        return coarse_locate(coarse_apply, params_coarse, image, cfg, canvas, roi)

    def _monolithic_probs(params_fine, params_coarse, image):
        """z-score + (cascade ROI) + blended sliding-window TTA mean
        probabilities: the shared core of the monolithic label and probs
        outputs (argmax is the only difference)."""
        image = zscore(image.astype(jnp.float32))
        weight = jnp.asarray(weight_np)

        if use_cascade:
            region, start = _coarse_roi(params_coarse, image)
        else:
            region, start = image, jnp.zeros((3,), jnp.int32)

        probs_r = sliding_window_probs(
            lambda p: fine_tile_probs(params_fine, p),
            region,
            origins_np,
            tile,
            weight,
            num_classes,
        )
        return probs_r, start

    def predict(params_fine, params_coarse, image):
        probs_r, start = _monolithic_probs(params_fine, params_coarse, image)
        labels_r = jnp.argmax(probs_r, axis=-1).astype(jnp.uint8)
        if cfg.postproc == "device":
            labels_r = _postprocess_device(
                labels_r, cfg.min_component_voxels, cfg.et_min_voxels
            )

        # return only the ROI labels + placement: the fetch back to the host
        # is 3-4x smaller than a full canvas and the host paste is a memcpy
        # (the probability canvas was dead weight — never fetched)
        return labels_r, start

    def predict_probs_monolithic(params_fine, params_coarse, image):
        """Opt-in probability output (ensembling / uncertainty workflows):
        same mean-probability canvas the labels are argmaxed from, f32."""
        probs_r, start = _monolithic_probs(params_fine, params_coarse, image)
        return probs_r.astype(jnp.float32), start

    store_dt = (
        jnp.bfloat16 if cfg.tta_precision == "bfloat16" else jnp.float32
    )

    # multi-tile generalization of the split fast path (VERDICT round-2
    # #4): when TTA is on but the sweep has several tiles (whole-canvas
    # config-4 sweeps, or an ROI larger than one tile), stage the sweep as
    # stack-all-tiles | scan of merged fine+low-res-reduce-to-probs with
    # in-program blending — the conv program never contains a reverse and
    # the reduce runs on the 32-channel-minor pre-d2s output, exactly as
    # in the single-tile path.
    staged_sweep = (
        allow_split
        and cfg.tta_flips
        and not split_tta
        and fine_lowres_apply is not None
        and stem > 1
        and len(origins_np) > 1
        and all(t % stem == 0 for t in tile)
        and all(s % stem == 0 for s in sweep_shape)
        and bool((np.asarray(origins_np) % stem == 0).all())
    )

    if not split_tta and not staged_sweep:
        fn = jax.jit(predict)
        fn.probs_fn = jax.jit(predict_probs_monolithic)
        return fn

    use_lowres = fine_lowres_apply is not None and stem > 1

    def _lowres_mean_probs(logits_lr):
        """Groupwise softmax over the K sub-axis + low-res unflips (flip +
        r-block bit swap) + f32 mean on the PRE-d2s head output — the same
        values, same cast points, and same reduction order as the full-res
        softmax/unflip/mean, but on (K*r^3)-channel-minor tensors at 1/r^3
        spatial (~8x better VPU packing; PERF.md round 3). Returns
        (d, h, w, r, r, r, K) f32 mean probabilities."""
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
        return acc * (1.0 / len(FLIPS))

    def _labels_from_blocks(blk):
        """(d, h, w, r, r, r) block labels -> (d*r, h*r, w*r): the d2s
        rearrange applied to labels instead of logits."""
        r = stem
        d, h, w = blk.shape[:3]
        return blk.transpose(0, 3, 1, 4, 2, 5).reshape(d * r, h * r, w * r)

    def _probs_from_blocks(blk):
        """(d, h, w, r, r, r, K) block probs -> (d*r, h*r, w*r, K): the same
        d2s rearrange with the class axis riding along — argmax commutes
        with it, so argmax(_probs_from_blocks(p)) == _labels_from_blocks(
        argmax(p)) exactly."""
        r = stem
        d, h, w = blk.shape[:3]
        return blk.transpose(0, 3, 1, 4, 2, 5, 6).reshape(
            d * r, h * r, w * r, blk.shape[-1]
        )

    def _finish_one(labels_r):
        if cfg.postproc == "device":
            return _postprocess_device(
                labels_r, cfg.min_component_voxels, cfg.et_min_voxels
            )
        return labels_r

    if staged_sweep:
        r = stem
        tile_lr = tuple(t // r for t in tile)
        sweep_lr = tuple(s // r for s in sweep_shape)
        # blend weight in low-res block form: (tx/r, ty/r, tz/r, r, r, r, 1)
        w_lr_np = lowres_blend_weight(weight_np, tile, r)

        def stage_sweep_stack(params_coarse, image):
            """z-score (+ coarse localization/ROI slice when cascading) +
            per-tile flip stacks: (T, 8, tx, ty, tz, C)."""
            image = zscore(image.astype(jnp.float32))
            if use_cascade:
                region, start = _coarse_roi(params_coarse, image)
            else:
                region, start = image, jnp.zeros((3,), jnp.int32)
            stacks = jnp.stack([
                tta_stack(
                    region[
                        o0:o0 + tile[0], o1:o1 + tile[1], o2:o2 + tile[2]
                    ],
                    cfg.tta_precision,
                )
                for o0, o1, o2 in origins_np
            ])
            return stacks, start

        def _sweep_probs_lr(params_fine, stacks):
            """scan over tiles: merged b8 fine forward + low-res TTA mean,
            blended into a low-res block canvas of weight-normalized mean
            probabilities (d, h, w, r, r, r, K). No reverse ever neighbors
            the convs."""
            canvas_lr = jnp.zeros(sweep_lr + (r, r, r, num_classes), jnp.float32)
            wsum_lr = jnp.zeros(sweep_lr + (r, r, r, 1), jnp.float32)
            w_lr = jnp.asarray(w_lr_np)
            origins_lr = jnp.asarray(origins_np, jnp.int32) // r

            def body(carry, xs):
                canvas_lr, wsum_lr = carry
                chunk, o_lr = xs
                probs = _lowres_mean_probs(fine_lowres_apply(params_fine, chunk))
                o = (o_lr[0], o_lr[1], o_lr[2], jnp.int32(0),
                     jnp.int32(0), jnp.int32(0), jnp.int32(0))
                cur = jax.lax.dynamic_slice(
                    canvas_lr, o, tile_lr + (r, r, r, num_classes)
                )
                canvas_lr = jax.lax.dynamic_update_slice(
                    canvas_lr, cur + probs * w_lr, o
                )
                curw = jax.lax.dynamic_slice(
                    wsum_lr, o, tile_lr + (r, r, r, 1)
                )
                wsum_lr = jax.lax.dynamic_update_slice(
                    wsum_lr, curw + w_lr, o
                )
                return (canvas_lr, wsum_lr), None

            (canvas_lr, wsum_lr), _ = jax.lax.scan(
                body, (canvas_lr, wsum_lr),
                (stacks, origins_lr),
            )
            return canvas_lr / jnp.maximum(wsum_lr, 1e-8)

        def stage_sweep_finish(params_fine, stacks, start):
            probs = _sweep_probs_lr(params_fine, stacks)
            blk = jnp.argmax(probs, -1).astype(jnp.uint8)
            labels = _labels_from_blocks(blk)
            return _finish_one(labels), start

        def stage_sweep_probs(params_fine, stacks, start):
            return _probs_from_blocks(_sweep_probs_lr(params_fine, stacks)), start

        j_stack = jax.jit(stage_sweep_stack)
        j_sweep_finish = jax.jit(stage_sweep_finish)
        j_sweep_probs = jax.jit(stage_sweep_probs)

        def predict_sweep(params_fine, params_coarse, image):
            stacks, start = j_stack(params_coarse, image)
            return j_sweep_finish(params_fine, stacks, start)

        def predict_sweep_probs(params_fine, params_coarse, image):
            stacks, start = j_stack(params_coarse, image)
            return j_sweep_probs(params_fine, stacks, start)

        predict_sweep.stages = (j_stack, j_sweep_finish)
        predict_sweep.probs_fn = predict_sweep_probs
        return predict_sweep

    def stage_roi(params_coarse, image):
        """z-score + coarse localization + ROI slice + flip-stack."""
        image = zscore(image.astype(jnp.float32))
        region, start = _coarse_roi(params_coarse, image)
        return tta_stack(region, cfg.tta_precision), start

    def _reduce_fullres(logits):
        """softmax -> bf16 store -> unflip -> f32 mean -> argmax at full
        resolution (stem=1 fallback; the unflips fuse with argmax so this
        merged form matches the old fine+reduce chain's cost)."""
        probs8 = jax.nn.softmax(logits.astype(jnp.float32), -1)
        probs = tta_reduce(probs8.astype(store_dt))
        return jnp.argmax(probs, axis=-1).astype(jnp.uint8)

    def _reduce_lowres(logits_lr):
        """Low-res mean probs -> per-block argmax -> d2s label rearrange
        (bitwise-identical to the full-res reduce; PERF.md round 3)."""
        probs = _lowres_mean_probs(logits_lr)
        blk = jnp.argmax(probs, -1).astype(jnp.uint8)  # (d,h,w,r,r,r)
        return _labels_from_blocks(blk)

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

    def stage_finish_probs(params_fine, tiles, start):
        """Probs sibling of ``stage_finish``: the same mean probabilities
        the labels are argmaxed from, at full resolution, f32."""
        if use_lowres:
            probs = _probs_from_blocks(
                _lowres_mean_probs(fine_lowres_apply(params_fine, tiles))
            )
        else:
            probs8 = jax.nn.softmax(
                fine_apply(params_fine, tiles).astype(jnp.float32), -1
            )
            probs = tta_reduce(probs8.astype(store_dt))
        return probs.astype(jnp.float32), start

    j_roi = jax.jit(stage_roi)
    j_finish = jax.jit(stage_finish)
    j_finish_probs = jax.jit(stage_finish_probs)

    def predict_split(params_fine, params_coarse, image):
        tiles, start = j_roi(params_coarse, image)
        return j_finish(params_fine, tiles, start)

    def predict_split_probs(params_fine, params_coarse, image):
        tiles, start = j_roi(params_coarse, image)
        return j_finish_probs(params_fine, tiles, start)

    predict_split.stages = (j_roi, j_finish)  # for stage profiling
    predict_split.fine_pair = jax.jit(stage_finish_pair)
    predict_split.probs_fn = predict_split_probs
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
