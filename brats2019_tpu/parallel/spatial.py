"""Spatial partitioning of 3D volumes across chips (SURVEY.md §2.2, §5
"long-context": the volumetric analog of sequence/context parallelism).

The reference has no attention and no sequence dimension; its "long context"
is spatial extent, scaled algorithmically (cascade + sliding window). For
multi-chip whole-volume work the TPU-native equivalents are:

* ``halo_exchange`` / ``sharded_conv3d`` — shard the X axis over the mesh,
  exchange 1-voxel halos with ``jax.lax.ppermute`` (neighbor RDMA over ICI)
  before each SAME conv, exactly reproducing the unsharded conv. This is
  the ring/halo primitive a fully spatially-sharded network builds on.
* ``distributed_tile_sweep`` — shard the sliding-window (tile, flip) work
  items across the mesh and ``psum`` the blended probability canvas: the
  natural multi-chip decomposition for this workload (embarrassingly
  parallel forwards, one collective at the end).

Everything here runs inside ``jax.shard_map`` over a 1-D mesh axis and is
tested against the single-device oracle on the 8-virtual-CPU mesh
(SURVEY.md §4.3).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from .mesh import DATA_AXIS, MeshEnv


def halo_exchange(x: jnp.ndarray, halo: int, axis_name: str = DATA_AXIS) -> jnp.ndarray:
    """Pad a locally-sharded leading spatial axis with neighbors' edges.

    x: local shard (Xl, ...). Returns (Xl + 2*halo, ...): ``halo`` slices
    received from the left neighbor, the local shard, ``halo`` from the
    right. Boundary devices receive zeros (SAME/zero-pad conv semantics).
    ppermute lowers to neighbor sends over ICI.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    right_edge = x[-halo:]  # goes to right neighbor's left pad
    left_edge = x[:halo]    # goes to left neighbor's right pad

    fwd = [(i, i + 1) for i in range(n - 1)]   # send right
    bwd = [(i + 1, i) for i in range(n - 1)]   # send left
    from_left = jax.lax.ppermute(right_edge, axis_name, fwd)
    from_right = jax.lax.ppermute(left_edge, axis_name, bwd)
    zeros = jnp.zeros_like(left_edge)
    from_left = jnp.where(idx == 0, zeros, from_left)
    from_right = jnp.where(idx == n - 1, zeros, from_right)
    return jnp.concatenate([from_left, x, from_right], axis=0)


def _conv3d_valid(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """(X,Y,Z,C) conv, VALID on X, SAME on Y/Z."""
    ky = w.shape[1] // 2
    kz = w.shape[2] // 2
    return jax.lax.conv_general_dilated(
        x[None],
        w,
        (1, 1, 1),
        [(0, 0), (ky, ky), (kz, kz)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )[0]


def sharded_conv3d_local(
    x_local: jnp.ndarray, w: jnp.ndarray, axis_name: str = DATA_AXIS
) -> jnp.ndarray:
    """SAME conv3d on an X-sharded volume, inside shard_map.

    x_local: (Xl, Y, Z, Cin); w: (kx, ky, kz, Cin, Cout). Exchanges
    (kx//2)-deep halos, then convolves VALID along X — bitwise equal to the
    unsharded SAME conv on the gathered volume.
    """
    halo = w.shape[0] // 2
    if halo:
        x_local = halo_exchange(x_local, halo, axis_name)
    return _conv3d_valid(x_local, w)


def make_sharded_conv3d(env: MeshEnv) -> Callable:
    """jit(shard_map) wrapper: global (X,Y,Z,Cin) -> (X,Y,Z,Cout) with X
    sharded over the mesh; weights replicated."""

    def fn(x, w):
        return sharded_conv3d_local(x, w, DATA_AXIS)

    sharded = jax.shard_map(
        fn,
        mesh=env.mesh,
        in_specs=(P(DATA_AXIS), P()),
        out_specs=P(DATA_AXIS),
    )
    return jax.jit(sharded)


def _flip_bits(flip_id: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    return (flip_id >> 0) & 1, (flip_id >> 1) & 1, (flip_id >> 2) & 1


def _maybe_flip(x: jnp.ndarray, flip_id: jnp.ndarray) -> jnp.ndarray:
    """Flip spatial axes 0/1/2 of (X, Y, Z, C) per the bits of flip_id
    (traced value — select, not Python branch). Involution: applying twice
    with the same id is the identity, so the same fn un-flips probs."""
    fx, fy, fz = _flip_bits(flip_id)
    x = jax.lax.select(fx > 0, jnp.flip(x, 0), x)
    x = jax.lax.select(fy > 0, jnp.flip(x, 1), x)
    x = jax.lax.select(fz > 0, jnp.flip(x, 2), x)
    return x


def distributed_tile_sweep(
    tile_probs_fn: Callable[..., jnp.ndarray],
    env: MeshEnv,
    vol_shape: Tuple[int, int, int],
    origins: np.ndarray,            # (N, 3) static tile origins
    tile: Tuple[int, int, int],
    weight_np: np.ndarray,          # (tx, ty, tz, 1)
    num_classes: int,
    n_flips: int = 1,
    params=None,
) -> Callable:
    """Multi-chip sliding-window inference: (tile x flip) work items
    sharded over the mesh.

    Returns jitted fn(vol (X,Y,Z,C) replicated) -> normalized probs
    (X,Y,Z,K) replicated. Each device sweeps its slice of the padded
    work-item list into a canvas covering ONLY the static ROI spanned by
    the origins (not the whole volume), one psum merges the weighted ROI
    canvases — O(roi * K * n_dev) ICI bytes instead of O(canvas * K *
    n_dev) (VERDICT round-1 weak #8) — and the normalized ROI is pasted
    back into a zero full canvas.

    ``n_flips`` > 1 adds flip-TTA to the work decomposition: item (o, f)
    flips the patch by f's bits, forwards, un-flips the probs — the
    flips x tiles product striped across devices. Padding items reuse
    origins[0] with zero weight so the static ROI stays tight.

    ``params``: when given, ``tile_probs_fn`` is called as
    ``fn(params, patch)`` and the params pytree rides into the program as
    a replicated runtime ARGUMENT — without this, a closure over a large
    model pytree embeds every weight as a jit constant (duplicated into
    the executable alongside the committed copy and pinned for the cache
    lifetime). Closure mode (params=None, ``fn(patch)``) remains for
    small nets and tests.
    """
    n_dev = env.n_data
    # static ROI spanned by the sweep
    roi_lo = origins.min(axis=0).astype(np.int32)
    roi_hi = (origins.max(axis=0) + np.asarray(tile)).astype(np.int32)
    roi_shape = tuple(int(h - l) for l, h in zip(roi_lo, roi_hi))

    # work items = flips x origins, relative to the ROI
    rel = (origins - roi_lo[None, :]).astype(np.int32)
    origins_sharded, flips_sharded, valid_sharded = _stripe_items(
        rel, n_flips, n_dev
    )

    has_params = params is not None

    def local_sweep(vol, origins_l, flips_l, valid_l, weight, *maybe_p):
        # origins_l: (1, per_dev, 3) local shard; vol replicated
        origins_l, flips_l, valid_l = origins_l[0], flips_l[0], valid_l[0]
        roi_vol = jax.lax.dynamic_slice(
            vol,
            (int(roi_lo[0]), int(roi_lo[1]), int(roi_lo[2]), 0),
            roi_shape + (vol.shape[-1],),
        )
        canvas = jnp.zeros(roi_shape + (num_classes,), jnp.float32)
        wsum = jnp.zeros(roi_shape + (1,), jnp.float32)

        def body(carry, inp):
            canvas, wsum = carry
            origin, flip_id, v = inp
            o = (origin[0], origin[1], origin[2], jnp.int32(0))
            patch = jax.lax.dynamic_slice(
                roi_vol, o, tuple(tile) + (vol.shape[-1],)
            )
            patch = _maybe_flip(patch, flip_id)
            w = weight * v
            p_out = (
                tile_probs_fn(maybe_p[0], patch) if has_params
                else tile_probs_fn(patch)
            )
            probs = _maybe_flip(p_out, flip_id) * w
            cur = jax.lax.dynamic_slice(canvas, o, tuple(tile) + (num_classes,))
            canvas = jax.lax.dynamic_update_slice(canvas, cur + probs, o)
            curw = jax.lax.dynamic_slice(wsum, o, tuple(tile) + (1,))
            wsum = jax.lax.dynamic_update_slice(wsum, curw + w, o)
            return (canvas, wsum), None

        (canvas, wsum), _ = jax.lax.scan(
            body, (canvas, wsum), (origins_l, flips_l, valid_l)
        )
        canvas = jax.lax.psum(canvas, DATA_AXIS)      # ROI-sized collective
        wsum = jax.lax.psum(wsum, DATA_AXIS)
        roi_probs = canvas / jnp.maximum(wsum, 1e-8)
        full = jnp.zeros(vol.shape[:3] + (num_classes,), jnp.float32)
        return jax.lax.dynamic_update_slice(
            full, roi_probs, (int(roi_lo[0]), int(roi_lo[1]), int(roi_lo[2]), 0)
        )

    in_specs = (P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P())
    if has_params:
        in_specs = in_specs + (P(),)  # params replicated
    sharded = jax.shard_map(
        local_sweep,
        mesh=env.mesh,
        in_specs=in_specs,
        out_specs=P(),
        check_vma=False,  # psum makes the output replicated by construction
    )
    o_dev = jnp.asarray(origins_sharded)
    f_dev = jnp.asarray(flips_sharded)
    v_dev = jnp.asarray(valid_sharded)
    w_dev = jnp.asarray(weight_np)

    # params must be ARGUMENTS of the jitted callable — a jit closing over
    # them would trace them right back into constants
    jit_sharded = jax.jit(sharded)

    def run(vol, params_override=None):
        # params_override: serving hot-reload (serve --multichip + SIGHUP)
        # swaps weights with zero recompiles — same treedef/shapes hit the
        # existing jit cache entry
        args = (vol, o_dev, f_dev, v_dev, w_dev)
        if has_params:
            args = args + (params if params_override is None
                           else params_override,)
        return jit_sharded(*args)

    return run


def _stripe_items(
    origins: np.ndarray, n_flips: int, n_dev: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(tile origin x flip) work items striped over n_dev devices, padded
    with zero-weight repeats of origins[0]: returns (origins (n_dev, per,
    3), flips (n_dev, per), valid (n_dev, per)). The striping used by both
    distributed sweeps."""
    items_o = np.concatenate([origins.astype(np.int32)] * n_flips, axis=0)
    items_f = np.repeat(np.arange(n_flips, dtype=np.int32), origins.shape[0])
    n = items_o.shape[0]
    pad = (-n) % n_dev
    items_o = np.concatenate(
        [items_o, np.tile(items_o[:1], (pad, 1))], axis=0
    )
    items_f = np.concatenate([items_f, np.zeros((pad,), np.int32)])
    valid = np.concatenate(
        [np.ones((n,), np.float32), np.zeros((pad,), np.float32)]
    )
    per = items_o.shape[0] // n_dev
    return (
        items_o.reshape(n_dev, per, 3),
        items_f.reshape(n_dev, per),
        valid.reshape(n_dev, per),
    )


def _maybe_flip_blocks(p: jnp.ndarray, flip_id: jnp.ndarray) -> jnp.ndarray:
    """Low-res block-form flip of (d, h, w, r, r, r, K) probabilities per
    the bits of a TRACED flip_id: a full-res flip is a low-res flip plus
    the matching r-block bit swap (models/cascade.py _lowres_mean_probs,
    PERF.md round 3 'Low-res TTA reduce'). Involution, like _maybe_flip."""
    fx, fy, fz = _flip_bits(flip_id)
    p = jax.lax.select(fx > 0, jnp.flip(p, (0, 3)), p)
    p = jax.lax.select(fy > 0, jnp.flip(p, (1, 4)), p)
    p = jax.lax.select(fz > 0, jnp.flip(p, (2, 5)), p)
    return p


def _cascade_member_sweep(
    fine_apply: Callable,
    coarse_apply: Callable,
    cfg,                                   # InferenceConfig
    canvas: Tuple[int, int, int],
    num_classes: int,
    n_dev: int,
    stem: int = 1,
    fine_lowres_apply: Optional[Callable] = None,
):
    """Shared guts of the cascade mesh decompositions: the statics (tile
    grid, flip striping, blend weights, low-res block form) plus a
    ``member_sweep`` that runs INSIDE shard_map — one member's coarse
    localization (replicated) followed by its ROI (tile x flip) sweep with
    the mesh-merging psum. Used by ``distributed_cascade_sweep`` (one
    member -> ROI labels) and ``distributed_cascade_ensemble`` (K members
    -> mean-probability canvas labels); keeping one implementation pins
    their blending/TTA semantics together.

    ``member_sweep(image, origins_l, flips_l, valid_l, weight, pf, pc) ->
    (canvas_p, wsum, start)`` — weighted probability sum + weight sum in
    the accumulator form (low-res blocks when ``use_lowres``), ALREADY
    psum-merged across the mesh.
    """
    from ..infer.tiling import blend_weight, tile_origins
    from ..models.cascade import coarse_locate, lowres_blend_weight

    tile = tuple(cfg.tile)
    roi = tuple(min(r, c) for r, c in zip(cfg.roi_shape, canvas))
    origins_np = tile_origins(roi, tile, cfg.overlap)
    weight_np = blend_weight(tile, cfg.blend, cfg.gaussian_sigma_frac)
    n_flips = 8 if cfg.tta_flips else 1
    store_dt = (
        jnp.bfloat16 if cfg.tta_precision == "bfloat16" else jnp.float32
    )

    use_lowres = (
        cfg.tta_flips
        and fine_lowres_apply is not None
        and stem > 1
        and all(t % stem == 0 for t in tile)
        and all(s % stem == 0 for s in roi)
        and bool((np.asarray(origins_np) % stem == 0).all())
    )

    o_sh, f_sh, v_sh = _stripe_items(np.asarray(origins_np), n_flips, n_dev)
    r = stem
    if use_lowres:
        w_np = lowres_blend_weight(weight_np, tile, r)
        tile_acc = tuple(t // r for t in tile) + (r, r, r)
        roi_acc = tuple(s // r for s in roi) + (r, r, r)
    else:
        w_np = weight_np
        tile_acc = tile
        roi_acc = roi

    def member_sweep(image, origins_l, flips_l, valid_l, weight, pf, pc):
        region, start = coarse_locate(coarse_apply, pc, image, cfg, canvas, roi)

        canvas_p = jnp.zeros(roi_acc + (num_classes,), jnp.float32)
        wsum = jnp.zeros(roi_acc + (1,), jnp.float32)

        def body(carry, inp):
            canvas_p, wsum = carry
            origin, flip_id, v = inp
            o_full = (origin[0], origin[1], origin[2], jnp.int32(0))
            patch = jax.lax.dynamic_slice(
                region, o_full, tile + (region.shape[-1],)
            )
            if cfg.tta_flips:
                # match the single-device tta_stack: store-dtype cast on
                # the INPUT stack (cast and flip commute elementwise)
                patch = patch.astype(store_dt)
            patch = _maybe_flip(patch, flip_id)
            if use_lowres:
                logits_lr = fine_lowres_apply(pf, patch[None])[0]
                d, h, w_, _ = logits_lr.shape
                g = logits_lr.reshape(d, h, w_, r, r, r, num_classes)
                p = jax.nn.softmax(g.astype(jnp.float32), -1).astype(store_dt)
                p = _maybe_flip_blocks(p, flip_id)
                o = (origin[0] // r, origin[1] // r, origin[2] // r,
                     jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0))
            else:
                logits = fine_apply(pf, patch[None])[0]
                p = jax.nn.softmax(logits.astype(jnp.float32), -1)
                if cfg.tta_flips:
                    p = p.astype(store_dt)
                p = _maybe_flip(p, flip_id)
                o = (origin[0], origin[1], origin[2], jnp.int32(0))
            wv = weight * v
            cur = jax.lax.dynamic_slice(
                canvas_p, o, tile_acc + (num_classes,)
            )
            canvas_p = jax.lax.dynamic_update_slice(
                canvas_p, cur + p.astype(jnp.float32) * wv, o
            )
            curw = jax.lax.dynamic_slice(wsum, o, tile_acc + (1,))
            wsum = jax.lax.dynamic_update_slice(wsum, curw + wv, o)
            return (canvas_p, wsum), None

        (canvas_p, wsum), _ = jax.lax.scan(
            body, (canvas_p, wsum), (origins_l, flips_l, valid_l)
        )
        canvas_p = jax.lax.psum(canvas_p, DATA_AXIS)  # ROI-sized collective
        wsum = jax.lax.psum(wsum, DATA_AXIS)
        return canvas_p, wsum, start

    statics = {
        "o_sh": o_sh, "f_sh": f_sh, "v_sh": v_sh, "w_np": w_np,
        "use_lowres": use_lowres, "roi": roi, "r": r,
    }
    return member_sweep, statics


def distributed_cascade_sweep(
    fine_apply: Callable,
    coarse_apply: Callable,
    env: MeshEnv,
    cfg,                                   # InferenceConfig
    canvas: Tuple[int, int, int],
    num_classes: int,
    params_fine,
    params_coarse,
    stem: int = 1,
    fine_lowres_apply: Optional[Callable] = None,
) -> Callable:
    """Cascade-aware multi-chip inference: the FLAGSHIP predict program's
    decomposition over a device mesh (VERDICT round-3 #3).

    The single-stage ``distributed_tile_sweep`` bypasses the coarse->fine
    cascade; this one reproduces the flagship path's masks:

    * the coarse localization stage is REPLICATED — every device runs the
      (cheap, ~4% of flagship FLOPs) coarse forward + bbox reduction on its
      replicated canvas copy, so the ROI handoff needs no collective at all;
    * the fine ROI's (tile x flip) work items are striped across the mesh
      (same striping as ``distributed_tile_sweep``), each device blends its
      items into an ROI-sized low-res block canvas, and ONE psum of the
      weighted canvases merges the mesh — O(roi/stem^3 * stem^3 * K) =
      O(roi * K) ICI bytes per device;
    * the TTA reduce runs in the low-res block form on the pre-depth-to-
      space head output (models/cascade.py ``_lowres_mean_probs`` algebra:
      groupwise softmax -> store-dtype cast -> block unflip -> f32 weighted
      accumulation), the same value-for-value computation as the
      single-device split/staged paths.

    Localization semantics are shared BY CODE with the single-device
    programs (models.cascade.coarse_locate). Mask parity vs the
    single-device cascade Predictor is pinned on the 8-virtual-device CPU
    mesh (tests/test_multichip_cli.py::test_multichip_cascade_*).

    Returns fn(image (X, Y, Z, C) RAW canvas, replicated) ->
    (labels_roi uint8 (roi), start int32 (3,)) — the same contract as the
    single-device predict program: z-score happens in-graph; the host
    pastes the ROI and un-crops.
    """
    from ..data.preprocess import zscore

    member_sweep, st = _cascade_member_sweep(
        fine_apply, coarse_apply, cfg, canvas, num_classes, env.n_data,
        stem=stem, fine_lowres_apply=fine_lowres_apply,
    )
    use_lowres, r = st["use_lowres"], st["r"]

    def local(vol_raw, origins_l, flips_l, valid_l, weight, pf, pc):
        origins_l, flips_l, valid_l = origins_l[0], flips_l[0], valid_l[0]
        image = zscore(vol_raw.astype(jnp.float32))
        canvas_p, wsum, start = member_sweep(
            image, origins_l, flips_l, valid_l, weight, pf, pc
        )
        probs = canvas_p / jnp.maximum(wsum, 1e-8)
        if use_lowres:
            blk = jnp.argmax(probs, -1).astype(jnp.uint8)  # (d,h,w,r,r,r)
            d, h, w_ = blk.shape[:3]
            labels = blk.transpose(0, 3, 1, 4, 2, 5).reshape(
                d * r, h * r, w_ * r
            )
        else:
            labels = jnp.argmax(probs, -1).astype(jnp.uint8)
        return labels, start

    sharded = jax.shard_map(
        local,
        mesh=env.mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,  # psum / replicated-compute outputs by construction
    )
    o_dev = jnp.asarray(st["o_sh"])
    f_dev = jnp.asarray(st["f_sh"])
    v_dev = jnp.asarray(st["v_sh"])
    w_dev = jnp.asarray(st["w_np"])
    jit_sharded = jax.jit(sharded)

    def run(vol, pf=None, pc=None):
        # pf/pc override the factory params for serving hot-reload (serve
        # --multichip cascade + SIGHUP): same treedef/shapes reuse the
        # compiled executable, zero recompiles
        return jit_sharded(
            vol, o_dev, f_dev, v_dev, w_dev,
            params_fine if pf is None else pf,
            params_coarse if pc is None else pc,
        )

    return run


def distributed_cascade_ensemble(
    fine_apply: Callable,
    coarse_apply: Callable,
    env: MeshEnv,
    cfg,                                   # InferenceConfig
    canvas: Tuple[int, int, int],
    num_classes: int,
    members_fine,
    members_coarse,
    stem: int = 1,
    fine_lowres_apply: Optional[Callable] = None,
) -> Callable:
    """Ensemble x mesh composition (VERDICT round-4 #3): K checkpoint
    members, each running the SAME cascade decomposition as
    ``distributed_cascade_sweep`` (its per-member sweep is shared BY CODE
    via ``_cascade_member_sweep``), composed in ONE mesh program.

    Per member: its OWN coarse localization (members may localize
    different ROIs — the single-device ``EnsemblePredictor`` semantics),
    its fine ROI's (tile x flip) items striped across the mesh, one
    ROI-sized psum. The member's normalized ROI probabilities are then
    accumulated (replicated compute) into a canvas-sized f32 sum at that
    member's start, and the final ``argmax`` over the raw sum produces the
    labels — count-invariant exactly as ``EnsemblePredictor._argmax``
    (the coverage count is a per-voxel scalar across classes; unwritten
    voxels are all-zero -> argmax 0 = background). Member order is fixed,
    so the f32 sum is deterministic.

    Cost: K sequential member sweeps, each mesh-parallel — the work per
    member is striped over the mesh, so the composition runs ~n_dev x
    faster than the single-device ensemble's sequential member loop while
    producing its masks.

    Returns fn(image (X, Y, Z, C) RAW canvas, replicated; optional member
    list overrides for hot-reload) -> labels uint8 (canvas) — FULL-canvas
    labels (no start paste needed): the host un-crops and postprocesses.
    """
    from ..data.preprocess import zscore

    if not members_fine or len(members_fine) != len(members_coarse):
        raise ValueError(
            "distributed_cascade_ensemble needs matching non-empty "
            "members_fine/members_coarse lists"
        )
    member_sweep, st = _cascade_member_sweep(
        fine_apply, coarse_apply, cfg, canvas, num_classes, env.n_data,
        stem=stem, fine_lowres_apply=fine_lowres_apply,
    )
    use_lowres, r, roi = st["use_lowres"], st["r"], st["roi"]

    def local(vol_raw, origins_l, flips_l, valid_l, weight, mfs, mcs):
        origins_l, flips_l, valid_l = origins_l[0], flips_l[0], valid_l[0]
        image = zscore(vol_raw.astype(jnp.float32))
        acc = jnp.zeros(canvas + (num_classes,), jnp.float32)
        for pf, pc in zip(mfs, mcs):
            canvas_p, wsum, start = member_sweep(
                image, origins_l, flips_l, valid_l, weight, pf, pc
            )
            probs = canvas_p / jnp.maximum(wsum, 1e-8)
            if use_lowres:
                # block form -> full-res ROI probabilities (a voxel
                # permutation; the values argmaxed are unchanged)
                d, h, w_ = probs.shape[:3]
                probs = probs.transpose(0, 3, 1, 4, 2, 5, 6).reshape(
                    d * r, h * r, w_ * r, num_classes
                )
            o = (start[0], start[1], start[2], jnp.int32(0))
            cur = jax.lax.dynamic_slice(acc, o, roi + (num_classes,))
            acc = jax.lax.dynamic_update_slice(acc, cur + probs, o)
        return jnp.argmax(acc, -1).astype(jnp.uint8)

    sharded = jax.shard_map(
        local,
        mesh=env.mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(), P(), P()),
        out_specs=P(),
        check_vma=False,  # psum / replicated-compute outputs by construction
    )
    o_dev = jnp.asarray(st["o_sh"])
    f_dev = jnp.asarray(st["f_sh"])
    v_dev = jnp.asarray(st["v_sh"])
    w_dev = jnp.asarray(st["w_np"])
    jit_sharded = jax.jit(sharded)

    def run(vol, mfs=None, mcs=None):
        # member lists override the factory members for serving hot-reload
        # (same treedefs/shapes + same member COUNT reuse the executable;
        # a changed count retraces once — it is a different program)
        return jit_sharded(
            vol, o_dev, f_dev, v_dev, w_dev,
            list(members_fine) if mfs is None else list(mfs),
            list(members_coarse) if mcs is None else list(mcs),
        )

    return run
