"""Round-3: where do the ~30 ms between the 82 ms fine stage and the 112 ms
split predict program go, and does a MONOLITHIC program with matmul-based
flips (anti-diagonal reversal matrices — no lax.rev/gather anywhere, so no
layout poisoning and bitwise-identical results) reach the floor?

Stages timed individually (deep async dispatch slope) + chained total, then
the monolithic matmul variant, then output equality.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import time

import jax
import jax.numpy as jnp
import numpy as np

from brats2019_tpu.configs import get_preset
from brats2019_tpu.data.preprocess import centered_crop_start, mask_bbox_center, zscore
from brats2019_tpu.infer.tta import FLIPS
from brats2019_tpu.models import UNet3D
from brats2019_tpu.models.cascade import make_predict_fn
from brats2019_tpu.ops.resize import resize_trilinear


def timed(fn, *args, reps=4, lo=5, hi=15):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)

    def run_k(k):
        t0 = time.time()
        for _ in range(k):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[0]))
        return time.time() - t0

    run_k(2)
    ts = sorted((run_k(hi) - run_k(lo)) / (hi - lo) for _ in range(reps))
    return ts[len(ts) // 2]


def mm_flip(x, flags, revs):
    """Flip spatial axes of (D,H,W,C) via reversal-matrix contractions —
    bitwise-equal to jnp.flip (each output element is a single product
    1.0 * x[src]), but the producer is a dot, not lax.rev."""
    if flags[0]:
        x = jnp.einsum("ab,bhwc->ahwc", revs[0], x)
    if flags[1]:
        x = jnp.einsum("ab,dbwc->dawc", revs[1], x)
    if flags[2]:
        x = jnp.einsum("ab,dhbc->dhac", revs[2], x)
    return x


def main():
    exp = get_preset("inference")
    cfg = exp.infer
    canvas = tuple(cfg.canvas)
    fine_model = UNet3D(exp.unet)
    coarse_model = UNet3D(exp.coarse_unet)
    fine_apply = lambda p, x: fine_model.apply(p, x)
    coarse_apply = lambda p, x: coarse_model.apply(p, x)
    params_f = fine_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 4)))
    params_c = coarse_model.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 16, 4)))

    predict_split = make_predict_fn(
        fine_apply, cfg, canvas, coarse_apply=coarse_apply
    )
    from _legacy_stages import legacy_stages  # pre-12c9fc8 3-stage shim
    j_roi, j_fine, j_reduce = legacy_stages(predict_split, fine_apply)

    image = jax.random.normal(jax.random.PRNGKey(2), canvas + (4,), jnp.float32)
    image = jnp.abs(image)  # zscore mask needs nonzero

    # individual stages
    t_roi = timed(j_roi, params_c, image)
    tiles, start = j_roi(params_c, image)
    t_fine = timed(j_fine, params_f, tiles)
    probs8 = j_fine(params_f, tiles)
    t_red = timed(j_reduce, probs8, start)
    print(f"stage_roi:    {t_roi*1e3:6.1f} ms")
    print(f"stage_fine:   {t_fine*1e3:6.1f} ms")
    print(f"stage_reduce: {t_red*1e3:6.1f} ms")

    def chained(pf, pc, img):
        return predict_split(pf, pc, img)

    t_chain = timed(chained, params_f, params_c, image)
    print(f"chained split predict: {t_chain*1e3:6.1f} ms")

    # --- monolithic matmul-flip variant
    tile = tuple(cfg.tile)
    roi = tuple(min(r, c) for r, c in zip(cfg.roi_shape, canvas))
    revs = [
        jnp.asarray(np.eye(n, dtype=np.float32)[::-1].copy(), jnp.bfloat16)
        for n in roi
    ]
    revs_f32 = [r.astype(jnp.float32) for r in revs]
    store_dt = jnp.bfloat16 if cfg.tta_precision == "bfloat16" else jnp.float32

    def predict_mono(params_fine, params_coarse, image):
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
        region = region.astype(store_dt)
        tiles = jnp.stack([mm_flip(region, f, revs) for f in FLIPS])
        logits = fine_apply(params_fine, tiles)
        probs8 = jax.nn.softmax(logits.astype(jnp.float32), -1)
        acc = jnp.zeros(probs8.shape[1:], jnp.float32)
        for i, f in enumerate(FLIPS):
            acc = acc + mm_flip(probs8[i].astype(store_dt).astype(jnp.float32), f, revs_f32)
        probs = acc * (1.0 / len(FLIPS))
        labels_r = jnp.argmax(probs, axis=-1).astype(jnp.uint8)
        return labels_r, start

    j_mono = jax.jit(predict_mono)
    t_mono = timed(j_mono, params_f, params_c, image)
    print(f"monolithic matmul-flip predict: {t_mono*1e3:6.1f} ms")

    # equality vs shipped split path
    lab_a, start_a = predict_split(params_f, params_c, image)
    lab_b, start_b = j_mono(params_f, params_c, image)
    same = bool(jnp.all(lab_a == lab_b)) and bool(jnp.all(start_a == start_b))
    agree = float(jnp.mean(lab_a == lab_b))
    print(f"labels identical: {same} (agreement {agree:.6f})")


if __name__ == "__main__":
    main()
