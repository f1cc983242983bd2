"""Round-3 experiment: fold the 8 TTA flips into the CONV WEIGHTS.

For this net (3^3 SAME convs, instance norm, 2x avg-pool, half-pixel
trilinear resize, s2d stem + sub-pixel head) flipping the INPUT is
algebraically equivalent to flipping the conv kernels spatially (plus a
channel permutation at the stem/head for the s2d block structure) and
flipping the OUTPUT:

    flip_f(model(flip_f(x))) == model_{T_f(params)}(x)

so the TTA mean  (1/8) sum_f unflip_f(model(flip_f(x)))  becomes
(1/8) sum_f model_{T_f(params)}(x)  — NO spatial-permutation op anywhere in
the program, which is the root cause of the ~26 ms/volume layout tax
(PERF.md "TTA flip layout").

Phase 1 (CPU, f32): exactness of the transform.
Phase 2 (TPU, flagship shapes): A/B vs the b8 canonical floor.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from brats2019_tpu.infer.tta import FLIPS, flip_volume
from brats2019_tpu.models import UNet3D
from brats2019_tpu.models.unet3d import UNetConfig


def _block_perm(flags, n_per_block: int, r: int) -> np.ndarray:
    """Permutation of an (r^3 * n) channel axis that mirrors the s2d block
    index bits for the flipped spatial axes."""
    idx = np.arange(r ** 3 * n_per_block)
    blk, ci = idx // n_per_block, idx % n_per_block
    a, b, c = blk // (r * r), (blk // r) % r, blk % r
    if flags[0]:
        a = r - 1 - a
    if flags[1]:
        b = r - 1 - b
    if flags[2]:
        c = r - 1 - c
    return ((a * r + b) * r + c) * n_per_block + ci


def flip_params_tree(params, flags, cfg: UNetConfig):
    """T_f(params): spatially flip every conv kernel; permute the first
    conv's input channels and the head's output channels by the s2d block
    mirror when stem_downsample > 1."""
    axes = tuple(ax for ax, f in enumerate(flags) if f)
    r = cfg.stem_downsample
    in_perm = (
        _block_perm(flags, cfg.in_channels, r) if r > 1 else None
    )
    out_perm = (
        _block_perm(flags, cfg.num_classes, r) if r > 1 else None
    )

    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves, treedef = flat
    # locate the first conv kernel: the one whose input-channel dim equals
    # in_channels * r^3 (the s2d output) among 5-D kernels
    out = []
    for path, leaf in leaves:
        keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        name = "/".join(str(k) for k in keys)
        new = leaf
        if name.endswith("kernel") and leaf.ndim == 5:
            if axes:
                new = jnp.flip(new, axis=axes)
            if in_perm is not None and "DoubleConv_0/ConvNormAct_0/" in name:
                new = new[..., in_perm, :]
            if out_perm is not None and name.endswith("head/kernel"):
                new = new[..., :, out_perm]
        elif out_perm is not None and name.endswith("head/bias"):
            new = new[out_perm]
        out.append(new)
    return jax.tree_util.tree_unflatten(treedef, out)


def stack_flipped_params(params, cfg: UNetConfig):
    trees = [flip_params_tree(params, f, cfg) for f in FLIPS]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def check_exactness():
    print("== phase 1: exactness (CPU f32) ==")
    for stem in (1, 2):
        cfg = UNetConfig(
            levels=3, base_features=6, max_features=24,
            compute_dtype="float32", stem_downsample=stem,
        )
        model = UNet3D(cfg)
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(jax.random.PRNGKey(1), (16, 16, 16, 4))
        params = model.init(rng, x[None])
        ref = model.apply(params, x[None])[0]
        worst = 0.0
        for flags in FLIPS:
            want = flip_volume(
                model.apply(params, flip_volume(x, flags)[None])[0], flags
            )
            got = model.apply(flip_params_tree(params, flags, cfg), x[None])[0]
            err = float(jnp.max(jnp.abs(want - got)))
            worst = max(worst, err)
            status = "OK " if err < 1e-4 else "FAIL"
            print(f"  stem={stem} flags={flags}: max|diff|={err:.2e} {status}")
        scale = float(jnp.max(jnp.abs(ref)))
        print(f"  stem={stem}: worst {worst:.2e} (logit scale {scale:.2f})")
    return True


def bench_tpu():
    print("== phase 2: TPU flagship A/B ==")
    from brats2019_tpu.configs import get_preset

    exp = get_preset("inference")
    cfg = exp.unet
    model = UNet3D(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 4))
    )
    tile = (128, 128, 128)
    x = jax.random.normal(jax.random.PRNGKey(1), tile + (4,), jnp.bfloat16)

    params8 = stack_flipped_params(params, cfg)

    def floor_b8(params, x):
        """current fine-stage structure: b8 forward + softmax (+ mean)"""
        tiles = jnp.broadcast_to(x[None], (8,) + x.shape)
        logits = model.apply(params, tiles)
        probs = jax.nn.softmax(logits.astype(jnp.float32), -1)
        return jnp.mean(probs, 0).astype(jnp.bfloat16)

    def weightflip_vmap(params8, x):
        logits = jax.vmap(lambda p: model.apply(p, x[None])[0])(params8)
        probs = jax.nn.softmax(logits.astype(jnp.float32), -1)
        return jnp.mean(probs, 0).astype(jnp.bfloat16)

    def weightflip_loop(params8, x):
        acc = jnp.zeros(x.shape[:-1] + (cfg.num_classes,), jnp.float32)
        for i in range(8):
            p = jax.tree_util.tree_map(lambda a: a[i], params8)
            logits = model.apply(p, x[None])[0]
            acc = acc + jax.nn.softmax(logits.astype(jnp.float32), -1)
        return (acc / 8.0).astype(jnp.bfloat16)

    variants = {
        "floor_b8_broadcast": (jax.jit(floor_b8), params),
        "weightflip_vmap": (jax.jit(weightflip_vmap), params8),
        "weightflip_loop": (jax.jit(weightflip_loop), params8),
    }

    def time_dispatch_slope(fn, p, x, lo=5, hi=15):
        fn(p, x).block_until_ready()  # compile

        def run_k(k):
            t0 = time.time()
            outs = [fn(p, x) for _ in range(k)]
            np.asarray(jax.device_get(outs[-1][0, 0, 0]))
            return time.time() - t0

        run_k(2)
        times = []
        for _ in range(4):
            t_lo, t_hi = run_k(lo), run_k(hi)
            times.append((t_hi - t_lo) / (hi - lo))
        return sorted(times)[len(times) // 2]

    results = {}
    for name, (fn, p) in variants.items():
        ms = time_dispatch_slope(fn, p, x) * 1e3
        results[name] = ms
        print(f"  {name}: {ms:.1f} ms")

    # exactness on TPU: vmap weightflip vs the real unflip-based TTA mean
    from brats2019_tpu.infer.tta import tta_probs

    ref = tta_probs(
        lambda p, b: model.apply(p, b), params, x.astype(jnp.float32),
        precision="float32",
    )
    got = jax.jit(weightflip_vmap)(params8, x)
    diff = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
    lab_agree = float(
        jnp.mean(jnp.argmax(ref, -1) == jnp.argmax(got.astype(jnp.float32), -1))
    )
    print(f"  vmap vs true TTA: max|prob diff|={diff:.2e} label agree={lab_agree:.6f}")
    return results


if __name__ == "__main__":
    if "--tpu" in sys.argv:
        bench_tpu()
    else:
        check_exactness()
