"""Round-3 (VERDICT #7): is the production train step paying the same
(...,4)-minor VPU tax in the LOSS that the TTA reduce paid? The Dice+CE
loss makes several f32 passes over (N,128^3,4) softmax/one-hot tensors.
Reformulate at low res on the pre-d2s head output (logits reshaped to
(N,64^3,2,2,2,K), labels block-reshaped) — identical math, 32-channel
minor — and A/B the full train step.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
import optax

from brats2019_tpu.configs import get_preset
from brats2019_tpu.models import UNet3D
from brats2019_tpu.train.loss import segmentation_loss


def timed(fn, *args, reps=4, lo=3, hi=9):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)

    def run_k(k):
        o = None
        t0 = time.time()
        for _ in range(k):
            o = fn(*args)
        leaf = jax.tree_util.tree_leaves(o)[0]
        np.asarray(jax.device_get(leaf.ravel()[0]))
        return time.time() - t0

    run_k(2)
    ts = sorted((run_k(hi) - run_k(lo)) / (hi - lo) for _ in range(reps))
    return ts[len(ts) // 2]


def blockify_labels(labels, r):
    n, D, H, W = labels.shape
    x = labels.reshape(n, D // r, r, H // r, r, W // r, r)
    return x.transpose(0, 1, 3, 5, 2, 4, 6)


def main():
    exp = get_preset("single_chip")
    cfg = exp.unet
    r = cfg.stem_downsample
    model = UNet3D(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 4)))
    tx = optax.adamw(3e-4, weight_decay=1e-5)
    opt_state = tx.init(params)
    b = 1
    x = jax.random.normal(jax.random.PRNGKey(1), (b, 128, 128, 128, 4),
                          jnp.bfloat16)
    y = jax.random.randint(jax.random.PRNGKey(2), (b, 128, 128, 128), 0, 4)

    def step_full(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply(p, x)
            loss, aux = segmentation_loss(logits, y)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    def step_lowres(params, opt_state, x, y):
        yb = blockify_labels(y, r)

        def loss_fn(p):
            logits_lr = model.apply(p, x, subpixel=False)
            n, d, h, w, _ = logits_lr.shape
            lb = logits_lr.reshape(n, d, h, w, r, r, r, 4)
            loss, aux = segmentation_loss(lb, yb)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    j_full = jax.jit(jax.named_call(step_full, name="full") if False else step_full)
    j_low = jax.jit(step_lowres)
    j_full = jax.jit(step_full)

    # loss values must agree (same math, different reduction order)
    lf = j_full(params, opt_state, x, y)[2]
    ll = j_low(params, opt_state, x, y)[2]
    print(f"loss full={float(lf):.6f} lowres={float(ll):.6f} "
          f"diff={abs(float(lf)-float(ll)):.2e}")

    t_full = timed(j_full, params, opt_state, x, y)
    t_low = timed(j_low, params, opt_state, x, y)
    print(f"train step, full-res loss:   {t_full*1e3:7.1f} ms = {b/t_full:.1f} patches/s")
    print(f"train step, low-res loss:    {t_low*1e3:7.1f} ms = {b/t_low:.1f} patches/s")

    # forward-only reference
    @jax.jit
    def fwd(params, x):
        return model.apply(params, x)

    @jax.jit
    def fwd_lr(params, x):
        return model.apply(params, x, subpixel=False)

    print(f"fwd full-res: {timed(fwd, params, x)*1e3:6.1f} ms | "
          f"fwd pre-d2s: {timed(fwd_lr, params, x)*1e3:6.1f} ms")


if __name__ == "__main__":
    main()
