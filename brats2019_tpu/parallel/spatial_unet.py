"""Whole-volume single-pass U-Net inference, spatially sharded across chips
(SURVEY.md §7.4 stretch goal — "shard whole volumes spatially across chips
via shard_map with lax.ppermute halo exchange for conv boundary
correctness", the true context-parallel analog for CNNs).

The volume's X axis is sharded over the mesh; inside ``shard_map`` every op
is made shard-local-correct:

  conv3x3x3      1-voxel halo exchange (ppermute) then VALID-X conv
  avg-pool 2x    local (shards stay aligned while local X is even)
  trilinear 2x   1-voxel halo, resize the padded shard, crop the seam
  InstanceNorm   local sum/sumsq -> psum over the mesh -> exact global stats
  s2d / d2s      local (block-aligned for even local X)
  skip concat    local

The forward consumes the SAME parameter pytree as ``models.unet3d.UNet3D``
(flax naming: DoubleConv_i/ConvNormAct_j/Conv_0, head) so trained
checkpoints run spatially sharded with no conversion. Constraint: the
global X extent must divide by stem * 2^(levels-1) * n_shards.

Validated against the unsharded UNet3D forward on the 8-virtual-device CPU
mesh (tests/test_spatial_unet.py).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..models.unet3d import UNetConfig, depth_to_space, space_to_depth
from ..ops.resize import downsample2x_jnp
from .mesh import DATA_AXIS, MeshEnv
from .spatial import halo_exchange, sharded_conv3d_local

# halo-conv primitive: ONE definition (parallel/spatial.py); this module
# only composes it into the U-Net structure
_conv3_halo = sharded_conv3d_local


def _instance_norm_act_sharded(
    x, scale, bias, axis_name, activation="relu", eps=1e-5
):
    """IN+activation with exact global statistics: local reduce + psum.
    The activation comes from UNetConfig (ops/norm._act), NOT a hardcoded
    relu — a non-relu checkpoint must produce the same values sharded as
    unsharded."""
    from ..ops.norm import _act

    xf = x.astype(jnp.float32)
    n_local = xf.shape[0] * xf.shape[1] * xf.shape[2]
    s1 = jax.lax.psum(jnp.sum(xf, axis=(0, 1, 2)), axis_name)
    s2 = jax.lax.psum(jnp.sum(xf * xf, axis=(0, 1, 2)), axis_name)
    n = n_local * jax.lax.psum(1, axis_name)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return _act(y, activation).astype(x.dtype)


def _avg_pool2(x):
    # the deterministic jnp resize (not the backend-switched downsample2x:
    # a Pallas kernel inside shard_map is not a supported composition)
    return downsample2x_jnp(x[None])[0]


def _upsample2_halo(x, axis_name):
    """2x trilinear upsample of an X-sharded shard, seam-exact via 1 halo."""
    xp = halo_exchange(x, 1, axis_name)
    d, h, w, c = xp.shape
    up = jax.image.resize(
        xp, (2 * d, 2 * h, 2 * w, c), method="trilinear"
    ).astype(x.dtype)
    up = up[2:-2]  # drop the halo's contribution rows
    # boundary shards: global resize is edge-clamped, our halo pad is not;
    # recompute the two outermost planes locally for exactness
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    local_up = jax.image.resize(
        x, (2 * x.shape[0], 2 * h, 2 * w, c), method="trilinear"
    ).astype(x.dtype)
    first = jnp.where(idx == 0, local_up[0], up[0])
    last = jnp.where(idx == n - 1, local_up[-1], up[-1])
    return jnp.concatenate([first[None], up[1:-1], last[None]], axis=0)


def _double_conv(x, p, axis_name, activation="relu"):
    for cna in ("ConvNormAct_0", "ConvNormAct_1"):
        sub = p[cna]
        x = _conv3_halo(x, sub["Conv_0"]["kernel"].astype(x.dtype), axis_name)
        x = _instance_norm_act_sharded(
            x, sub["in_scale"], sub["in_bias"], axis_name,
            activation=activation,
        )
    return x


def spatial_unet_forward(
    params, x_local: jnp.ndarray, cfg: UNetConfig, axis_name: str = DATA_AXIS
) -> jnp.ndarray:
    """Shard-local UNet3D forward on an X-sharded (X_l, Y, Z, 4) volume.

    Consumes the exact UNet3D parameter tree; returns local logits
    (X_l, Y, Z, K). Must run inside shard_map over ``axis_name``.
    """
    p = params["params"]
    dt = cfg.dtype
    x = x_local.astype(dt)
    r = cfg.stem_downsample
    if r > 1:
        x = space_to_depth(x[None], r)[0]

    dc = 0
    skips = []
    for lvl in range(cfg.levels):
        x = _double_conv(x, p[f"DoubleConv_{dc}"], axis_name, cfg.activation)
        dc += 1
        if lvl < cfg.levels - 1:
            skips.append(x)
            x = _avg_pool2(x)

    for lvl in reversed(range(cfg.levels - 1)):
        x = _upsample2_halo(x, axis_name)
        x = jnp.concatenate([x, skips[lvl].astype(dt)], axis=-1)
        x = _double_conv(x, p[f"DoubleConv_{dc}"], axis_name, cfg.activation)
        dc += 1

    head = p["head"]
    logits = jax.lax.conv_general_dilated(
        x.astype(jnp.float32)[None],
        head["kernel"].astype(jnp.float32),
        (1, 1, 1),
        "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )[0] + head["bias"]
    if r > 1:
        logits = depth_to_space(logits[None], r)[0]
    return logits


def make_spatial_train_grad(env: MeshEnv, cfg: UNetConfig) -> Callable:
    """Spatially-sharded TRAINING gradients: jit(shard_map) of
    (params, volume sharded on X, labels sharded on X) -> (loss, grads).

    AD flows through the halo exchanges automatically (the transpose of
    ``ppermute`` is the reverse permute), so whole-volume context-parallel
    training needs no extra machinery: local CE loss, local grads, one
    ``pmean`` — gradients match the unsharded model exactly
    (tests/test_spatial_unet.py).
    """

    def local_grad(params, x_local, y_local):
        def loss_fn(p):
            logits = spatial_unet_forward(p, x_local, cfg, DATA_AXIS)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            onehot = jax.nn.one_hot(y_local, logits.shape[-1], dtype=jnp.float32)
            return -jnp.mean(jnp.sum(onehot * logp, axis=-1))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return (
            jax.lax.pmean(loss, DATA_AXIS),
            jax.lax.pmean(grads, DATA_AXIS),
        )

    sharded = jax.shard_map(
        local_grad,
        mesh=env.mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_spatial_unet(env: MeshEnv, cfg: UNetConfig) -> Callable:
    """jit(shard_map) whole-volume forward: global (X, Y, Z, 4) sharded on X
    over the mesh, params replicated -> global logits (X, Y, Z, K)."""

    def fn(params, x):
        return spatial_unet_forward(params, x, cfg, DATA_AXIS)

    sharded = jax.shard_map(
        fn,
        mesh=env.mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_vma=False,  # IN stats are psum-replicated by construction
    )
    return jax.jit(sharded)
