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

from typing import Callable, Tuple

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


def distributed_tile_sweep(
    tile_probs_fn: Callable[[jnp.ndarray], jnp.ndarray],
    env: MeshEnv,
    vol_shape: Tuple[int, int, int],
    origins: np.ndarray,            # (N, 3) static tile origins
    tile: Tuple[int, int, int],
    weight_np: np.ndarray,          # (tx, ty, tz, 1)
    num_classes: int,
) -> Callable:
    """Multi-chip sliding-window inference: tiles sharded over the mesh.

    Returns jitted fn(vol (X,Y,Z,C) replicated) -> normalized probs
    (X,Y,Z,K) replicated. Each device sweeps its slice of the (padded)
    origin list into a local canvas; one psum merges the weighted canvases.
    Work items are padded to a multiple of the mesh size with origin (0,0,0)
    and zero weight so shapes stay static.
    """
    n_dev = env.n_data
    n = origins.shape[0]
    pad = (-n) % n_dev
    padded = np.concatenate(
        [origins, np.zeros((pad, 3), origins.dtype)], axis=0
    )
    valid = np.concatenate(
        [np.ones((n,), np.float32), np.zeros((pad,), np.float32)]
    )
    per_dev = padded.shape[0] // n_dev
    origins_sharded = padded.reshape(n_dev, per_dev, 3)
    valid_sharded = valid.reshape(n_dev, per_dev)

    def local_sweep(vol, origins_l, valid_l, weight):
        # origins_l: (1, per_dev, 3) local shard; vol replicated
        origins_l = origins_l[0]
        valid_l = valid_l[0]
        X, Y, Z = vol.shape[:3]
        canvas = jnp.zeros((X, Y, Z, num_classes), jnp.float32)
        wsum = jnp.zeros((X, Y, Z, 1), jnp.float32)

        def body(carry, inp):
            canvas, wsum = carry
            origin, v = inp
            o = (origin[0], origin[1], origin[2], jnp.int32(0))
            patch = jax.lax.dynamic_slice(
                vol, o, tuple(tile) + (vol.shape[-1],)
            )
            w = weight * v
            probs = tile_probs_fn(patch) * w
            cur = jax.lax.dynamic_slice(canvas, o, tuple(tile) + (num_classes,))
            canvas = jax.lax.dynamic_update_slice(canvas, cur + probs, o)
            curw = jax.lax.dynamic_slice(wsum, o, tuple(tile) + (1,))
            wsum = jax.lax.dynamic_update_slice(wsum, curw + w, o)
            return (canvas, wsum), None

        (canvas, wsum), _ = jax.lax.scan(body, (canvas, wsum), (origins_l, valid_l))
        canvas = jax.lax.psum(canvas, DATA_AXIS)
        wsum = jax.lax.psum(wsum, DATA_AXIS)
        return canvas / jnp.maximum(wsum, 1e-8)

    sharded = jax.shard_map(
        local_sweep,
        mesh=env.mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=P(),
        check_vma=False,  # psum makes the output replicated by construction
    )
    o_dev = jnp.asarray(origins_sharded)
    v_dev = jnp.asarray(valid_sharded)
    w_dev = jnp.asarray(weight_np)

    @jax.jit
    def run(vol):
        return sharded(vol, o_dev, v_dev, w_dev)

    return run
