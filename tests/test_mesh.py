"""Mesh / distributed bring-up behavior (SURVEY.md §2.2, §5 sanitizers)."""

import jax
import pytest

from brats2019_tpu.parallel import mesh as mesh_mod


def test_initialize_distributed_noop_single_process():
    # no coordinator declared -> silent no-op, never raises
    mesh_mod.initialize_distributed()


def test_initialize_distributed_fails_fast_when_declared(monkeypatch):
    """A declared multi-process launch whose init fails must raise, not
    silently degrade to a duplicated single-process run (VERDICT weak #7)."""
    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")

    def boom():
        raise RuntimeError("coordinator unreachable")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    # guard: only meaningful when we're actually single-process here
    assert jax.process_count() == 1
    with pytest.raises(RuntimeError, match="coordinator unreachable"):
        mesh_mod.initialize_distributed()


def test_make_mesh_covers_all_devices():
    env = mesh_mod.make_mesh()
    assert env.n_data == len(jax.devices())
