"""Checkpoint/resume correctness (SURVEY.md C12, §5 failure recovery)."""

import jax
import jax.numpy as jnp
import numpy as np

from brats2019_tpu.train.checkpoint import (
    CheckpointManager,
    export_params,
    import_params,
)


def _tree(seed):
    k = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(k)
    return {
        "conv": {"kernel": jax.random.normal(k1, (3, 3, 2, 4))},
        "head": {"kernel": jax.random.normal(k2, (1, 2)), "bias": jnp.zeros((2,))},
    }


def test_save_restore_bitwise(tmp_path):
    params = _tree(0)
    opt = {"mu": _tree(1), "nu": _tree(2)}
    mgr = CheckpointManager(str(tmp_path))
    cursor = {"epoch": 3, "index": 7, "seed": 11}
    mgr.save(5, params, opt, cursor)
    mgr.wait()
    like_p = jax.tree_util.tree_map(jnp.zeros_like, params)
    like_o = jax.tree_util.tree_map(jnp.zeros_like, opt)
    restored = mgr.restore(like_p, like_o)
    assert restored is not None
    rp, ro, step, rc = restored
    assert step == 5 and rc == cursor
    for a, b in zip(jax.tree_util.tree_leaves(rp), jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(ro), jax.tree_util.tree_leaves(opt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_best_selection(tmp_path):
    params = _tree(0)
    opt = {"o": jnp.zeros((2,))}
    mgr = CheckpointManager(str(tmp_path))
    like = jax.tree_util.tree_map(jnp.zeros_like, params)
    mgr.save(1, params, opt, {"epoch": 0, "index": 0, "seed": 0}, metric=0.5)
    mgr.wait()
    better = jax.tree_util.tree_map(lambda x: x + 1.0, params)
    mgr.save(2, better, opt, {"epoch": 0, "index": 1, "seed": 0}, metric=0.8)
    mgr.wait()
    worse = jax.tree_util.tree_map(lambda x: x - 5.0, params)
    mgr.save(3, worse, opt, {"epoch": 0, "index": 2, "seed": 0}, metric=0.2)
    mgr.wait()
    best = mgr.restore_best_params(like)
    for a, b in zip(jax.tree_util.tree_leaves(best), jax.tree_util.tree_leaves(better)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_all_steps_and_restore_params_at(tmp_path):
    """Step enumeration + params-only restore (checkpoint averaging's
    member loader)."""
    opt = {"o": jnp.zeros((2,))}
    mgr = CheckpointManager(str(tmp_path))
    trees = {s: _tree(s) for s in (1, 2, 3)}
    for s in (1, 2, 3):
        mgr.save(s, trees[s], opt, {"epoch": 0, "index": s, "seed": 0})
    mgr.wait()
    assert mgr.all_steps() == [1, 2, 3]
    like_p = jax.tree_util.tree_map(jnp.zeros_like, trees[1])
    like_o = jax.tree_util.tree_map(jnp.zeros_like, opt)
    p2 = mgr.restore_params_at(2, like_p, like_o)
    for a, b in zip(
        jax.tree_util.tree_leaves(p2), jax.tree_util.tree_leaves(trees[2])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_average_stage_params(tmp_path):
    """average_stage_params = exact f32 mean of the last-K retained step
    checkpoints' params, in the stored dtype."""
    import dataclasses
    import os

    from brats2019_tpu.cli.common import (
        average_stage_params,
        params_like_for,
    )
    from brats2019_tpu.configs import get_preset
    from brats2019_tpu.train.step import make_optimizer

    exp = dataclasses.replace(get_preset("unit"), workdir=str(tmp_path))
    like = params_like_for(exp.unet)
    like = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), like
    )
    tx = make_optimizer(exp.train)
    opt = tx.init(like)
    mgr = CheckpointManager(os.path.join(str(tmp_path), "fine"))
    member = {}
    for s in (1, 2, 3):
        member[s] = jax.tree_util.tree_map(
            lambda x, s=s: x + float(s), like
        )
        mgr.save(s, member[s], opt, {"epoch": 0, "index": s, "seed": 0})
    mgr.wait()
    mgr.close()

    avg = average_stage_params(exp, "fine", 2)  # steps 2 and 3
    want = jax.tree_util.tree_map(
        lambda a, b: (np.asarray(a, np.float32) + np.asarray(b, np.float32))
        / 2.0,
        member[2], member[3],
    )
    for a, b, l in zip(
        jax.tree_util.tree_leaves(avg),
        jax.tree_util.tree_leaves(want),
        jax.tree_util.tree_leaves(like),
    ):
        assert np.asarray(a).dtype == np.asarray(l).dtype
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    # asking for more members than retained averages what exists
    avg_all = average_stage_params(exp, "fine", 99)
    want_all = jax.tree_util.tree_map(
        lambda a, b, c: (
            np.asarray(a, np.float32) + np.asarray(b, np.float32)
            + np.asarray(c, np.float32)
        ) / 3.0,
        member[1], member[2], member[3],
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(avg_all),
        jax.tree_util.tree_leaves(want_all),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_export_import_roundtrip(tmp_path):
    params = _tree(4)
    path = str(tmp_path / "params.npz")
    export_params(path, params)
    like = jax.tree_util.tree_map(jnp.zeros_like, params)
    back = import_params(path, like)
    for a, b in zip(jax.tree_util.tree_leaves(back), jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cursor_determinism():
    from brats2019_tpu.data.pipeline import CaseCursor

    c1 = CaseCursor(5, seed=3)
    seq = [c1.next_index() for _ in range(12)]
    # resume from a saved state reproduces the continuation exactly
    c2 = CaseCursor(5, seed=3)
    for _ in range(7):
        c2.next_index()
    state = c2.state()
    c3 = CaseCursor(5)
    c3.load_state(state)
    cont = [c3.next_index() for _ in range(5)]
    assert cont == seq[7:12]
    # each epoch is a permutation of all cases
    assert sorted(seq[:5]) == list(range(5))
    assert sorted(seq[5:10]) == list(range(5))


def test_export_import_safetensors_roundtrip(tmp_path):
    """SURVEY.md §5: safetensors export for inference-only params."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from brats2019_tpu.models import UNet3D, UNetConfig

    model = UNet3D(UNetConfig(levels=2, base_features=4))
    params = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 8, 8, 8, 4)))
    path = str(tmp_path / "params.safetensors")
    export_params(path, params)
    like = jax.tree_util.tree_map(lambda x: jnp.zeros(x.shape, x.dtype), params)
    back = import_params(path, like)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
