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
