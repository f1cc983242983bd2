"""Device CC vs scipy oracle (SURVEY.md §7.3.3)."""

import numpy as np
import pytest
from scipy import ndimage

from brats2019_tpu.infer.postprocess import (
    filter_small_components_np,
    postprocess_labels,
)
from brats2019_tpu.ops.connected_components import (
    filter_small_components_device,
    label_components,
)


def _random_blobs(seed, shape=(24, 24, 24), p=0.12):
    rng = np.random.default_rng(seed)
    return rng.random(shape) < p


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_labels_match_scipy_partition(seed):
    import jax.numpy as jnp

    fg = _random_blobs(seed)
    ours = np.asarray(label_components(jnp.asarray(fg)))
    ref, n = ndimage.label(fg, structure=np.ones((3, 3, 3), bool))
    assert (ours > 0).sum() == fg.sum()
    assert (ours[~fg] == 0).all()
    # same partition: our ids constant within each scipy component, and
    # distinct across touching... (non-touching) components
    ids = {}
    for comp_id in range(1, n + 1):
        vals = np.unique(ours[ref == comp_id])
        assert len(vals) == 1, f"component {comp_id} split"
        ids[comp_id] = vals[0]
    assert len(set(ids.values())) == n, "components merged"


def test_device_filter_matches_scipy_filter():
    labels = np.zeros((20, 20, 20), dtype=np.uint8)
    labels[2:10, 2:10, 2:10] = 2      # 512 voxels
    labels[15, 15, 15] = 1            # speck
    labels[0, 0, 0:3] = 3             # 3 voxels
    ref = filter_small_components_np(labels, min_voxels=8)
    got = filter_small_components_device(labels, min_voxels=8)
    np.testing.assert_array_equal(got, ref)


def test_postprocess_device_backend():
    labels = np.zeros((16, 16, 16), dtype=np.uint8)
    labels[4:12, 4:12, 4:12] = 2
    labels[0, 0, 0] = 1
    out = postprocess_labels(
        labels, min_component_voxels=4, et_min_voxels=0, backend="device"
    )
    assert out[0, 0, 0] == 0
    assert (out[4:12, 4:12, 4:12] == 2).all()


def test_many_components_overflow_kept():
    """With more components than the top-k bound, unmatched components must
    be KEPT by the filter (conservative +inf size), never silently dropped."""
    import jax.numpy as jnp

    from brats2019_tpu.ops.connected_components import (
        component_sizes,
        label_components,
    )

    # 4^3 = 64 isolated single-voxel components on a sparse grid
    vol = np.zeros((16, 16, 16), bool)
    vol[1::4, 1::4, 1::4] = True
    comp = np.asarray(label_components(jnp.asarray(vol)))
    assert len(np.unique(comp[comp > 0])) == 64
    sizes = np.asarray(component_sizes(jnp.asarray(comp), max_components=16))
    fg_sizes = sizes[comp > 0]
    # 16 measured as size 1; the rest read huge (kept by any filter)
    assert ((fg_sizes == 1) | (fg_sizes >= 2**30)).all()
    assert (fg_sizes >= 2**30).sum() == (64 - 16)
    assert (sizes[comp == 0] == 0).all()


def test_pointer_jump_converges_on_snake():
    """A long thin snake (diameter ~ N^2) must converge well within the
    128-iteration cap thanks to pointer jumping."""
    import jax.numpy as jnp

    from brats2019_tpu.ops.connected_components import label_components

    vol = np.zeros((1, 24, 24), bool)
    # boustrophedon path: one connected snake of length ~ 24*12
    for r in range(0, 24, 2):
        vol[0, r, :] = True
        if r + 1 < 24:
            vol[0, r + 1, 23 if (r // 2) % 2 == 0 else 0] = True
    comp = np.asarray(label_components(jnp.asarray(vol)))
    ids = np.unique(comp[vol])
    assert len(ids) == 1  # one component, fully merged


def test_snake_component_needs_jump_phase():
    """A serpentine 1-voxel path whose graph diameter exceeds the pool-only
    iteration cap must still label correctly — phase 2 (pointer jumping)
    picks up where capped pooling stops (round-3 two-phase rework)."""
    import numpy as np
    import jax.numpy as jnp
    from scipy import ndimage

    from brats2019_tpu.ops.connected_components import label_components

    shape = (32, 32, 3)
    m = np.zeros(shape, bool)
    for i in range(0, shape[0], 2):
        m[i, :, 1] = True
        if i + 1 < shape[0]:
            m[i + 1, (shape[1] - 1) if (i // 2) % 2 == 0 else 0, 1] = True
    # diameter ~ 16*32 = 512 >> the 24-iteration pool cap used here
    lab = np.asarray(label_components(jnp.asarray(m), max_pool_iters=24))
    ref, n = ndimage.label(m, structure=np.ones((3, 3, 3)))
    assert n == 1
    vals = np.unique(lab[m])
    assert len(vals) == 1 and vals[0] > 0
    assert (lab[~m] == 0).all()
