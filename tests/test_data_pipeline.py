"""Synthetic cases, case loading, sampling, augmentation (SURVEY.md §4.3)."""

import jax
import jax.numpy as jnp
import numpy as np

from brats2019_tpu.data import augment, case, sampling, synthetic
from brats2019_tpu.data.constants import disk_to_internal, internal_to_disk


def test_label_remap_roundtrip():
    internal = np.array([0, 1, 2, 3, 3, 0])
    disk = internal_to_disk(internal)
    np.testing.assert_array_equal(disk, [0, 1, 2, 4, 4, 0])
    np.testing.assert_array_equal(disk_to_internal(disk), internal)


def test_synthetic_case_write_and_load(tmp_path):
    d = synthetic.write_case(str(tmp_path / "BraTS19_SYN_000_1"), shape=(48, 48, 32))
    c = case.load_case(d)
    assert c.image.shape == (48, 48, 32, 4)
    assert c.seg is not None and c.seg.shape == (48, 48, 32)
    assert set(np.unique(c.seg)) <= {0, 1, 2, 3}
    assert (c.seg > 0).sum() > 0  # has a tumor
    assert c.image.dtype == np.float32


def test_discover_cases(tmp_path):
    dirs = synthetic.write_dataset(str(tmp_path), 3, shape=(32, 32, 32))
    found = case.discover_cases(str(tmp_path))
    assert found == sorted(dirs)
    # pointing directly at one case works too
    assert case.discover_cases(dirs[0]) == [dirs[0]]


def test_kfold_split():
    """Deterministic K-fold: folds partition the list, are disjoint, and
    every fold's split reproduces run-to-run (ensemble member training)."""
    import pytest

    cases = [f"c{i}" for i in range(10)]
    all_val = []
    for k in range(3):
        train, val = case.kfold_split(cases, 3, k)
        assert sorted(train + val) == sorted(cases)
        assert not (set(train) & set(val))
        assert case.kfold_split(cases, 3, k) == (train, val)
        all_val += val
    assert sorted(all_val) == sorted(cases)  # folds cover every case once
    with pytest.raises(ValueError):
        case.kfold_split(cases, 1, 0)
    with pytest.raises(ValueError):
        case.kfold_split(cases, 3, 3)
    # degenerate: folds >= len(cases) must never yield an empty train set
    train, val = case.kfold_split(["a", "b"], 2, 0)
    assert train and val == ["a"]


def test_train_cli_fold_validation(tmp_path):
    """--folds/--fold argument contract: must come together and in range."""
    from brats2019_tpu.cli import train as cli_train

    d = synthetic.write_dataset(str(tmp_path), 2, shape=(32, 32, 32))
    root = str(tmp_path)
    assert cli_train.main(["--data", root, "--folds", "3"]) == 2
    assert cli_train.main(["--data", root, "--fold", "0"]) == 2
    assert cli_train.main(
        ["--data", root, "--folds", "3", "--fold", "5"]
    ) == 2


def test_evaluate_fold_indexing_matches_train(tmp_path, capsys):
    """evaluate --folds must partition the UNFILTERED case list (the same
    indexing train uses) and only then drop unlabelled cases — an
    unlabelled case must not shift later cases into different folds."""
    import os

    from brats2019_tpu.cli import evaluate as cli_evaluate

    dirs = synthetic.write_dataset(str(tmp_path), 2, shape=(32, 32, 32))
    # strip case 0's ground truth: train still counts it at index 0
    seg0 = case.seg_path(dirs[0])
    os.remove(seg0)
    root = str(tmp_path)
    # fold 0 = [case0] which is unlabelled -> clean error, not a silent
    # re-indexing that would evaluate case1 under fold 0
    rc = cli_evaluate.main([root, "--preset", "unit",
                            "--workdir", str(tmp_path / "nope"),
                            "--folds", "2", "--fold", "0",
                            "--use-existing"])
    assert rc == 2
    # the failure must be "fold 0 has no labels", NOT a re-indexed attempt
    # to score case1 (which would say 'missing ..._pred' / 'nothing
    # evaluated' instead)
    err = capsys.readouterr().err
    assert "no labelled cases" in err and "fold 0/2" in err
    img, seg = synthetic.make_case_arrays(seed=1, shape=(64, 64, 48))
    fg = sampling.build_fg_table_np(seg)
    key = jax.random.PRNGKey(0)
    imgs, segs = sampling.sample_batch(
        key, jnp.asarray(img), jnp.asarray(seg), (32, 32, 32), batch=8,
        fg_table=jnp.asarray(fg), fg_prob=1.0,
    )
    assert imgs.shape == (8, 32, 32, 32, 4)
    assert segs.shape == (8, 32, 32, 32)
    # with fg_prob=1 every patch must contain tumor
    assert all(np.asarray(segs[i]).sum() > 0 for i in range(8))


def test_sample_patch_uniform_in_bounds():
    img, seg = synthetic.make_case_arrays(seed=2, shape=(40, 40, 40))
    key = jax.random.PRNGKey(1)
    imgs, segs = sampling.sample_batch(
        key, jnp.asarray(img), jnp.asarray(seg), (16, 16, 16), batch=16,
        fg_table=None, fg_prob=0.0,
    )
    assert not np.isnan(np.asarray(imgs)).any()


def test_fg_table_empty_seg():
    seg = np.zeros((20, 20, 20), dtype=np.uint8)
    fg = sampling.build_fg_table_np(seg, size=16)
    assert fg.shape == (16, 3)
    np.testing.assert_array_equal(fg[0], [10, 10, 10])


def test_flips_preserve_alignment():
    img = np.zeros((8, 8, 8, 2), dtype=np.float32)
    seg = np.zeros((8, 8, 8), dtype=np.int32)
    img[1, 2, 3, :] = 7.0
    seg[1, 2, 3] = 3
    # try several keys; image and seg must flip identically
    for s in range(6):
        key = jax.random.PRNGKey(s)
        fi, fs = augment.random_flips(key, jnp.asarray(img), jnp.asarray(seg))
        fi, fs = np.asarray(fi), np.asarray(fs)
        pos_img = np.argwhere(fi[..., 0] != 0)
        pos_seg = np.argwhere(fs != 0)
        np.testing.assert_array_equal(pos_img, pos_seg)


def test_intensity_jitter_zero_background():
    img = np.zeros((8, 8, 8, 4), dtype=np.float32)
    img[2:6, 2:6, 2:6, :] = 1.0
    out = np.asarray(
        augment.intensity_jitter(jax.random.PRNGKey(0), jnp.asarray(img))
    )
    assert (out[img == 0] == 0).all()
    assert (out[img != 0] != 0).all()
    assert not np.allclose(out[img != 0], 1.0)  # actually jittered


def test_rot90_axial_exact_and_aligned():
    """rot90 must be a pure permutation (same multiset of voxels), keep
    image/seg aligned, and reproduce np.rot90 for each sampled k."""
    rng = np.random.default_rng(0)
    img = rng.normal(size=(8, 8, 4, 2)).astype(np.float32)
    seg = rng.integers(0, 4, size=(8, 8, 4)).astype(np.int32)
    seen = set()
    for s in range(12):
        key = jax.random.PRNGKey(s)
        ri, rs = augment.random_rot90_axial(
            key, jnp.asarray(img), jnp.asarray(seg)
        )
        ri, rs = np.asarray(ri), np.asarray(rs)
        # match against the k that produced it
        for k in range(4):
            if np.array_equal(ri, np.rot90(img, k, axes=(0, 1))):
                np.testing.assert_array_equal(
                    rs, np.rot90(seg, k, axes=(0, 1))
                )
                seen.add(k)
                break
        else:
            raise AssertionError("output matched no np.rot90(k)")
    assert len(seen) >= 3  # the sampler actually covers the rotations


def test_gamma_jitter_properties():
    """Gamma keeps zeros zero, preserves per-channel min/max (monotone map
    on the normalized range), and changes interior values."""
    rng = np.random.default_rng(1)
    img = np.zeros((8, 8, 8, 4), dtype=np.float32)
    img[2:7, 2:7, 2:7, :] = rng.normal(size=(5, 5, 5, 4)).astype(np.float32)
    out = np.asarray(
        augment.gamma_jitter(jax.random.PRNGKey(3), jnp.asarray(img), 0.5)
    )
    assert (out[img == 0] == 0).all()
    nz = img != 0
    assert not np.allclose(out[nz], img[nz])
    for c in range(4):
        m = nz[..., c]
        np.testing.assert_allclose(
            out[..., c][m].min(), img[..., c][m].min(), atol=1e-3
        )
        np.testing.assert_allclose(
            out[..., c][m].max(), img[..., c][m].max(), atol=1e-3
        )


def test_augment_with_extras_in_step_config():
    """rot90/gamma flow through the full augment() and stay shape/dtype
    stable under jit (the train step compiles them in)."""
    img, seg = synthetic.make_case_arrays(seed=5, shape=(16, 16, 16))
    fn = jax.jit(
        lambda k: augment.augment(
            k, jnp.asarray(img), jnp.asarray(seg),
            rot90=True, gamma_range=0.3,
        )
    )
    ai, as_ = fn(jax.random.PRNGKey(2))
    assert ai.shape == img.shape and as_.shape == seg.shape
    assert ai.dtype == img.dtype


def test_augment_batch_shapes():
    img, seg = synthetic.make_case_arrays(seed=4, shape=(16, 16, 16))
    imgs = jnp.asarray(np.stack([img] * 4))
    segs = jnp.asarray(np.stack([seg] * 4))
    ai, as_ = augment.augment_batch(jax.random.PRNGKey(0), imgs, segs)
    assert ai.shape == imgs.shape and as_.shape == segs.shape
    # different batch elements got different augmentations
    assert not np.allclose(np.asarray(ai[0]), np.asarray(ai[1]))


def test_case_cursor_multihost_striding_disjoint():
    """H striped cursors over one epoch cover all cases exactly once
    (ADVICE round-1 medium: hosts must not all load the same cases)."""
    from brats2019_tpu.data.pipeline import CaseCursor

    n, hosts = 13, 4
    cursors = [
        CaseCursor(n, seed=7, stride=hosts, offset=p) for p in range(hosts)
    ]
    visited = []
    for c in cursors:
        while c.epoch == 0:
            visited.append(c.next_index())
    assert sorted(visited) == list(range(n))

    # epoch 1 re-covers everything too (new permutation, same partition law)
    visited2 = []
    for c in cursors:
        while c.epoch == 1:
            visited2.append(c.next_index())
    assert sorted(visited2) == list(range(n))
    assert visited2 != visited  # reshuffled between epochs


def test_case_cursor_fewer_cases_than_hosts():
    from brats2019_tpu.data.pipeline import CaseCursor

    c = CaseCursor(2, seed=0, stride=8, offset=5)  # offset >= n_cases
    ids = [c.next_index() for _ in range(4)]
    assert all(0 <= i < 2 for i in ids)
    assert c.epoch == 4  # one position per epoch in the degenerate regime


def test_case_cursor_default_matches_single_host():
    from brats2019_tpu.data.pipeline import CaseCursor

    a = CaseCursor(9, seed=3)
    b = CaseCursor(9, seed=3, stride=1, offset=0)
    assert [a.next_index() for _ in range(20)] == [
        b.next_index() for _ in range(20)
    ]


def test_checked_sampling_bounds():
    """checkify sanitizer (SURVEY.md §5): a corrupt fg table raises; a good
    one passes; an oversized patch fails at trace time."""
    import pytest

    from brats2019_tpu.data.sampling import checked_sample_batch, sample_patch

    img = jnp.asarray(np.random.default_rng(0).normal(size=(24, 24, 24, 4)),
                      jnp.float32)
    seg = jnp.zeros((24, 24, 24), jnp.uint8)
    good = jnp.full((16, 3), 12, jnp.int32)
    out = checked_sample_batch(
        jax.random.PRNGKey(0), img, seg, (8, 8, 8), 2, good, 1.0
    )
    assert out[0].shape == (2, 8, 8, 8, 4)

    bad = jnp.full((16, 3), 99, jnp.int32)  # way outside the 24^3 volume
    with pytest.raises(Exception, match="out of volume bounds"):
        checked_sample_batch(
            jax.random.PRNGKey(0), img, seg, (8, 8, 8), 2, bad, 1.0
        )

    with pytest.raises(ValueError, match="exceeds volume"):
        sample_patch(jax.random.PRNGKey(0), img, seg, (32, 8, 8), good, 0.5)
