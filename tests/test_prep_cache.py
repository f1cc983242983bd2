"""Prep cache (data/pipeline.py cached_prepare_training_case):
exact-equality with the uncached path, invalidation on input/param
changes, corrupt-entry recovery, and CLI wiring."""

import os

import numpy as np
import pytest

from brats2019_tpu.data import pipeline as pl
from brats2019_tpu.data.synthetic import write_case

CANVAS = (32, 32, 32)


@pytest.fixture()
def case_dir(tmp_path):
    d = str(tmp_path / "BraTS19_SYN_000_1")
    write_case(d, seed=0, shape=(24, 28, 20))
    return d


def _assert_same(a, b):
    for k in ("image", "seg", "fg"):
        np.testing.assert_array_equal(
            np.asarray(a[k]), np.asarray(b[k]), err_msg=k
        )
        assert a[k].dtype == b[k].dtype, k


def test_cache_roundtrip_is_exact(case_dir, tmp_path):
    cache = str(tmp_path / "cache")
    direct = pl.cached_prepare_training_case(case_dir, CANVAS)
    first = pl.cached_prepare_training_case(case_dir, CANVAS,
                                            cache_dir=cache)
    _assert_same(direct, first)
    entries = os.listdir(cache)
    assert len(entries) == 1 and entries[0].endswith(".npz")
    # second call reads the entry (same mtime -> same file, same content)
    mtime = os.path.getmtime(os.path.join(cache, entries[0]))
    second = pl.cached_prepare_training_case(case_dir, CANVAS,
                                             cache_dir=cache)
    _assert_same(direct, second)
    assert os.path.getmtime(os.path.join(cache, entries[0])) == mtime


def test_cache_key_separates_params_and_inputs(case_dir, tmp_path):
    cache = str(tmp_path / "cache")
    pl.cached_prepare_training_case(case_dir, CANVAS, cache_dir=cache)
    # different downsample -> new entry, correct (coarse) content
    coarse = pl.cached_prepare_training_case(
        case_dir, (16, 16, 16), downsample=2, cache_dir=cache
    )
    assert coarse["image"].shape[:3] == (16, 16, 16)
    assert len(os.listdir(cache)) == 2
    # touching an input invalidates — AND the superseded entry for the
    # same case+params is pruned (re-uploads must not leak ~50 MB orphans)
    t1 = os.path.join(case_dir, os.path.basename(case_dir) + "_t1.nii.gz")
    write_case(case_dir, seed=7, shape=(24, 28, 20))
    os.utime(t1, (os.path.getmtime(t1) + 10,) * 2)
    fresh = pl.cached_prepare_training_case(case_dir, CANVAS,
                                            cache_dir=cache)
    entries = os.listdir(cache)
    assert len(entries) == 2  # new canvas entry + untouched coarse entry
    assert any(".d2." in e for e in entries)
    direct = pl.cached_prepare_training_case(case_dir, CANVAS)
    _assert_same(direct, fresh)


def test_corrupt_entry_is_rebuilt(case_dir, tmp_path, capsys):
    cache = str(tmp_path / "cache")
    pl.cached_prepare_training_case(case_dir, CANVAS, cache_dir=cache)
    entry = os.path.join(cache, os.listdir(cache)[0])
    with open(entry, "wb") as f:
        f.write(b"garbage")
    out = pl.cached_prepare_training_case(case_dir, CANVAS,
                                          cache_dir=cache)
    direct = pl.cached_prepare_training_case(case_dir, CANVAS)
    _assert_same(direct, out)
    assert "corrupt cache entry" in capsys.readouterr().err
    # and the entry was rebuilt to a valid one
    again = pl.cached_prepare_training_case(case_dir, CANVAS,
                                            cache_dir=cache)
    _assert_same(direct, again)


def test_version_bump_prunes_old_entries(case_dir, tmp_path, monkeypatch):
    """Entries written under an older PREP_CACHE_VERSION are unreadable
    forever — a rewrite under the new version must remove them."""
    cache = str(tmp_path / "cache")
    pl.cached_prepare_training_case(case_dir, CANVAS, cache_dir=cache)
    assert any(".v1." in e for e in os.listdir(cache))
    monkeypatch.setattr(pl, "PREP_CACHE_VERSION", 2)
    pl.cached_prepare_training_case(case_dir, CANVAS, cache_dir=cache)
    entries = os.listdir(cache)
    assert len(entries) == 1 and ".v2." in entries[0]


def test_bf16_bit_pattern_survives(case_dir, tmp_path):
    """The uint16-view encoding must preserve bf16 bits exactly (incl.
    negative z-scores and zeros)."""
    cache = str(tmp_path / "cache")
    a = pl.cached_prepare_training_case(case_dir, CANVAS, cache_dir=cache)
    b = pl.cached_prepare_training_case(case_dir, CANVAS, cache_dir=cache)
    assert a["image"].dtype == pl.BF16 and b["image"].dtype == pl.BF16
    np.testing.assert_array_equal(
        np.asarray(a["image"]).view(np.uint16),
        np.asarray(b["image"]).view(np.uint16),
    )


def test_train_cli_flag_reaches_pool(tmp_path, monkeypatch):
    """--prep-cache flows through resolve_experiment -> TrainConfig ->
    CasePool, and a short training run populates the cache."""
    from brats2019_tpu.cli import train as cli_train

    monkeypatch.chdir(tmp_path)
    cache = str(tmp_path / "cache")
    rc = cli_train.main([
        "--data", str(tmp_path / "data"), "--synthetic", "2",
        "--synthetic-shape", "32", "32", "32", "--preset", "unit",
        "--steps", "3", "--workdir", str(tmp_path / "run"),
        "--prep-cache", cache,
    ])
    assert rc == 0
    assert any(e.endswith(".npz") for e in os.listdir(cache))
