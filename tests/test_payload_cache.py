"""Serving/predict transfer-payload cache (infer/payload_cache.py) and the
in-memory payload memo (Predictor._memo_encode) — VERDICT r3 #5.

Contract under test: a cache/memo hit produces BITWISE the same transfer
payload (and therefore the same masks) as the uncached path, invalidation
tracks the modality files (not seg uploads), corrupt entries rebuild, and
the memo is bounded and identity-keyed.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brats2019_tpu.configs.presets import (
    ExperimentConfig,
    InferenceConfig,
    TrainConfig,
)
from brats2019_tpu.data.synthetic import make_case_arrays, write_case
from brats2019_tpu.infer import payload_cache as pc
from brats2019_tpu.infer.predictor import Predictor
from brats2019_tpu.models import UNet3D, UNetConfig
from brats2019_tpu.utils.nifti import read_nifti

UCFG = UNetConfig(levels=2, base_features=4, compute_dtype="float32")


def _exp(transfer_dtype="bfloat16", prep_cache_dir=None, memo=8):
    return ExperimentConfig(
        name="t",
        unet=UCFG,
        coarse_unet=None,
        train=TrainConfig(pool_shape=(32, 32, 32)),
        infer=InferenceConfig(
            canvas=None,
            tile=(16, 16, 16),
            cascade=False,
            tta_flips=False,
            min_component_voxels=0,
            et_min_voxels=0,
            compute_dtype="float32",
            transfer_dtype=transfer_dtype,
            prep_cache_dir=prep_cache_dir,
            payload_memo_volumes=memo,
        ),
    )


def _params(key=0):
    model = UNet3D(UCFG)
    return model.init(jax.random.PRNGKey(key), jnp.zeros((1, 16, 16, 16, 4)))


@pytest.fixture()
def case_dir(tmp_path):
    d = str(tmp_path / "BraTS19_SYN_000_1")
    write_case(d, seed=3, shape=(32, 32, 24), with_seg=False)
    return d


def _read_mask(path):
    seg, _ = read_nifti(path, apply_scaling=False)
    return np.asarray(seg)


@pytest.mark.parametrize("transfer_dtype", ["bfloat16", "int8"])
def test_cached_payload_and_masks_bitwise(case_dir, tmp_path, transfer_dtype):
    params = _params()
    out_a = str(tmp_path / "a.nii.gz")
    out_b = str(tmp_path / "b.nii.gz")
    out_c = str(tmp_path / "c.nii.gz")
    # uncached reference
    Predictor(_exp(transfer_dtype), params).predict_dir(case_dir, out_a)
    # cold cache (miss + store), then a hit — one Predictor, same jit cache
    cache = str(tmp_path / "cache")
    pred = Predictor(_exp(transfer_dtype, prep_cache_dir=cache), params)
    pred.predict_dir(case_dir, out_b)
    entries = [f for f in os.listdir(cache) if f.endswith(".npz")]
    assert len(entries) == 1 and f".{transfer_dtype}." in entries[0]
    mtime = os.path.getmtime(os.path.join(cache, entries[0]))
    pred.predict_dir(case_dir, out_c)
    assert os.path.getmtime(os.path.join(cache, entries[0])) == mtime
    a, b, c = _read_mask(out_a), _read_mask(out_b), _read_mask(out_c)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(b, c)
    # the stored payload is bitwise what _encode_host produces
    from brats2019_tpu.data.case import load_case

    path = os.path.join(cache, entries[0])
    small, dst, bbox = pc.load_payload(path)
    case = load_case(case_dir, load_seg=False)
    small2, dst2, bbox2 = pred._encode_host(case.image, case.meta)
    np.testing.assert_array_equal(
        np.asarray(small).view(np.uint8), np.asarray(small2).view(np.uint8)
    )
    np.testing.assert_array_equal(dst, dst2)
    assert bbox.lo == bbox2.lo and bbox.hi == bbox2.hi
    assert bbox.shape == bbox2.shape


def test_rewrite_invalidates_and_prunes(case_dir, tmp_path):
    params = _params()
    cache = str(tmp_path / "cache")
    pred = Predictor(_exp(prep_cache_dir=cache), params)
    pred.predict_dir(case_dir, str(tmp_path / "a.nii.gz"))
    old = [f for f in os.listdir(cache) if f.endswith(".npz")]
    # rewrite the case with different content (and force a new mtime_ns)
    write_case(case_dir, seed=9, shape=(32, 32, 24), with_seg=False)
    t1 = os.path.join(
        case_dir, os.path.basename(case_dir) + "_t1.nii.gz"
    )
    os.utime(t1, (os.path.getmtime(t1) + 10,) * 2)
    pred.predict_dir(case_dir, str(tmp_path / "b.nii.gz"))
    new = [f for f in os.listdir(cache) if f.endswith(".npz")]
    assert len(new) == 1 and new != old  # superseded entry pruned
    # cached second run matches a fresh uncached prediction of the NEW data
    Predictor(_exp(), params).predict_dir(case_dir, str(tmp_path / "ref.nii.gz"))
    np.testing.assert_array_equal(
        _read_mask(str(tmp_path / "b.nii.gz")),
        _read_mask(str(tmp_path / "ref.nii.gz")),
    )


def test_seg_upload_does_not_invalidate(case_dir):
    """Uploading ground-truth labels next to an already-cached case must
    not invalidate its payload (prediction never reads the seg): the key
    is a pure function of the MODALITY files' signature."""
    from brats2019_tpu.utils.nifti import write_nifti

    args = ("/cache", case_dir, (32, 32, 32), 16, "bfloat16")
    before = pc.payload_cache_path(*args)
    seg = os.path.join(case_dir, os.path.basename(case_dir) + "_seg.nii.gz")
    assert not os.path.exists(seg)
    write_nifti(seg, np.zeros((32, 32, 24), np.uint8))
    assert pc.payload_cache_path(*args) == before
    # but touching a modality file DOES change the key
    t1 = os.path.join(case_dir, os.path.basename(case_dir) + "_t1.nii.gz")
    os.utime(t1, (os.path.getmtime(t1) + 10,) * 2)
    assert pc.payload_cache_path(*args) != before


def test_store_failure_degrades_to_uncached(tmp_path, capsys):
    """A cache volume that cannot be created/written must degrade to
    uncached operation — never raise (the serving daemon would quarantine
    healthy cases). Regression: the cleanup path referenced the tmp name
    before assignment when makedirs itself failed."""
    from brats2019_tpu.data.preprocess import BBox

    blocker = tmp_path / "blocker"
    blocker.write_text("a file where the cache dir should be")
    path = os.path.join(str(blocker), "sub", "x.pv1.c1x1x1.b0.bfloat16.h.npz")
    pc.store_payload(
        path, np.zeros((2, 2, 2, 4), np.float32), None,
        BBox((0, 0, 0), (2, 2, 2), (2, 2, 2)),
    )  # must not raise
    assert "write failed" in capsys.readouterr().err


def test_corrupt_entry_is_rebuilt(case_dir, tmp_path, capsys):
    params = _params()
    cache = str(tmp_path / "cache")
    pred = Predictor(_exp(prep_cache_dir=cache), params)
    pred.predict_dir(case_dir, str(tmp_path / "a.nii.gz"))
    entry = os.path.join(cache, os.listdir(cache)[0])
    with open(entry, "wb") as f:
        f.write(b"garbage")
    pred.predict_dir(case_dir, str(tmp_path / "b.nii.gz"))
    assert "corrupt entry" in capsys.readouterr().err
    np.testing.assert_array_equal(
        _read_mask(str(tmp_path / "a.nii.gz")),
        _read_mask(str(tmp_path / "b.nii.gz")),
    )
    # entry was rebuilt and is readable again
    assert pc.load_payload(entry) is not None


def test_payload_memo_hits_and_bound(monkeypatch):
    """Repeat in-memory volumes skip the host encode; the memo is bounded
    and keyed by array identity (equal-valued copies don't alias)."""
    params = _params()
    pred = Predictor(_exp(memo=2), params)
    calls = {"n": 0}
    real = pred._encode_host

    def counting(image, meta=None):
        calls["n"] += 1
        return real(image, meta)

    monkeypatch.setattr(pred, "_encode_host", counting)
    img1, _ = make_case_arrays(seed=1, shape=(32, 32, 24))
    img2, _ = make_case_arrays(seed=2, shape=(32, 32, 24))
    a1, _ = pred.predict_arrays(img1)
    a2, _ = pred.predict_arrays(img1)  # memo hit
    assert calls["n"] == 1
    np.testing.assert_array_equal(a1, a2)
    # a copy with equal values is a DIFFERENT submission -> fresh encode
    # (held alive so LRU bounding below is tested on live entries)
    copy1 = img1.copy()
    pred.predict_arrays(copy1)
    assert calls["n"] == 2
    # bound: all three keys alive, cap 2 -> img1 (least recent) evicted
    pred.predict_arrays(img2)
    assert calls["n"] == 3
    assert len(pred._payload_memo) == 2
    pred.predict_arrays(img1)
    assert calls["n"] == 4  # was evicted, re-encoded


def test_payload_memo_releases_dropped_volumes(monkeypatch):
    """The memo must not pin volumes the caller has dropped: entries hold
    WEAK references, and dead entries (plus their payloads) are swept on
    the next access — a stream of distinct volumes leaves nothing behind."""
    params = _params()
    pred = Predictor(_exp(memo=8), params)
    for seed in (1, 2, 3):
        img, _ = make_case_arrays(seed=seed, shape=(32, 32, 24))
        pred.predict_arrays(img)
        del img  # caller drops its only reference
    keep, _ = make_case_arrays(seed=4, shape=(32, 32, 24))
    pred.predict_arrays(keep)  # access sweeps the dead entries
    assert len(pred._payload_memo) == 1  # only the live volume remains
    # and the survivor still hits
    calls = {"n": 0}
    real = pred._encode_host

    def counting(image, meta=None):
        calls["n"] += 1
        return real(image, meta)

    monkeypatch.setattr(pred, "_encode_host", counting)
    pred.predict_arrays(keep)
    assert calls["n"] == 0


def test_memo_disabled(monkeypatch):
    params = _params()
    pred = Predictor(_exp(memo=0), params)
    calls = {"n": 0}
    real = pred._encode_host

    def counting(image, meta=None):
        calls["n"] += 1
        return real(image, meta)

    monkeypatch.setattr(pred, "_encode_host", counting)
    img, _ = make_case_arrays(seed=1, shape=(32, 32, 24))
    pred.predict_arrays(img)
    pred.predict_arrays(img)
    assert calls["n"] == 2
    assert len(pred._payload_memo) == 0


def test_prefill_writes_serving_identical_payload(case_dir, tmp_path):
    """Predictor.prefill_payload_cache (serve watch-loop prefill, VERDICT
    r4 #5): the prefilled entry is bitwise what the serving miss path
    would have stored — a subsequent predict is a warm hit (no rewrite)
    with identical masks — and re-prefill is a no-op."""
    params = _params()
    cache = str(tmp_path / "cache")
    pred = Predictor(_exp(prep_cache_dir=cache), params)
    assert pred.prefill_payload_cache(case_dir) is True
    entries = [f for f in os.listdir(cache) if f.endswith(".npz")]
    assert len(entries) == 1
    path = os.path.join(cache, entries[0])
    mtime = os.path.getmtime(path)
    # warm: second prefill does nothing
    assert pred.prefill_payload_cache(case_dir) is False
    assert os.path.getmtime(path) == mtime
    # serving rides the prefilled entry (no rewrite) and masks match the
    # uncached reference
    out_a = str(tmp_path / "a.nii.gz")
    out_b = str(tmp_path / "b.nii.gz")
    Predictor(_exp(), params).predict_dir(case_dir, out_a)
    pred.predict_dir(case_dir, out_b)
    assert os.path.getmtime(path) == mtime
    np.testing.assert_array_equal(_read_mask(out_a), _read_mask(out_b))


def test_prefill_disabled_without_cache_dir(case_dir):
    pred = Predictor(_exp(), _params())
    assert pred.prefill_payload_cache(case_dir) is False


def test_serve_loop_prefills_queued_cases(tmp_path, monkeypatch):
    """The serve daemon prefills arrivals queued behind the current
    batch: with a burst larger than the pipeline window, the later
    cases' payload entries appear via the background worker and every
    case is served with correct labels."""
    import time as _time

    from brats2019_tpu.cli.serve import Server
    from brats2019_tpu.configs.presets import PRESETS

    cache = str(tmp_path / "cache")
    exp = dataclasses.replace(
        _exp(prep_cache_dir=cache), workdir=str(tmp_path / "run")
    )
    from brats2019_tpu.train.checkpoint import export_params

    os.makedirs(os.path.join(exp.workdir, "fine"), exist_ok=True)
    export_params(os.path.join(exp.workdir, "fine", "params.npz"), _params())
    monkeypatch.setitem(PRESETS, "prefill_unit", exp)

    watch = tmp_path / "watch"
    watch.mkdir()
    for i in range(3):
        write_case(str(watch / f"BraTS19_SYN_{i:03d}_1"), seed=10 + i,
                   shape=(32, 32, 24), with_seg=False)
    out_dir = str(tmp_path / "served")
    server = Server(exp, output_dir=out_dir, log_dir=str(watch))
    assert server._can_prefill
    # deterministic prefill check: queue the tail cases like run() does,
    # then wait for the worker to warm them
    tail = [str(watch / "BraTS19_SYN_001_1"), str(watch / "BraTS19_SYN_002_1")]
    server._queue_prefill(tail)
    deadline = _time.time() + 60
    while _time.time() < deadline and server.counters["prefilled"] < 2:
        _time.sleep(0.05)
    assert server.counters["prefilled"] == 2
    entries = [f for f in os.listdir(cache) if f.endswith(".npz")]
    assert len(entries) == 2
    # the burst serves end-to-end; prefilled cases are warm hits
    mtimes = {f: os.path.getmtime(os.path.join(cache, f)) for f in entries}
    server.run(str(watch), poll=0.05, once=True)
    for i in range(3):
        assert os.path.exists(
            os.path.join(out_dir, f"BraTS19_SYN_{i:03d}_1_pred.nii.gz")
        )
    for f, m in mtimes.items():
        assert os.path.getmtime(os.path.join(cache, f)) == m  # no rewrite
