"""Serving daemon (cli/serve.py): watch-dir ingest readiness, drain-once
processing, JSONL completion log, and the stop signal path."""

import json
import os
import shutil

import numpy as np
import pytest

from brats2019_tpu.cli import serve as cli_serve
from brats2019_tpu.cli import train as cli_train
from brats2019_tpu.utils.nifti import read_nifti


def test_case_ready_requires_stable_sizes(tmp_path):
    """A case mid-upload (file sizes still changing) must not be picked up."""
    from brats2019_tpu.data.synthetic import write_case

    case = str(tmp_path / "BraTS19_SYN_000_1")
    write_case(case, seed=0, shape=(16, 16, 16))
    sizes = {}
    # first sight: sizes unknown -> not ready (primes the table)
    assert not cli_serve._case_ready(case, sizes)
    # second sight, unchanged -> ready
    assert cli_serve._case_ready(case, sizes)
    # a file grows (upload in progress) -> not ready again
    t1 = os.path.join(case, os.path.basename(case) + "_t1.nii.gz")
    with open(t1, "ab") as f:
        f.write(b"x" * 10)
    assert not cli_serve._case_ready(case, sizes)
    assert cli_serve._case_ready(case, sizes)
    # missing modality -> never ready
    os.remove(t1)
    assert not cli_serve._case_ready(case, sizes)


@pytest.mark.slow
def test_serve_once_end_to_end(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    data = str(tmp_path / "train_data")
    workdir = str(tmp_path / "run")
    rc = cli_train.main([
        "--data", data, "--synthetic", "2", "--synthetic-shape", "32", "32", "32",
        "--preset", "unit", "--steps", "3", "--checkpoint-every", "2",
        "--workdir", workdir,
    ])
    assert rc == 0

    # incoming cases appear in the watch root (reuse the synthetic ones)
    watch = tmp_path / "incoming"
    watch.mkdir()
    for name in ("BraTS19_SYN_000_1", "BraTS19_SYN_001_1"):
        shutil.copytree(os.path.join(data, name), watch / name)
    out_dir = str(tmp_path / "served")

    rc = cli_serve.main([
        str(watch), "--preset", "unit", "--workdir", workdir,
        "--output-dir", out_dir, "--once",
    ])
    assert rc == 0

    log = [
        json.loads(l)
        for l in open(os.path.join(out_dir, "serve_log.jsonl"))
    ]
    assert {r["case"] for r in log} == {
        "BraTS19_SYN_000_1", "BraTS19_SYN_001_1"
    }
    for r in log:
        seg, _ = read_nifti(r["output"], apply_scaling=False)
        assert seg.shape == (32, 32, 32)
        assert set(np.unique(seg)) <= {0, 1, 2, 4}
    # predictions went to --output-dir, never into the watch tree
    assert not any(
        f.endswith("_pred.nii.gz")
        for d in watch.iterdir() if d.is_dir()
        for f in os.listdir(d)
    )


def test_serve_once_ensemble(tmp_path, monkeypatch):
    """serve --ensemble drains a watch root through the EnsemblePredictor:
    a 2-member ensemble of the same workdir must serve every case with a
    valid mask (identical members -> identical probs mean)."""
    monkeypatch.chdir(tmp_path)
    data = str(tmp_path / "train_data")
    workdir = str(tmp_path / "run")
    rc = cli_train.main([
        "--data", data, "--synthetic", "1", "--synthetic-shape", "32", "32", "32",
        "--preset", "unit", "--steps", "2", "--workdir", workdir,
    ])
    assert rc == 0
    watch = tmp_path / "incoming"
    watch.mkdir()
    shutil.copytree(
        os.path.join(data, "BraTS19_SYN_000_1"), watch / "BraTS19_SYN_000_1"
    )
    out_dir = str(tmp_path / "served")
    rc = cli_serve.main([
        str(watch), "--preset", "unit", "--workdir", workdir,
        "--ensemble", workdir, "--output-dir", out_dir, "--once",
        "--save-probs", "--save-uncertainty",
    ])
    assert rc == 0
    log = [
        json.loads(l)
        for l in open(os.path.join(out_dir, "serve_log.jsonl"))
    ]
    assert len(log) == 1 and log[0].get("error") is None
    seg, _ = read_nifti(log[0]["output"], apply_scaling=False)
    assert seg.shape == (32, 32, 32)
    assert set(np.unique(seg)) <= {0, 1, 2, 4}
    # QA artifacts land in --output-dir, never the watch tree
    z = np.load(os.path.join(out_dir, "BraTS19_SYN_000_1_probs.npz"))
    assert z["probs"].shape == (32, 32, 32, 4)
    for r in ("whole", "core", "enhance"):
        u, _ = read_nifti(
            os.path.join(out_dir, f"BraTS19_SYN_000_1_unc_{r}.nii.gz"),
            apply_scaling=False,
        )
        assert u.min() >= 0 and u.max() <= 100
    assert not any(
        f.endswith((".npz", "_pred.nii.gz")) or "_unc_" in f
        for f in os.listdir(watch / "BraTS19_SYN_000_1")
    )


def test_serve_stop_signal_drains():
    """request_stop flips the loop condition (SIGTERM handler target)."""
    s = object.__new__(cli_serve.Server)  # no model needed for this check
    s._stop = False
    assert not s.stopping
    s.request_stop()
    assert s.stopping


@pytest.mark.slow
def test_serve_quarantines_poison_case_and_skips_on_restart(
    tmp_path, monkeypatch
):
    """A corrupt case must be quarantined (logged with an error, other
    cases still served) and never reprocessed by a restarted daemon."""
    monkeypatch.chdir(tmp_path)
    data = str(tmp_path / "train_data")
    workdir = str(tmp_path / "run")
    rc = cli_train.main([
        "--data", data, "--synthetic", "2", "--synthetic-shape", "32", "32", "32",
        "--preset", "unit", "--steps", "3", "--checkpoint-every", "2",
        "--workdir", workdir,
    ])
    assert rc == 0

    watch = tmp_path / "incoming"
    watch.mkdir()
    shutil.copytree(
        os.path.join(data, "BraTS19_SYN_000_1"), watch / "BraTS19_SYN_000_1"
    )
    poison = watch / "BraTS19_SYN_666_1"
    shutil.copytree(os.path.join(data, "BraTS19_SYN_001_1"), poison)
    for f in os.listdir(poison):  # corrupt every modality: truncated gzip
        (poison / f).rename(poison / f.replace("BraTS19_SYN_001_1",
                                               "BraTS19_SYN_666_1"))
    t1 = poison / "BraTS19_SYN_666_1_t1.nii.gz"
    t1.write_bytes(t1.read_bytes()[:100])

    out_dir = str(tmp_path / "served")
    rc = cli_serve.main([
        str(watch), "--preset", "unit", "--workdir", workdir,
        "--output-dir", out_dir, "--once", "--poll", "0.05",
    ])
    assert rc == 0
    log = [
        json.loads(l)
        for l in open(os.path.join(out_dir, "serve_log.jsonl"))
    ]
    by_case = {r["case"]: r for r in log}
    assert by_case["BraTS19_SYN_000_1"]["output"] is not None
    assert by_case["BraTS19_SYN_666_1"]["output"] is None
    assert "error" in by_case["BraTS19_SYN_666_1"]

    # restart: replayed log marks both done; nothing is reprocessed
    exp = cli_serve.resolve_experiment(
        cli_serve.build_parser().parse_args(
            [str(watch), "--preset", "unit", "--workdir", workdir]
        )
    )
    server = cli_serve.Server(exp, output_dir=out_dir)
    assert server.done == {"BraTS19_SYN_000_1", "BraTS19_SYN_666_1"}
    sizes = {}
    server.scan(str(watch), sizes)
    assert server.scan(str(watch), sizes) == []


@pytest.mark.slow
def test_serve_loop_mode_picks_up_new_case_and_drains(tmp_path, monkeypatch):
    """Daemon loop: a case dropped AFTER startup is picked up within the
    poll cadence; request_stop drains the loop."""
    import threading
    import time

    monkeypatch.chdir(tmp_path)
    data = str(tmp_path / "train_data")
    workdir = str(tmp_path / "run")
    rc = cli_train.main([
        "--data", data, "--synthetic", "2", "--synthetic-shape", "32", "32", "32",
        "--preset", "unit", "--steps", "3", "--checkpoint-every", "2",
        "--workdir", workdir,
    ])
    assert rc == 0

    watch = tmp_path / "incoming"
    watch.mkdir()
    out_dir = str(tmp_path / "served")
    exp = cli_serve.resolve_experiment(
        cli_serve.build_parser().parse_args(
            [str(watch), "--preset", "unit", "--workdir", workdir]
        )
    )
    server = cli_serve.Server(exp, output_dir=out_dir)
    t = threading.Thread(
        target=server.run, args=(str(watch), 0.05, False), daemon=True
    )
    t.start()
    time.sleep(0.3)  # daemon idling on an empty root
    shutil.copytree(
        os.path.join(data, "BraTS19_SYN_000_1"), watch / "BraTS19_SYN_000_1"
    )
    deadline = time.time() + 120
    while time.time() < deadline and not server.done:
        time.sleep(0.2)
    server.request_stop()
    t.join(timeout=30)
    assert not t.is_alive()
    assert server.done == {"BraTS19_SYN_000_1"}
    assert os.path.exists(
        os.path.join(out_dir, "BraTS19_SYN_000_1_pred.nii.gz")
    )
    hb = json.load(open(os.path.join(out_dir, "serve_heartbeat.json")))
    assert hb["done"] >= 0 and hb["ts"] > 0


def test_shard_assignment_is_stable_and_partitioning():
    """--shard: every case lands in exactly one shard, assignment is a
    pure function of the name (identical across hosts/runs), and I/N
    validation rejects malformed specs."""
    names = [f"BraTS19_CBICA_{i:03d}_1" for i in range(50)]
    n = 4
    shards = [cli_serve.shard_of(x, n) for x in names]
    assert set(shards) <= set(range(n))
    assert len(set(shards)) > 1  # actually spreads
    assert shards == [cli_serve.shard_of(x, n) for x in names]  # stable
    assert cli_serve.parse_shard("2/4") == (2, 4)
    for bad in ("4/4", "-1/4", "x/4", "1", "1/0"):
        with pytest.raises(ValueError):
            cli_serve.parse_shard(bad)


def test_predict_shard_filter_matches_serve(tmp_path):
    """predict/evaluate --shard use the SAME assignment as serve --shard
    (one filter_shard helper), so a mixed fleet partitions identically."""
    from brats2019_tpu.cli.common import filter_shard, shard_of

    dirs = [str(tmp_path / f"BraTS19_SYN_{i:03d}_1") for i in range(10)]
    got = filter_shard(dirs, "1/3")
    assert got == [
        d for d in dirs
        if shard_of(os.path.basename(d), 3) == 1
    ]
    assert filter_shard(dirs, None) == dirs
    import pytest as _pytest

    with _pytest.raises(ValueError):
        filter_shard(dirs, "3/3")


def test_shard_scan_is_disjoint_and_covering(tmp_path):
    """Two sharded servers over one watch root pick up DISJOINT case sets
    whose union is everything."""
    from brats2019_tpu.data.synthetic import write_case

    cases = []
    for i in range(6):
        d = str(tmp_path / f"BraTS19_SYN_{i:03d}_1")
        write_case(d, seed=i, shape=(16, 16, 16))
        cases.append(os.path.basename(d))

    def scan_for(shard):
        s = _bare_server()
        s.done = set()
        s.shard = shard
        sizes = {}
        s.scan(str(tmp_path), sizes)  # prime size table
        return {os.path.basename(d) for d in s.scan(str(tmp_path), sizes)}

    got0, got1 = scan_for((0, 2)), scan_for((1, 2))
    assert got0 and got1
    assert got0.isdisjoint(got1)
    assert got0 | got1 == set(cases)


@pytest.mark.slow
def test_sighup_hot_reload_swaps_weights(tmp_path, monkeypatch):
    """SIGHUP reload: freshly exported weights take effect on the live
    daemon with zero recompiles; a reload failure keeps serving."""
    import jax
    import jax.numpy as jnp

    from brats2019_tpu.models import UNet3D
    from brats2019_tpu.train.checkpoint import export_params

    monkeypatch.chdir(tmp_path)
    data = str(tmp_path / "train_data")
    workdir = str(tmp_path / "run")
    rc = cli_train.main([
        "--data", data, "--synthetic", "2", "--synthetic-shape",
        "32", "32", "32", "--preset", "unit", "--steps", "3",
        "--checkpoint-every", "2", "--workdir", workdir,
    ])
    assert rc == 0

    watch = tmp_path / "incoming"
    watch.mkdir()
    out_dir = str(tmp_path / "served")
    exp = cli_serve.resolve_experiment(
        cli_serve.build_parser().parse_args(
            [str(watch), "--preset", "unit", "--workdir", workdir]
        )
    )
    server = cli_serve.Server(exp, output_dir=out_dir)

    case = "BraTS19_SYN_000_1"
    shutil.copytree(os.path.join(data, case), watch / case)
    server.process_batch([str(watch / case)])
    m1, _ = read_nifti(os.path.join(out_dir, f"{case}_pred.nii.gz"))

    # export DIFFERENT weights (fresh random init) -> newest file wins
    fresh = UNet3D(exp.unet).init(
        jax.random.PRNGKey(99), jnp.zeros((1, 16, 16, 16, 4))
    )
    export_params(os.path.join(workdir, "fine", "params.npz"), fresh)
    assert server.reload_weights() is True

    copy = "BraTS19_SYN_000_2"
    shutil.copytree(os.path.join(data, case), watch / copy)
    # the copied dir's modality files keep the ORIGINAL case prefix, so
    # rename them to match the new dir name
    for f in os.listdir(watch / copy):
        os.rename(
            watch / copy / f, watch / copy / f.replace(case, copy)
        )
    server.process_batch([str(watch / copy)])
    m2, _ = read_nifti(os.path.join(out_dir, f"{copy}_pred.nii.gz"))

    # expected mask under the NEW weights, computed independently
    from brats2019_tpu.infer.predictor import Predictor

    expect, _ = Predictor(exp, fresh).predict_dirs(
        [str(watch / case)],
        output_paths=[str(tmp_path / "expect.nii.gz")],
    ), None
    me, _ = read_nifti(str(tmp_path / "expect.nii.gz"))
    np.testing.assert_array_equal(m2, me)
    assert (m1 != m2).any()  # weights really changed behavior

    # failed reload (missing files) keeps serving on current weights
    shutil.rmtree(os.path.join(workdir, "fine"))
    assert server.reload_weights() is False


def _bare_server(retries=1):
    import threading

    s = object.__new__(cli_serve.Server)
    s.output_dir = None
    s.retries = retries
    s.retry_backoff = 0.0
    s.results = {}
    s.results_cv = threading.Condition()
    s.started_ts = 0.0
    s.counters = {"served": 0, "quarantined": 0}
    return s


def test_classify_failure_by_type_and_status():
    """Classification keys on exception TYPE + canonical status code, not
    free-text substrings (VERDICT round-2 weak #5): a reworded message with
    'INTERNAL' somewhere in a ValueError must NOT look transient, and a
    real XlaRuntimeError carries its status as the message prefix."""
    from jax.errors import JaxRuntimeError

    cf = cli_serve.classify_failure
    assert cf(JaxRuntimeError("RESOURCE_EXHAUSTED: oom")) == "transient"
    assert cf(JaxRuntimeError("UNAVAILABLE: tunnel lost")) == "transient"
    assert cf(JaxRuntimeError("INVALID_ARGUMENT: bad shape")) == "permanent"
    # substring red herrings: type wins
    assert cf(ValueError("file INTERNAL header RESOURCE_EXHAUSTED")) == "permanent"
    assert cf(RuntimeError("INTERNAL: not a jax error")) == "permanent"
    assert cf(ConnectionError("tunnel reset")) == "transient"


def test_transient_device_error_retries_not_quarantines(monkeypatch):
    """A RESOURCE_EXHAUSTED-style hiccup on a healthy case must be retried,
    not quarantined; a persistent error still quarantines."""
    from jax.errors import JaxRuntimeError

    s = _bare_server()
    calls = {"n": 0}

    class FakePredictor:
        def predict_dirs(self, dirs, output_paths=None):
            calls["n"] += 1
            if calls["n"] == 1:
                raise JaxRuntimeError("RESOURCE_EXHAUSTED: tunnel hiccup")
            return ["ok.nii.gz"]

    s.predictor = FakePredictor()
    monkeypatch.setattr(cli_serve.time, "sleep", lambda *_: None)
    out, err = s._predict_one_isolated("/case")
    assert out == "ok.nii.gz" and err is None and calls["n"] == 2

    class AlwaysBad:
        def predict_dirs(self, dirs, output_paths=None):
            raise ValueError("truncated gzip stream")

    s.predictor = AlwaysBad()
    out, err = s._predict_one_isolated("/case")
    assert out is None and "truncated gzip" in err[0]
    assert err[1] == "permanent"


def test_restart_replay_retries_transient_skips_permanent(tmp_path):
    """A case whose last record is a transient failure must be retried by a
    restarted daemon; permanent quarantine and success are replayed as done
    (fake-error injection across both classes, VERDICT round-2 #8)."""
    from jax.errors import JaxRuntimeError

    s = _bare_server(retries=0)
    s.log_dir = str(tmp_path)
    s.log_path = os.path.join(str(tmp_path), "serve_log.jsonl")

    class Flaky:
        def predict_dirs(self, dirs, output_paths=None):
            names = [os.path.basename(d) for d in dirs]
            if any("transient" in n for n in names):
                raise JaxRuntimeError("UNAVAILABLE: device tunnel dropped")
            if any("poison" in n for n in names):
                raise ValueError("corrupt NIfTI")
            return [f"{n}.nii.gz" for n in names]

    s.predictor = Flaky()
    s.done = set()
    s.process_batch([
        str(tmp_path / "case_ok"),
        str(tmp_path / "case_transient"),
        str(tmp_path / "case_poison"),
    ])
    # in-process: served and permanently-quarantined cases are done, but a
    # transient-deferred case stays RETRYABLE by this very daemon (the next
    # scan re-picks it at poll cadence — retrying only after restart would
    # strand a healthy case for the daemon's whole lifetime)
    assert s.done == {"case_ok", "case_poison"}

    log = [json.loads(l) for l in open(s.log_path)]
    by = {r["case"]: r for r in log}
    assert by["case_ok"]["output"] == "case_ok.nii.gz"
    assert by["case_transient"]["error_class"] == "transient"
    assert by["case_poison"]["error_class"] == "permanent"

    # restart replay: transient case comes back, others stay done
    s2 = _bare_server()
    s2.log_dir = s.log_dir
    s2.log_path = s.log_path
    assert s2._load_done() == {"case_ok", "case_poison"}


def test_stale_executable_error_recovers_with_cache_clear(monkeypatch):
    """The pjit layer can bind a call to a stale executable after an
    exception unwinds through a pipelined batch ('Execution supplied N
    buffers but compiled program expected M buffers' on inputs identical
    to a previously-successful call). That is jit-cache damage, not the
    case's fault: it must classify transient and the retry must clear the
    jax caches so the recompile recovers (the quarantine test above is
    the end-to-end repro that caught this)."""
    stale = ValueError(
        "INVALID_ARGUMENT: Execution supplied 21 buffers but compiled "
        "program expected 24 buffers"
    )
    assert cli_serve.classify_failure(stale) == "transient"
    # an ordinary ValueError stays permanent
    assert cli_serve.classify_failure(ValueError("bad nifti")) == "permanent"

    s = _bare_server()
    calls = {"n": 0}
    cleared = {"n": 0}

    class StaleOnce:
        def predict_dirs(self, dirs, output_paths=None):
            calls["n"] += 1
            if calls["n"] == 1:
                raise stale
            return ["ok.nii.gz"]

    import jax

    monkeypatch.setattr(
        jax, "clear_caches", lambda: cleared.__setitem__("n", cleared["n"] + 1)
    )
    monkeypatch.setattr(cli_serve.time, "sleep", lambda *_: None)
    s.predictor = StaleOnce()
    out, err = s._predict_one_isolated("/case")
    assert out == "ok.nii.gz" and err is None
    assert calls["n"] == 2 and cleared["n"] == 1


def test_rss_limit_recycles_between_batches(tmp_path, monkeypatch):
    """--rss-limit-mb: once RSS crosses the watermark the daemon finishes
    its current batch, exits with EXIT_RECYCLE (4), and a restarted daemon
    replays the completion log — the voluntary-recycle contract for the
    leaky-transfer tunnel plugin (PERF.md round-4 soak)."""
    import threading
    import time as _t

    from brats2019_tpu.data.synthetic import write_case

    exp, pf, pc = _multichip_cascade_fixtures()
    monkeypatch.setattr(
        cli_serve, "load_serving_params", lambda e: (e, pf, pc)
    )
    watch = tmp_path / "incoming"
    watch.mkdir()
    write_case(str(watch / "BraTS19_SYN_000_1"), seed=5, shape=(24, 24, 20),
               with_seg=False)
    out_dir = str(tmp_path / "served")
    server = cli_serve.Server(exp, output_dir=out_dir)
    server.rss_limit_mb = 123
    # above the watermark from the start: the first batch must still be
    # SERVED (the check runs between batches, never preempts one)
    monkeypatch.setattr(cli_serve, "_self_rss_mb", lambda: 500.0)
    rc_box = {}
    t = threading.Thread(
        target=lambda: rc_box.update(rc=server.run(str(watch), 0.05, False)),
        daemon=True,
    )
    t.start()
    t.join(timeout=120)
    assert not t.is_alive()
    assert rc_box["rc"] == cli_serve.Server.EXIT_RECYCLE == 4
    assert server.done == {"BraTS19_SYN_000_1"}  # batch completed first
    # restart replays the log: the served case is not re-run
    server2 = cli_serve.Server(exp, output_dir=out_dir)
    assert "BraTS19_SYN_000_1" in server2.done
    # limit off (default 0): same conditions, loop keeps running
    server3 = cli_serve.Server(exp, output_dir=str(tmp_path / "s3"))
    t3 = threading.Thread(
        target=lambda: server3.run(str(watch), 0.05, False), daemon=True
    )
    t3.start()
    _t.sleep(1.0)
    assert t3.is_alive()
    server3.request_stop()
    t3.join(timeout=30)


# ---- --multichip serving (round 4: mesh-decomposed daemon) ----


def _multichip_cascade_fixtures():
    """Tiny cascade exp + params (mirrors tests/test_multichip_cli.py's
    cascade fixtures: s2d-stem fine net so the low-res TTA reduce is in
    play, plain coarse net)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from brats2019_tpu.configs.presets import (
        ExperimentConfig, InferenceConfig, TrainConfig,
    )
    from brats2019_tpu.models import UNet3D, UNetConfig

    fine_cfg = UNetConfig(levels=2, base_features=4, max_features=8,
                          stem_downsample=2, compute_dtype="float32")
    coarse_cfg = UNetConfig(levels=2, base_features=4, max_features=8,
                            compute_dtype="float32")
    exp = ExperimentConfig(
        name="serve_mc",
        unet=fine_cfg,
        coarse_unet=coarse_cfg,
        train=TrainConfig(pool_shape=(32, 32, 32)),
        infer=InferenceConfig(
            canvas=None, tile=(16, 16, 16), cascade=True, tta_flips=True,
            roi_shape=(16, 16, 16), coarse_shape=(16, 16, 16),
            min_component_voxels=0, et_min_voxels=0,
            compute_dtype="float32", tta_precision="float32",
        ),
    )
    x0 = jnp.zeros((1, 16, 16, 16, 4))
    pf = UNet3D(fine_cfg).init(jax.random.PRNGKey(3), x0)
    pc = UNet3D(coarse_cfg).init(jax.random.PRNGKey(4), x0)
    return exp, pf, pc


def test_serve_multichip_cascade_serves_flagship_masks(tmp_path, monkeypatch):
    """serve --multichip cascade must write the FLAGSHIP (single-device
    cascade Predictor) masks — the whole daemon loop (scan -> ready ->
    predict_dirs -> log) running the mesh decomposition."""
    from brats2019_tpu.data.synthetic import write_case
    from brats2019_tpu.infer.predictor import Predictor

    exp, pf, pc = _multichip_cascade_fixtures()
    monkeypatch.setattr(
        cli_serve, "load_serving_params", lambda e: (e, pf, pc)
    )
    watch = tmp_path / "incoming"
    watch.mkdir()
    case = str(watch / "BraTS19_SYN_000_1")
    write_case(case, seed=23, shape=(40, 36, 28), with_seg=False)
    out_dir = str(tmp_path / "served")

    server = cli_serve.Server(exp, output_dir=out_dir, multichip="cascade")
    rc = server.run(str(watch), poll=0.05, once=True)
    assert rc == 0
    out = os.path.join(out_dir, "BraTS19_SYN_000_1_pred.nii.gz")
    got, _ = read_nifti(out, apply_scaling=False)

    from brats2019_tpu.data.case import load_case
    from brats2019_tpu.data.constants import internal_to_disk

    image = load_case(case, load_seg=False).image
    ref, _ = Predictor(exp, pf, pc).predict_arrays(image)
    ref = internal_to_disk(ref)
    assert (np.asarray(got) == ref).mean() > 0.999


def test_serve_multichip_reload_params_zero_rebuild(monkeypatch, tmp_path):
    """SIGHUP contract for the multichip daemon: reload_params swaps
    weights on the SAME compiled programs (predictions change, nothing
    recompiles or errors)."""
    import jax

    from brats2019_tpu.data.synthetic import make_case_arrays
    from brats2019_tpu.infer.multichip import MultichipPredictor
    from brats2019_tpu.models import UNet3D

    exp, pf, pc = _multichip_cascade_fixtures()
    mp = MultichipPredictor(exp, pf, mode="cascade", params_coarse=pc)
    image, _ = make_case_arrays(seed=31, shape=(40, 36, 28))
    before = mp.predict_arrays(image)

    import jax.numpy as jnp

    x0 = jnp.zeros((1, 16, 16, 16, 4))
    pf2 = UNet3D(exp.unet).init(jax.random.PRNGKey(7), x0)
    mp.reload_params(pf2, pc)
    after = mp.predict_arrays(image)
    assert before.shape == after.shape
    assert (before != after).any()  # new weights actually serve
    # cascade reload without coarse params is a hard error
    with pytest.raises(ValueError, match="coarse-stage"):
        mp.reload_params(pf2, None)


def test_serve_multichip_rejects_single_device_combos(tmp_path):
    """--multichip must refuse the single-device-only flags loudly."""
    watch = str(tmp_path)
    for extra in (["--ensemble", "w1"], ["--save-probs"],
                  ["--save-uncertainty"]):
        rc = cli_serve.main(
            [watch, "--preset", "unit", "--multichip", "sweep"] + extra
        )
        assert rc == 2


def test_serve_warmup_precompiles_and_masks_unchanged(tmp_path, monkeypatch):
    """--warmup (Server.warmup): pre-running the serving programs on a
    zeros canvas flips the /healthz-visible warm state and must not
    perturb ANY serving state — a case served by the warmed daemon
    carries exactly the un-warmed Predictor's masks."""
    import jax

    from brats2019_tpu.data.case import load_case
    from brats2019_tpu.data.constants import internal_to_disk
    from brats2019_tpu.data.synthetic import write_case
    from brats2019_tpu.infer.predictor import Predictor

    exp, pf, pc = _multichip_cascade_fixtures()
    monkeypatch.setattr(
        cli_serve, "load_serving_params", lambda e: (e, pf, pc)
    )
    watch = tmp_path / "incoming"
    watch.mkdir()
    case = str(watch / "BraTS19_SYN_000_1")
    write_case(case, seed=11, shape=(40, 36, 28), with_seg=False)
    out_dir = str(tmp_path / "served")

    server = cli_serve.Server(exp, output_dir=out_dir)
    assert server.warm is None  # not requested -> /healthz omits the field
    t = server.warmup()
    assert t > 0 and server.warm is True
    rc = server.run(str(watch), poll=0.05, once=True)
    assert rc == 0

    got, _ = read_nifti(
        os.path.join(out_dir, "BraTS19_SYN_000_1_pred.nii.gz"),
        apply_scaling=False,
    )
    image = load_case(case, load_seg=False).image
    ref, _ = Predictor(exp, pf, pc).predict_arrays(image)
    np.testing.assert_array_equal(np.asarray(got), internal_to_disk(ref))


def test_warmup_ensemble_and_multichip_smoke(tmp_path):
    """EnsemblePredictor/MultichipPredictor warmup: compiles + runs the
    zeros-canvas pass (probs reducers included) and a real prediction
    still works afterwards."""
    import jax

    from brats2019_tpu.data.synthetic import make_case_arrays
    from brats2019_tpu.infer.ensemble import EnsemblePredictor
    from brats2019_tpu.infer.multichip import MultichipPredictor

    exp, pf, pc = _multichip_cascade_fixtures()
    pf2 = jax.tree.map(lambda a: a * 1.01, pf)
    ep = EnsemblePredictor(exp, [(pf, pc), (pf2, pc)])
    assert ep.warmup(probs=True) > 0
    image, _ = make_case_arrays(seed=13, shape=(40, 36, 28))
    labels, _ = ep.predict_arrays(image)
    assert labels.shape == (40, 36, 28)

    mp = MultichipPredictor(exp, pf, mode="cascade", params_coarse=pc)
    assert mp.warmup() > 0
    assert mp.predict_arrays(image).shape == (40, 36, 28)

    # the composed serving mode (--multichip cascade --ensemble) warms too
    mpe = MultichipPredictor(
        exp, pf, mode="cascade", params_coarse=pc,
        members=[(pf, pc), (pf2, pc)],
    )
    assert mpe.warmup() > 0
    assert mpe.predict_arrays(image).shape == (40, 36, 28)

    # pair-mode (--batch-volumes 2) warms the split-stage programs branch
    import dataclasses

    from brats2019_tpu.infer.predictor import Predictor

    exp2 = dataclasses.replace(
        exp, infer=dataclasses.replace(exp.infer, batch_volumes=2)
    )
    p2 = Predictor(exp2, pf, pc)
    assert p2._pair_dispatcher() is not None
    assert p2.warmup(probs=True) > 0


def test_staged_warmup_primary_then_rest(tmp_path):
    """The recycle-tax lever (VERDICT r4 #6): warmup(stage='primary')
    warms only the single-volume label program and flips /healthz warm
    — a queued case is servable from that point — and stage='rest'
    finishes the probs arm without touching the warm flag. Masks after
    the staged warmup match an unstaged predictor's."""
    import jax

    from brats2019_tpu.data.synthetic import make_case_arrays
    from brats2019_tpu.infer.predictor import Predictor

    exp, pf, pc = _multichip_cascade_fixtures()
    p = Predictor(exp, pf, pc)
    t1 = p.warmup(probs=True, stage="primary")
    assert t1 > 0
    t2 = p.warmup(probs=True, stage="rest")
    assert t2 >= 0
    image, _ = make_case_arrays(seed=17, shape=(40, 36, 28))
    got, _ = p.predict_arrays(image)
    ref, _ = Predictor(exp, pf, pc).predict_arrays(image)
    np.testing.assert_array_equal(got, ref)

    # MultichipPredictor API parity: 'rest' is a no-op for the one-program
    # mesh path
    from brats2019_tpu.infer.multichip import MultichipPredictor

    mp = MultichipPredictor(exp, pf, mode="cascade", params_coarse=pc)
    assert mp.warmup(stage="rest") == 0.0


def test_serve_warmup_cli_flag_parses():
    """--warmup is plumbed through the parser (the heavy end-to-end drive
    lives in the test above via Server.warmup directly)."""
    args = cli_serve.build_parser().parse_args(["w", "--warmup"])
    assert args.warmup is True
    assert cli_serve.build_parser().parse_args(["w"]).warmup is False


def _counter_cmd(tmp_path, codes):
    """A stub child whose exit code is scripted by invocation count."""
    import sys as _sys

    counter = tmp_path / "count"
    counter.write_text("0")
    script = (
        "import sys, pathlib\n"
        f"p = pathlib.Path({str(counter)!r})\n"
        "n = int(p.read_text()); p.write_text(str(n + 1))\n"
        f"codes = {list(codes)!r}\n"
        "sys.exit(codes[min(n, len(codes) - 1)])\n"
    )
    return [_sys.executable, "-c", script], counter


def test_supervise_restarts_on_recycle_then_drains(tmp_path):
    """exit 4 (rss watermark recycle) restarts; exit 0 passes through.
    Instant recycles (uptime < 30s, as with a stub child) are paced."""
    cmd, counter = _counter_cmd(tmp_path, [4, 4, 0])
    sleeps = []
    rc = cli_serve.supervise_loop(cmd, max_crash_restarts=0,
                                  _sleep=sleeps.append)
    assert rc == 0
    assert counter.read_text() == "3"
    assert sleeps == [10.0, 10.0]  # fast-recycle pacing, not a hot loop


def test_supervise_gives_up_after_consecutive_crashes(tmp_path):
    cmd, counter = _counter_cmd(tmp_path, [9, 9, 9, 9])
    sleeps = []
    rc = cli_serve.supervise_loop(cmd, max_crash_restarts=2,
                                  _sleep=sleeps.append)
    assert rc == 9
    assert counter.read_text() == "3"  # initial + 2 restarts
    assert sleeps == [1.0, 2.0]  # doubling backoff


def test_supervise_recycle_resets_crash_budget(tmp_path):
    """A healthy daemon recycling for hours must never exhaust the crash
    budget: crash, recycle (resets), crash, crash, then give up."""
    cmd, counter = _counter_cmd(tmp_path, [9, 4, 9, 9, 9])
    rc = cli_serve.supervise_loop(cmd, max_crash_restarts=2,
                                  _sleep=lambda _: None)
    assert rc == 9
    assert counter.read_text() == "5"


def test_supervise_passes_through_deliberate_exits(tmp_path):
    for code in (2, 3):
        cmd, counter = _counter_cmd(tmp_path, [code])
        rc = cli_serve.supervise_loop(cmd, max_crash_restarts=3)
        assert rc == code
        assert counter.read_text() == "1"
        counter.unlink()


def test_strip_supervisor_flags():
    argv = ["watch", "--supervise", "--rss-limit-mb", "900",
            "--max-crash-restarts", "5", "--warmup"]
    assert cli_serve._strip_supervisor_flags(argv) == [
        "watch", "--rss-limit-mb", "900", "--warmup",
    ]
    assert cli_serve._strip_supervisor_flags(
        ["w", "--max-crash-restarts=5"]
    ) == ["w"]


def test_serve_parser_rejects_abbreviations():
    """allow_abbrev=False: an abbreviated --superv would parse as
    --supervise but dodge the name-based strip, making the supervised
    child spawn supervisors recursively — the parser must reject it."""
    with pytest.raises(SystemExit):
        cli_serve.build_parser().parse_args(["w", "--superv"])


@pytest.mark.slow
def test_supervise_serves_across_recycles_end_to_end(tmp_path, local_child_env):
    """The production trio, live: --supervise --rss-limit-mb with a
    watermark below baseline RSS forces a voluntary recycle after every
    batch; the supervisor must restart the child (completion-log replay
    keeps it lossless), a case dropped AFTER a recycle must still be
    served by the restarted child, and a SIGTERM to the supervisor must
    forward to the child (exit 3 passes through)."""
    import signal as _signal
    import threading
    import time as _time

    data = str(tmp_path / "train_data")
    workdir = str(tmp_path / "run")
    rc = cli_train.main([
        "--data", data, "--synthetic", "2", "--synthetic-shape",
        "24", "24", "16", "--preset", "unit", "--steps", "2",
        "--checkpoint-every", "2", "--workdir", workdir,
    ])
    assert rc == 0
    watch = tmp_path / "incoming"
    watch.mkdir()
    shutil.copytree(
        os.path.join(data, "BraTS19_SYN_000_1"), watch / "BraTS19_SYN_000_1"
    )
    out_dir = tmp_path / "served"

    def wait_for_pred(name, timeout=180.0):
        deadline = _time.time() + timeout
        p = out_dir / f"{name}_pred.nii.gz"
        while _time.time() < deadline:
            if p.exists():
                return True
            _time.sleep(0.3)
        return False

    seen = {}

    def driver():
        seen["case1"] = wait_for_pred("BraTS19_SYN_000_1")
        if seen["case1"]:
            # install the second case only after the first recycle window
            src = tmp_path / "stage_case2"
            shutil.copytree(os.path.join(data, "BraTS19_SYN_001_1"), src)
            os.rename(src, watch / "BraTS19_SYN_001_1")
            seen["case2"] = wait_for_pred("BraTS19_SYN_001_1")
        # end the supervised daemon either way: SIGTERM forwards to child
        os.kill(os.getpid(), _signal.SIGTERM)

    t = threading.Thread(target=driver, daemon=True)
    t.start()
    rc = cli_serve.main([
        str(watch), "--preset", "unit", "--workdir", workdir,
        "--output-dir", str(out_dir), "--poll", "0.2",
        "--supervise", "--rss-limit-mb", "1",
    ])
    t.join(30)
    assert seen.get("case1"), "first case never served"
    assert seen.get("case2"), "case dropped after a recycle never served"
    # deterministic clean-stop contract: a forwarded SIGTERM exits 0
    # whatever window it lands in (draining child, import window, or
    # between children)
    assert rc == 0


def test_supervise_stop_during_crash_backoff_is_clean_stop(tmp_path):
    """A SIGTERM that lands while no child is alive (here: during the
    crash backoff) must not be dropped — the loop exits 0 (the
    deterministic clean-stop contract) instead of restarting."""
    import signal as _signal

    cmd, counter = _counter_cmd(tmp_path, [9, 9])

    def sig_during_backoff(_wait):
        os.kill(os.getpid(), _signal.SIGTERM)

    rc = cli_serve.supervise_loop(cmd, max_crash_restarts=5,
                                  _sleep=sig_during_backoff)
    assert rc == 0
    assert counter.read_text() == "1"  # never restarted after the stop


def test_supervise_stop_kills_default_handler_child_as_clean_stop(tmp_path):
    """A SIGTERM while the child still has the DEFAULT handler (e.g. the
    import window, before serve installs its own) kills it with -15; the
    supervisor must report a clean stop (0, same as a drained child),
    not a crash."""
    import signal as _signal
    import sys as _sys
    import threading
    import time as _time

    sentinel = tmp_path / "child_up"
    script = (
        "import time, pathlib\n"
        f"pathlib.Path({str(sentinel)!r}).write_text('up')\n"
        "time.sleep(60)\n"
    )

    def killer():
        deadline = _time.time() + 30
        while not sentinel.exists() and _time.time() < deadline:
            _time.sleep(0.05)
        os.kill(os.getpid(), _signal.SIGTERM)

    t = threading.Thread(target=killer, daemon=True)
    t.start()
    rc = cli_serve.supervise_loop([_sys.executable, "-c", script],
                                  max_crash_restarts=0)
    t.join(10)
    assert rc == 0
