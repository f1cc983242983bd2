"""HTTP serving front end (cli/http_api.py + serve --http).

Unit: safe tar extraction, case-name validation, wait_result finality.
End-to-end: a live daemon + HTTP API on the CPU mesh — JSON and tarball
submissions, result/stats/health endpoints, and error taxonomy mapping.
"""

import io
import json
import os
import shutil
import tarfile
import threading
import time
import urllib.error
import urllib.request

import pytest

from brats2019_tpu.cli import http_api
from brats2019_tpu.cli import serve as cli_serve
from brats2019_tpu.cli import train as cli_train


# ---------------------------------------------------------------- unit


def test_safe_case_name():
    assert http_api._safe_case_name("BraTS19_X_1") == "BraTS19_X_1"
    for bad in ("", ".", "..", ".hidden", "a/b", "a\\b", "/abs", "x/../y"):
        with pytest.raises(http_api.HttpApiError):
            http_api._safe_case_name(bad)


def _tar_bytes(members, mode="w:gz"):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode=mode) as tf:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def test_extract_case_tar_flattens_and_blocks_traversal(tmp_path):
    dest = str(tmp_path / "case")
    data = _tar_bytes([
        ("sub/dir/a_t1.nii.gz", b"AAA"),
        ("../evil.nii.gz", b"EVIL"),  # flattened to basename, NOT ../
        ("b_t2.nii.gz", b"BBB"),
    ])
    n = http_api.extract_case_tar(data, dest)
    assert n == 3
    assert sorted(os.listdir(dest)) == [
        "a_t1.nii.gz", "b_t2.nii.gz", "evil.nii.gz"
    ]
    assert not os.path.exists(tmp_path / ".." / "evil.nii.gz" / "")
    assert open(os.path.join(dest, "a_t1.nii.gz"), "rb").read() == b"AAA"


def test_extract_case_tar_rejects_garbage_and_empty(tmp_path):
    with pytest.raises(http_api.HttpApiError, match="unreadable"):
        http_api.extract_case_tar(b"not a tar", str(tmp_path / "x"))
    with pytest.raises(http_api.HttpApiError, match="no files"):
        http_api.extract_case_tar(_tar_bytes([]), str(tmp_path / "y"))
    # a symlink member is silently skipped (never extracted)
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        info = tarfile.TarInfo("link.nii.gz")
        info.type = tarfile.SYMTYPE
        info.linkname = "/etc/passwd"
        tf.addfile(info)
        data = b"ok"
        reg = tarfile.TarInfo("real.nii.gz")
        reg.size = len(data)
        tf.addfile(reg, io.BytesIO(data))
    n = http_api.extract_case_tar(buf.getvalue(), str(tmp_path / "z"))
    assert n == 1
    assert os.listdir(tmp_path / "z") == ["real.nii.gz"]


def test_failed_extraction_cleans_up_and_reupload_succeeds(tmp_path):
    """A partially-extracted archive must not leave a dir behind (it would
    make the idempotence check wedge every corrected re-upload)."""
    dest = str(tmp_path / "case")
    bad = _tar_bytes([
        ("a_t1.nii.gz", b"AAA"),
        (".hidden", b"BAD"),  # unusable name AFTER a file was written
    ])
    with pytest.raises(http_api.HttpApiError):
        http_api.extract_case_tar(bad, dest)
    assert not os.path.exists(dest)
    good = _tar_bytes([("a_t1.nii.gz", b"AAA")])
    assert http_api.extract_case_tar(good, dest) == 1


def test_extraction_bomb_cap(tmp_path, monkeypatch):
    """Total EXTRACTED bytes are bounded (compressed-size cap alone would
    let a small gzipped bomb fill the watch-root disk)."""
    monkeypatch.setattr(http_api, "MAX_EXTRACT_BYTES", 4096)
    bomb = _tar_bytes([("big_t1.nii.gz", b"\x00" * 100_000)])
    dest = str(tmp_path / "case")
    with pytest.raises(http_api.HttpApiError) as ei:
        http_api.extract_case_tar(bomb, dest)
    assert ei.value.code == 413
    assert not os.path.exists(dest)


def test_bearer_token_gate(tmp_path):
    """--http-token: every endpoint except /healthz requires the bearer
    header; wrong/missing tokens get 401."""
    s = object.__new__(cli_serve.Server)
    s.results = {}
    s.results_cv = threading.Condition()
    s.counters = {"served": 0, "quarantined": 0}
    s.started_ts = time.time()
    s.done = set()
    s._stop = False
    httpd = http_api.start_http(s, str(tmp_path), 0, token="s3cret")
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        st, _ = _get(f"{base}/healthz")  # open for probes
        assert st == 200
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(f"{base}/stats")
        assert ei.value.code == 401
        req = urllib.request.Request(
            f"{base}/stats", headers={"Authorization": "Bearer s3cret"}
        )
        with urllib.request.urlopen(req, timeout=10) as r:
            assert r.status == 200
        req = urllib.request.Request(
            f"{base}/predict?name=x", data=b"zz",
            headers={"Content-Type": "application/x-tar",
                     "Authorization": "Bearer wrong"},
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=10)
        assert ei.value.code == 401
    finally:
        httpd.shutdown()


def test_wait_result_finality():
    """Transient records are NOT final (the daemon retries); success and
    permanent quarantine are."""
    s = object.__new__(cli_serve.Server)
    s.results = {}
    s.results_cv = threading.Condition()
    s.counters = {"served": 0, "quarantined": 0}
    s._stop = False

    assert s.wait_result("x", 0.0) is None
    s._publish([{"case": "x", "error": "hiccup", "error_class": "transient"}])
    rec = s.wait_result("x", 0.05)  # times out -> latest (transient) record
    assert rec["error_class"] == "transient"

    def later():
        time.sleep(0.1)
        s._publish([{"case": "x", "output": "x.nii.gz", "error": None}])

    t = threading.Thread(target=later)
    t.start()
    rec = s.wait_result("x", 10.0)  # wakes on the FINAL record
    t.join()
    assert rec["error"] is None and rec["output"] == "x.nii.gz"

    s._publish([{"case": "y", "error": "bad", "error_class": "permanent"}])
    assert s.wait_result("y", 10.0)["error_class"] == "permanent"


def test_metrics_counters_are_monotonic():
    """A served case later resubmitted-and-failed must not DECREASE the
    served counter (Prometheus counter semantics)."""
    s = object.__new__(cli_serve.Server)
    s.results = {}
    s.results_cv = threading.Condition()
    s.counters = {"served": 0, "quarantined": 0}
    s.done = set()
    s._stop = False
    s._publish([{"case": "x", "output": "x.nii.gz", "error": None,
                 "batch_wall_s": 1.0, "batch_size": 1}])
    assert http_api._stats_dict(s)["served"] == 1
    s._publish([{"case": "x", "error": "boom", "error_class": "permanent"}])
    st = http_api._stats_dict(s)
    assert st["served"] == 1 and st["quarantined"] == 1


def test_non_ascii_authorization_is_401_not_dropped(tmp_path):
    s = object.__new__(cli_serve.Server)
    s.results = {}
    s.results_cv = threading.Condition()
    s.counters = {"served": 0, "quarantined": 0}
    s.started_ts = time.time()
    s.done = set()
    s._stop = False
    httpd = http_api.start_http(s, str(tmp_path), 0, token="tok")
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        req = urllib.request.Request(
            f"{base}/stats", headers={"Authorization": "Bearer s\xe9"}
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=10)
        assert ei.value.code == 401  # a clean 401, not a reset socket
    finally:
        httpd.shutdown()


def test_keepalive_connection_reuse_and_error_close(tmp_path):
    """HTTP/1.1 contract: consecutive 200s ride ONE connection (correct
    Content-Length framing), and an error response closes it (unread
    bodies must never poison the next request on the socket)."""
    import http.client

    s = object.__new__(cli_serve.Server)
    s.results = {}
    s.results_cv = threading.Condition()
    s.counters = {"served": 0, "quarantined": 0}
    s.started_ts = time.time()
    s.done = set()
    s._stop = False
    httpd = http_api.start_http(s, str(tmp_path), 0)
    try:
        conn = http.client.HTTPConnection(
            "127.0.0.1", httpd.server_address[1], timeout=10
        )
        for _ in range(3):  # same socket, three requests
            conn.request("GET", "/healthz")
            r = conn.getresponse()
            assert r.status == 200
            r.read()
            assert r.headers.get("Connection") != "close"
        # an error response instructs close and the server honors it
        conn.request("GET", "/result?case=NOPE")
        r = conn.getresponse()
        assert r.status == 404
        assert r.headers.get("Connection") == "close"
        r.read()
        conn.close()
    finally:
        httpd.shutdown()


def test_latency_summary():
    recs = [
        {"error": None, "batch_wall_s": 2.0, "batch_size": 2},
        {"error": None, "batch_wall_s": 3.0, "batch_size": 1},
        {"error": "x", "batch_wall_s": 9.0, "batch_size": 1},
    ]
    s = http_api._latency_summary(recs)
    assert s["n"] == 2 and s["p50_s"] == 1.0 and s["p95_s"] == 3.0
    assert http_api._latency_summary([]) == {}


# ---------------------------------------------------------- end-to-end


def _get(url, timeout=30):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.status, r.read()


def _post(url, data, ctype, timeout=300):
    req = urllib.request.Request(
        url, data=data, headers={"Content-Type": ctype}, method="POST"
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, r.read()


def _case_tarball(case_dir):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        for p in sorted(os.listdir(case_dir)):
            # nested path on purpose: extraction must flatten it
            tf.add(os.path.join(case_dir, p), arcname=f"upload/{p}")
    return buf.getvalue()


@pytest.mark.slow
def test_http_serving_end_to_end(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    data = str(tmp_path / "train_data")
    workdir = str(tmp_path / "run")
    rc = cli_train.main([
        "--data", data, "--synthetic", "3", "--synthetic-shape",
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
    loop = threading.Thread(
        target=server.run, args=(str(watch), 0.05, False), daemon=True
    )
    loop.start()
    httpd = http_api.start_http(server, str(watch), 0)
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        # health before any work
        st, body = _get(f"{base}/healthz")
        hb = json.loads(body)
        assert st == 200 and hb["status"] == "ok" and hb["done"] == 0

        # 1) co-located JSON submission (case dir OUTSIDE the watch root,
        #    symlinked in) -> prediction NIfTI bytes stream back
        case1 = os.path.join(data, "BraTS19_SYN_000_1")
        st, body = _post(
            f"{base}/predict?timeout=240",
            json.dumps({"case_dir": case1}).encode(),
            "application/json",
        )
        assert st == 200
        body_pred = body
        from brats2019_tpu.utils.nifti import read_nifti

        tmp_pred = tmp_path / "got_pred.nii.gz"
        tmp_pred.write_bytes(body)
        vol, _ = read_nifti(str(tmp_pred))
        assert vol.shape == (32, 32, 32)
        assert set(__import__("numpy").unique(vol).tolist()) <= {0, 1, 2, 4}

        # 2) tarball upload (renother case) -> completion record as JSON
        case2 = os.path.join(data, "BraTS19_SYN_001_1")
        st, body = _post(
            f"{base}/predict?name=BraTS19_SYN_001_1&timeout=240&format=json",
            _case_tarball(case2),
            "application/x-tar",
        )
        rec = json.loads(body)
        assert st == 200 and rec.get("error") is None
        assert os.path.exists(rec["output"])

        # idempotence: resubmitting a done case returns its record at once
        st, body = _post(
            f"{base}/predict?name=BraTS19_SYN_001_1&timeout=30&format=json",
            _case_tarball(case2),
            "application/x-tar",
        )
        assert st == 200 and json.loads(body)["case"] == "BraTS19_SYN_001_1"

        # 3) result + stats reflect both cases
        st, body = _get(f"{base}/result?case=BraTS19_SYN_000_1")
        assert st == 200 and json.loads(body).get("error") is None
        st, body = _get(f"{base}/stats")
        stats = json.loads(body)
        assert st == 200 and stats["served"] == 2
        assert stats["quarantined"] == 0
        assert stats["latency"]["n"] == 2
        # Prometheus exposition mirrors the same counters
        st, body = _get(f"{base}/metrics")
        text = body.decode()
        assert st == 200 and "brats_served_total 2" in text
        assert 'brats_case_latency_seconds{quantile="0.5"}' in text

        # 3b) artifact retrieval: the served prediction is fetchable;
        # absent QA artifacts 404; unknown kinds 400
        st, abody = _get(f"{base}/artifact?case=BraTS19_SYN_000_1&kind=pred")
        assert st == 200 and abody == body_pred
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(f"{base}/artifact?case=BraTS19_SYN_000_1&kind=probs")
        assert ei.value.code == 404
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(f"{base}/artifact?case=BraTS19_SYN_000_1&kind=bogus")
        assert ei.value.code == 400

        # 4) error taxonomy over HTTP
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(f"{base}/result?case=NEVER_SEEN")
        assert ei.value.code == 404
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(f"{base}/predict?name=bad",
                  b"this is not a tar", "application/x-tar")
        assert ei.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(f"{base}/predict",
                  json.dumps({"case_dir": "/nonexistent"}).encode(),
                  "application/json")
        assert ei.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(f"{base}/nope")
        assert ei.value.code == 404

        # 4b) malformed numeric params are a 400, not a dropped connection
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(f"{base}/result?case=BraTS19_SYN_000_1&timeout=abc")
        assert ei.value.code == 400
        # 4c) an archive whose files do not form a case for `name` is
        # rejected immediately (not a hang-until-504) and leaves no dir
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(f"{base}/predict?name=WRONGNAME&timeout=60",
                  _case_tarball(case2), "application/x-tar")
        assert ei.value.code == 400
        assert not os.path.exists(watch / "WRONGNAME")
        # 4d) a case done in a PREVIOUS daemon run (restart replay, no
        # in-process record) answers immediately instead of timing out
        server.done.add("OLDCASE")
        st, body = _post(f"{base}/predict?name=OLDCASE&timeout=60",
                         _case_tarball(case2), "application/x-tar")
        assert st == 200 and json.loads(body)["done"] is True

        # 4e) CONCURRENT submissions: three clients at once, all served
        # (the daemon batches what the scans pick up; each waiter gets
        # its own case's record)
        results = {}

        def submit(i):
            src = os.path.join(data, "BraTS19_SYN_002_1")
            name = f"CONC_{i}_1"
            buf = io.BytesIO()
            with tarfile.open(fileobj=buf, mode="w:gz") as tf:
                for p in sorted(os.listdir(src)):
                    tf.add(os.path.join(src, p),
                           arcname=p.replace("BraTS19_SYN_002_1", name))
            try:
                st_i, b = _post(
                    f"{base}/predict?name={name}&timeout=240&format=json",
                    buf.getvalue(), "application/x-tar",
                )
                results[name] = (st_i, json.loads(b))
            except Exception as e:  # surface in the main thread
                results[name] = ("err", repr(e))

        threads = [threading.Thread(target=submit, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert len(results) == 3
        for name, (st_i, rec) in results.items():
            assert st_i == 200, (name, rec)
            assert rec["case"] == name and rec.get("error") is None

        # 4f) POST /reload queues the SIGHUP-equivalent weight hot-reload
        st, body = _post(f"{base}/reload", b"", "application/json")
        assert st == 202 and json.loads(body)["reload"] == "queued"
        deadline = time.time() + 30
        while time.time() < deadline and server._reload:
            time.sleep(0.1)
        assert not server._reload  # the daemon loop consumed it

        # 5) a corrupt upload is quarantined -> 422 with the error class
        bad = _tar_bytes([
            ("CORRUPT_1_t1.nii.gz", b"junk"), ("CORRUPT_1_t1ce.nii.gz", b"junk"),
            ("CORRUPT_1_t2.nii.gz", b"junk"), ("CORRUPT_1_flair.nii.gz", b"junk"),
        ])
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(f"{base}/predict?name=CORRUPT_1&timeout=240",
                  bad, "application/x-tar")
        assert ei.value.code == 422
        assert "permanent" in json.loads(ei.value.read())["error"]
    finally:
        server.request_stop()
        httpd.shutdown()
        loop.join(timeout=60)
    assert not loop.is_alive()
