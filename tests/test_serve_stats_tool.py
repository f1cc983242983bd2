"""Serve-log summarizer (tools/serve_stats.py): throughput/latency/error
aggregation over serve_log.jsonl, including transient-retry semantics."""

import json
import os
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)
import serve_stats  # noqa: E402


def _write_log(path, records):
    with open(path, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
        f.write("{truncated-not-json\n")


def test_summarize_log(tmp_path):
    log = str(tmp_path / "serve_log.jsonl")
    _write_log(log, [
        {"case": "A", "output": "a", "batch_size": 2, "batch_wall_s": 4.0,
         "ts": 100.0},
        {"case": "B", "output": "b", "batch_size": 2, "batch_wall_s": 4.0,
         "ts": 100.0},
        # C fails transiently, then is served on a later scan
        {"case": "C", "output": None, "batch_size": 1, "batch_wall_s": 1.0,
         "ts": 101.0, "error": "UNAVAILABLE: hiccup",
         "error_class": "transient"},
        {"case": "C", "output": "c", "batch_size": 1, "batch_wall_s": 3.0,
         "ts": 105.0},
        # D is permanently quarantined
        {"case": "D", "output": None, "batch_size": 1, "batch_wall_s": 0.5,
         "ts": 106.0, "error": "ValueError: bad nifti",
         "error_class": "permanent"},
    ])
    s = serve_stats.summarize_log(log)
    assert s["served"] == 3 and s["failed"] == 1
    assert s["failed_by_class"] == {"permanent": 1}
    assert s["malformed_lines"] == 1
    assert s["wall_span_s"] == 6.0
    assert s["served_per_sec"] == 0.5
    # per-case seconds: A,B -> 2.0 each, C (successful serve) -> 3.0
    assert s["per_case_s"]["p50"] == 2.0
    assert s["per_case_s"]["max"] == 3.0


def test_main_accepts_dir_and_missing(tmp_path, capsys):
    assert serve_stats.main([str(tmp_path)]) == 2
    log = str(tmp_path / "serve_log.jsonl")
    _write_log(log, [
        {"case": "A", "output": "a", "batch_size": 1, "batch_wall_s": 1.0,
         "ts": 1.0},
    ])
    assert serve_stats.main([str(tmp_path), "--json"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["served"] == 1
