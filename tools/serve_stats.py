"""Summarize a serving daemon's completion log (cli/serve.py writes
``serve_log.jsonl``): throughput, latency percentiles, error taxonomy.

Usage:
    python tools/serve_stats.py <output-dir-or-log-path> [--json]

Plain-stdlib on purpose — this runs on monitoring boxes, not TPU hosts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _percentile(sorted_vals, q: float):
    """Nearest-rank percentile on an ascending list (None when empty)."""
    if not sorted_vals:
        return None
    i = min(len(sorted_vals) - 1, max(0, int(round(q * (len(sorted_vals) - 1)))))
    return sorted_vals[i]


def summarize_log(path: str) -> dict:
    """Aggregate one serve_log.jsonl into a stats dict. Malformed lines
    are counted, not fatal (the daemon appends; a crash can truncate the
    final line). A case re-served after a transient failure counts once
    as served; per-case latency uses batch_wall_s / batch_size (the
    pipelined batch amortizes decode/write across its cases)."""
    served, errors, malformed = {}, {}, 0
    per_case_s, ts = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
                name = rec["case"]
            except (ValueError, KeyError):
                malformed += 1
                continue
            ts.append(rec.get("ts"))
            if rec.get("error") is not None:
                errors[name] = rec.get("error_class", "permanent")
                continue
            errors.pop(name, None)  # later success clears the failure
            served[name] = rec
            bs = max(int(rec.get("batch_size", 1)), 1)
            if rec.get("batch_wall_s") is not None:
                per_case_s.append(float(rec["batch_wall_s"]) / bs)
    per_case_s.sort()
    ts = [t for t in ts if t is not None]
    span = (max(ts) - min(ts)) if len(ts) > 1 else 0.0
    err_classes: dict = {}
    for c in errors.values():
        err_classes[c] = err_classes.get(c, 0) + 1
    return {
        "served": len(served),
        "failed": len(errors),
        "failed_by_class": err_classes,
        "malformed_lines": malformed,
        "wall_span_s": round(span, 3),
        "served_per_sec": (
            round(len(served) / span, 4) if span > 0 else None
        ),
        "per_case_s": {
            "p50": _percentile(per_case_s, 0.50),
            "p90": _percentile(per_case_s, 0.90),
            "p99": _percentile(per_case_s, 0.99),
            "max": per_case_s[-1] if per_case_s else None,
        },
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("path", help="serve output dir or serve_log.jsonl path")
    ap.add_argument("--json", action="store_true",
                    help="print the raw JSON only")
    args = ap.parse_args(argv)
    path = args.path
    if os.path.isdir(path):
        path = os.path.join(path, "serve_log.jsonl")
    if not os.path.exists(path):
        print(f"error: no serve log at {path}", file=sys.stderr)
        return 2
    stats = summarize_log(path)
    if args.json:
        print(json.dumps(stats))
        return 0
    print(f"served {stats['served']} case(s), {stats['failed']} failed "
          f"{stats['failed_by_class']}, {stats['malformed_lines']} "
          f"malformed line(s)")
    if stats["served_per_sec"] is not None:
        print(f"throughput {stats['served_per_sec']} cases/s over "
              f"{stats['wall_span_s']}s")
    pc = stats["per_case_s"]
    if pc["p50"] is not None:
        print(f"per-case seconds: p50={pc['p50']:.3f} p90={pc['p90']:.3f} "
              f"p99={pc['p99']:.3f} max={pc['max']:.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
