#!/usr/bin/env bash
# HTTP serving workflow (docs/SERVING.md "HTTP API"): start the daemon
# with a network front end, submit cases both ways, watch it.
set -euo pipefail

WATCH=${WATCH:-/tmp/brats_incoming}
OUT=${OUT:-/tmp/brats_served}
PORT=${PORT:-8080}
mkdir -p "$WATCH" "$OUT"

# 1) daemon + HTTP API (params stay committed on device across requests)
python -m brats2019_tpu.cli.serve "$WATCH" --preset cascade \
    --output-dir "$OUT" --http "$PORT" &
SERVE_PID=$!
trap 'kill $SERVE_PID 2>/dev/null || true' EXIT
sleep 5

BASE="http://127.0.0.1:$PORT"

# 2) liveness + metrics (Prometheus scrape target)
curl -s "$BASE/healthz"
curl -s "$BASE/metrics" | head -6

# 3) submit a case as a tarball (client on another machine):
#    tar members are the 4 modality NIfTIs named <CASE>_<mod>.nii.gz
CASE=BraTS19_EXAMPLE_1
# tar czf - -C /path/to/$CASE . | curl -s --data-binary @- \
#     -H 'Content-Type: application/x-tar' \
#     -o ${CASE}_pred.nii.gz "$BASE/predict?name=$CASE&timeout=600"

# 4) co-located submission (path visible to the daemon): returns the
#    completion record instead of the bytes with format=json
# curl -s -H 'Content-Type: application/json' \
#     -d '{"case_dir": "/data/'$CASE'"}' \
#     "$BASE/predict?format=json&timeout=600"

# 5) poll a result / inspect throughput
# curl -s "$BASE/result?case=$CASE"
curl -s "$BASE/stats"

kill $SERVE_PID
wait $SERVE_PID 2>/dev/null || true
