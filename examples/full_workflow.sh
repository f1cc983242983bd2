#!/usr/bin/env bash
# End-to-end walkthrough of the brats2019_tpu framework on synthetic data
# (no real BraTS data needed). Runs the five judged configurations'
# capability surface: train (cascade, both stages) -> export -> predict ->
# evaluate. On a machine without a TPU, prefix with:
#   JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
set -euo pipefail

ROOT=${1:-/tmp/brats2019_tpu_demo}
DATA="$ROOT/data"
RUN="$ROOT/run"

echo "== 1. generate synthetic BraTS-shaped cases + train the cascade =="
python -m brats2019_tpu.cli.train \
    --data "$DATA" --synthetic 6 --synthetic-shape 240 240 155 \
    --preset cascade --steps 1000 --workdir "$RUN" \
    --eval-every 500 --checkpoint-every 500

echo "== 2. export inference-only params =="
python -m brats2019_tpu.cli.export --preset cascade --workdir "$RUN"

echo "== 3. predict every case (pipelined sliding-window + 8-flip TTA) =="
python -m brats2019_tpu.cli.predict "$DATA" --preset cascade --workdir "$RUN"

echo "== 4. score predictions (Dice WT/TC/ET) =="
python -m brats2019_tpu.cli.evaluate "$DATA" --preset cascade \
    --workdir "$RUN" --use-existing --out "$ROOT/metrics.json"

echo "== 5. serve: drain a watch directory once (daemon mode: drop --once) =="
mkdir -p "$ROOT/incoming" "$ROOT/served"
cp -r "$DATA"/BraTS19_SYN_000_1 "$ROOT/incoming/"
python -m brats2019_tpu.cli.serve "$ROOT/incoming" --preset cascade \
    --workdir "$RUN" --output-dir "$ROOT/served" --once

echo "done; metrics at $ROOT/metrics.json; served at $ROOT/served"
