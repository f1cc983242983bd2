#!/usr/bin/env bash
# Ensembling walkthrough (docs/ENSEMBLING.md) on synthetic data: train 2
# fold members -> SWA-average one -> ensemble predict with uncertainty ->
# fold-filtered ensemble evaluation -> offline probability ensembling.
# On a machine without a TPU, prefix with:
#   JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
set -euo pipefail

ROOT=${1:-/tmp/brats2019_tpu_ens_demo}
DATA="$ROOT/data"

echo "== 1. train 2 members on disjoint validation folds =="
python -m brats2019_tpu.cli.train \
    --data "$DATA" --synthetic 6 --synthetic-shape 240 240 155 \
    --preset cascade --steps 500 --workdir "$ROOT/member0" \
    --seed 0 --folds 2 --fold 0 --checkpoint-every 250
python -m brats2019_tpu.cli.train \
    --data "$DATA" --preset cascade --steps 500 --workdir "$ROOT/member1" \
    --seed 1 --folds 2 --fold 1 --checkpoint-every 250

echo "== 2. SWA: export member0 as the average of its last 2 checkpoints =="
python -m brats2019_tpu.cli.export --preset cascade \
    --workdir "$ROOT/member0" --average 2

echo "== 3. ensemble predict one case, with probs + uncertainty maps =="
CASE="$DATA/BraTS19_SYN_000_1"
python -m brats2019_tpu.cli.predict "$CASE" --preset cascade \
    --workdir "$ROOT/member0" --ensemble "$ROOT/member1" \
    --save-probs --save-uncertainty
mv "$CASE/BraTS19_SYN_000_1_probs.npz" "$ROOT/ensemble_probs.npz"

echo "== 4. evaluate the ensemble on member0's validation fold =="
python -m brats2019_tpu.cli.evaluate "$DATA" --preset cascade \
    --workdir "$ROOT/member0" --ensemble "$ROOT/member1" \
    --folds 2 --fold 0 --out "$ROOT/ensemble_fold0.json"

echo "== 5. offline: ensemble saved probability maps (cross-machine) =="
# each member's probs could come from a different host; average the
# member1 map with the in-process ensemble's map, weighted 1:2
python -m brats2019_tpu.cli.predict "$CASE" --preset cascade \
    --workdir "$ROOT/member1" --save-probs \
    --output "$ROOT/member1_pred.nii.gz"
mv "$CASE/BraTS19_SYN_000_1_probs.npz" "$ROOT/member1_probs.npz"
python tools/ensemble_probs.py \
    "$ROOT/member1_probs.npz" "$ROOT/ensemble_probs.npz" \
    --weights 1 2 \
    --like "$CASE/BraTS19_SYN_000_1_flair.nii.gz" \
    --out "$ROOT/offline_pred.nii.gz"

echo "done; fold metrics at $ROOT/ensemble_fold0.json"
