#!/usr/bin/env bash
# Migration from the reference torch repo, end to end (docs/MIGRATION.md):
# bring trained weights over, validate them, fine-tune, export, serve.
set -euo pipefail

REF_CKPT=${REF_CKPT:-/path/to/reference_checkpoint.pt}
DATA=${DATA:-/data/BraTS19}           # case dirs with *_seg for scoring
WORKDIR=${WORKDIR:-runs/migrated}

# 0) inspect both sides if the import errors (naming/topology deltas)
python -m brats2019_tpu.cli.import_torch "$REF_CKPT" \
    --preset reference_parity --list | head -40

# 1) import: structural state-dict mapping -> params export under the
#    workdir; predict/serve load it directly
python -m brats2019_tpu.cli.import_torch "$REF_CKPT" \
    --preset reference_parity --workdir "$WORKDIR"

# 2) validate the imported weights on your data (Dice WT/TC/ET + HD95),
#    or run the one-shot parity harness straight from the torch file:
python -m brats2019_tpu.cli.evaluate "$DATA" \
    --preset reference_parity --workdir "$WORKDIR" --hd95
# python tools/parity_harness.py "$DATA" --preset reference_parity \
#     --torch-checkpoint "$REF_CKPT" --reference-masks /path/to/ref_masks

# 3) (optional) fine-tune the imported weights in this trainer
python -m brats2019_tpu.cli.train --data "$DATA" \
    --preset reference_parity --stage fine --workdir "$WORKDIR" \
    --init-from "$REF_CKPT" --steps 5000

# 4) (optional) distill onto the faster TPU-first s2d flagship
# python -m brats2019_tpu.cli.train --data "$DATA" --preset cascade \
#     --distill-from "$WORKDIR"

# 5) ship: refresh the export (+ a StableHLO deployment artifact) and serve
python -m brats2019_tpu.cli.export --preset reference_parity \
    --workdir "$WORKDIR" --stablehlo
python -m brats2019_tpu.cli.serve /data/incoming \
    --preset reference_parity --workdir "$WORKDIR" \
    --output-dir served/ --http 8080
