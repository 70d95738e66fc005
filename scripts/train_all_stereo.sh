#!/bin/bash
# BASELINE config 4: all six DyBluRF stereo scenes with per-scene configs.
# Usage: scripts/train_all_stereo.sh [data_root] (default data/stereo)
set -e
ROOT=${1:-data/stereo}
for scene in basketball children sailor seesaw skating street; do
  echo "=== $scene ==="
  python -m mobgs_tpu.cli.train -s "$ROOT/$scene/dense" \
      --configs "configs/stereo/$scene.py" --expname "stereo/$scene"
  python -m mobgs_tpu.cli.eval_cli -m "output/stereo/$scene" \
      -s "$ROOT/$scene/dense" --iteration 10000
  python -m mobgs_tpu.cli.metrics_cli -m "output/stereo/$scene" \
      -s "$ROOT/$scene/dense"
done
