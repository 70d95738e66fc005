#!/bin/bash
# Copy the judge-relevant artifacts of a protocol run out of the
# gitignored output/ tree into reports/<exp>/ so the curve + metrics
# can be committed (VERDICT r4 items 1-3: the quality proof must live
# in the repo, not on a scratch disk).
#
# Usage: scripts/export_report.sh output/synthetic/protocol5k_r5
set -eu
SRC=${1:?usage: export_report.sh <output/run/dir>}
EXP=$(basename "$SRC")
DST="reports/$EXP"
mkdir -p "$DST"
for f in history.json results.json eval_curve.json cfg_args.json; do
  [ -f "$SRC/$f" ] && cp "$SRC/$f" "$DST/"
done
# train.log is large; keep the eval/metric lines + head/tail context
if [ -f "$SRC/train.log" ]; then
  { head -40 "$SRC/train.log"
    echo "[... trimmed — full log stays in $SRC ...]"
    grep -E "eval|PSNR|psnr|budgets|metrics|watchdog|growth|densif" \
        "$SRC/train.log" | tail -200
    echo "[--- last 30 lines ---]"
    tail -30 "$SRC/train.log"
  } > "$DST/train.log.excerpt"
fi
echo "exported -> $DST"; ls -la "$DST"
