#!/bin/bash
# Serving-wire ladder on real TPU (VERDICT r4 #3): export + serve the
# flagship-shaped artifact at each feature wire and record end-to-end
# ms/video.  The f32 export measured 571 ms/video end-to-end, 99.7% of
# it feature wire over the ~30 MB/s tunnel (docs/EVAL_PROFILE.md) — the
# lossy wires are THE lever.  Each serve runs in a FRESH process (the
# serving contract).  Results append to /tmp/export_wire_ladder.jsonl.
#
# Usage: PYTHONPATH=/root/repo:/root/.axon_site bash scripts/run_export_wire_ladder_tpu.sh
set -u
OUT_LOG=${OUT_LOG:-/tmp/export_wire_ladder.jsonl}
VIDEOS=${VIDEOS:-32}
ROUNDS=${ROUNDS:-4}
for wire in float32 bfloat16 float16 int8; do
  art=/tmp/export_probe_${wire}
  echo "=== export $wire ===" >&2
  timeout 1800 python scripts/probe_export_tpu.py export \
    --batch 16 --pad 2048 --out "$art" --feats-wire "$wire" \
    | tee -a "$OUT_LOG"
  echo "=== serve $wire ===" >&2
  timeout 1800 python scripts/probe_export_tpu.py serve \
    --out "$art" --videos "$VIDEOS" --rounds "$ROUNDS" \
    | tee -a "$OUT_LOG"
done
echo "ladder done -> $OUT_LOG" >&2
