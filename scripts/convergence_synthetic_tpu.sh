#!/usr/bin/env bash
# Learning-evidence run on real TPU (synthetic data; Breakfast is not on
# disk in this environment).  500 epochs (~2.5k steps) on 40 synthetic
# videos: the paper's mutual-consistency claim holds when the Viterbi
# decode (vit_mof) IMPROVES on the raw s-head (s_mof).
#
# Round-1 evidence (XLA encoder — dropout configs had no kernel then):
#   f32:  y_mof 0.94  s_mof 0.478 vit_mof 0.587
#   bf16: y_mof 0.961 s_mof 0.409 vit_mof 0.444
# This script re-runs the same recipe; with the v3 trainable kernel the
# default config (dropout .25) now takes the Pallas path at B=8 — the
# "train encoder ... fused Pallas v3 stack" routing line in the log is
# the proof the fast path was exercised for the whole trajectory.
#
# Usage:  bash scripts/convergence_synthetic_tpu.sh [exp_name] [extra --set ...]
#   e.g.  bash scripts/convergence_synthetic_tpu.sh conv_bf16 \
#             --set tpu.compute_dtype bfloat16
# Leave the env untouched (axon hook connects the TPU tunnel); run in
# the background — remote compiles + 500 epochs take a while.
set -euo pipefail
cd "$(dirname "$0")/.."

EXP="${1:-conv_v3}"
shift || true

exec python -m mucon_tpu.cli.train_test_mucon \
  --exp-name "$EXP" \
  --set dataset.name synthetic \
  --set dataset.root /tmp/conv/data \
  --set dataset.synthetic.num_videos 40 \
  --set dataset.synthetic.num_classes 12 \
  --set dataset.synthetic.feat_dim 256 \
  --set dataset.synthetic.min_len 600 \
  --set dataset.synthetic.max_len 2000 \
  --set trainer.root /tmp/conv/runs \
  --set trainer.num_epochs 500 \
  --set trainer.eval_every 100 \
  --set trainer.save_every 250 \
  --set tpu.batch_size 8 \
  --set tpu.cache_batches True \
  "$@"
