#!/bin/bash
# Launch the pinned image with the reference's mount contract
# (run-docker-pytorch1.1.sh): repo -> /app, run folders -> /data/root,
# datasets -> /data/datasets. TPU VMs expose the chips via /dev/vfio and
# need --privileged (the TPU equivalent of the reference's --gpus flag).
#
# Usage: ./scripts/run_docker_tpu.sh [command...]
#   MUCON_ROOT=...      host dir for run folders   (default ~/work/mucon/root)
#   MUCON_DATASETS=...  host dir for datasets      (default ~/work/mucon/datasets)
set -euo pipefail

ROOT="${MUCON_ROOT:-$HOME/work/mucon/root}"
DATASETS="${MUCON_DATASETS:-$HOME/work/mucon/datasets}"

TPU_FLAGS=()
if [ -e /dev/vfio ]; then
  TPU_FLAGS=(--privileged --device /dev/vfio)
fi

exec docker run -it \
  --ipc=host \
  "${TPU_FLAGS[@]}" \
  --volume="$(pwd)":/app \
  --volume="$ROOT":/data/root \
  --volume="$DATASETS":/data/datasets \
  mucon-tpu \
  "${@:1}"
