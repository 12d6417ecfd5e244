#!/bin/bash
# TPU launcher (the L8 equivalent of the reference's docker run script):
# keeps the axon TPU env intact and forwards everything to the CLI.
# Usage: ./scripts/run_tpu.sh train_test_mucon --set dataset.split 1 ...
ENTRY=${1:-train_test_mucon}
shift || true
exec python -m "mucon_tpu.cli.${ENTRY}" "$@"
