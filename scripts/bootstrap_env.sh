#!/bin/bash
# Reproducible-environment bootstrap — the TPU-native equivalent of the
# reference's docker story (run-docker-pytorch1.1.sh + docker/pytorch1.1/
# Dockerfile: a pinned CUDA-10.0/pytorch-1.1 image with the repo and the
# dataset bind-mounted).  There is no container runtime in this
# environment, so the contract is expressed as (a) a pinned dependency set
# ([project.optional-dependencies].locked in pyproject.toml, the versions
# this framework is validated against) and (b) this one-shot script that
# creates a venv, installs the package against those pins, builds the
# native C++ helpers, and smoke-tests the install.
#
# Usage:
#   ./scripts/bootstrap_env.sh [venv_dir]          # CPU (default)
#   TPU=1 ./scripts/bootstrap_env.sh [venv_dir]    # + libtpu for real chips
#
# Dataset layout is the same contract as the reference (README.md §data):
# point dataset.root at a folder holding features/ labels/ transcripts/
# split*.{train,test} mapping.txt.
set -euo pipefail

VENV="${1:-.venv}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"

python3 -m venv "$VENV"
# shellcheck disable=SC1091
source "$VENV/bin/activate"
python -m pip install -U pip

if [ "${TPU:-0}" = "1" ]; then
  python -m pip install "$REPO[locked]" "jax[tpu]==0.9.0" \
    -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
else
  python -m pip install "$REPO[locked]"
fi

# native C++ fast paths (collate pad-copy, F1/edit metrics) — built lazily
# on first use too; doing it here fails fast if the g++ toolchain is absent
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -c "
import mucon_tpu.native as n
print('native C++ helpers:', 'built' if n.available() else 'UNAVAILABLE (pure-python fallbacks active)')
"

# install smoke: config tree + model construction + one tiny jitted step
cd "$REPO" && PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -c "
import sys; sys.path.insert(0, '.')
import __graft_entry__ as g
fn, args = g.entry()
fn(*args)
print('bootstrap smoke: forward step OK')
"
echo "environment ready: source $VENV/bin/activate"
