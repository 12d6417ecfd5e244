#!/bin/bash
# CPU test runner: blank PALLAS_AXON_POOL_IPS to skip the per-process axon
# TPU registration (2-3 min hang); force the CPU platform with 8 virtual
# devices for sharding tests.
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu
export XLA_FLAGS="--xla_force_host_platform_device_count=8"
if [ $# -eq 0 ]; then
  set -- tests/ -q
fi
exec python -m pytest "$@"
