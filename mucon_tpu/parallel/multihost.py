"""Multi-host (multi-process) scale-out: DCN x ICI hybrid meshes.

New capability vs the reference (single GPU, zero `torch.distributed`
hits — SURVEY.md §2.12 "Communication backend" row): this module extends
`parallel/mesh.py`'s single-process mesh to `jax.distributed` multi-process
runs, i.e. multiple v5e hosts / pod slices.

Design (scaling-book recipe — collectives must ride the right fabric):

* The **data** axis spans processes: gradient `pmean` fires ONCE per step,
  so it is the only collective that may ride DCN (the slow inter-slice
  fabric) without hurting step time.
* The **seq** and **model** axes stay inside a process's slice: the
  dilated-conv halo exchanges fire per *layer* and the tensor-parallel
  boundary collectives per *matmul* — those must stay on ICI.

`create_hybrid_device_mesh` encodes exactly this: the DCN mesh shape puts
every process on "data"; the per-slice ICI mesh carries the within-process
data/seq/model grid.

Single-process behavior is IDENTICAL to `parallel/mesh.py` (delegates to
`make_mesh` / `device_put`-based sharding; tests pin bit-equality), so the
whole trainer stack — `make_sharded_train_step`, the fused-eval shard_map
dispatch, checkpoint round-trips — runs unchanged on a multihost mesh.

What each process does differently at scale (the integration recipe, also
in docs/ARCHITECTURE.md):

1. `init_distributed()` before any jax call (reads the standard
   JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env,
   explicit args win);
2. build the mesh with `make_multihost_mesh(...)`;
3. the loader yields each process ITS OWN videos:
   `process_batch_slice(global_batch, mesh)` says which rows;
4. assemble global device arrays with
   `shard_batch_arrays_multihost(mesh, local_arrays)` — a drop-in for
   `shard_batch_arrays` built on `jax.make_array_from_process_local_data`;
5. gate run-folder writes (checkpoints, logs, metric series) on
   `is_coordinator()`; metrics from the jitted step are already
   fully-replicated scalars, identical on every process.

Evaluation at multihost scale: each process evaluates ITS slice of the
test split (the d2h wire only carries a process's addressable shards)
and the segmentation metrics are running counts / per-video sums, so
merging is plain addition on the coordinator; alternatively run the
full evaluator on the coordinator only — at the measured fused-eval
rates one chip evaluates a Breakfast split in seconds.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding

from mucon_tpu.parallel.mesh import batch_specs, make_mesh

logger = logging.getLogger("mucon_tpu.multihost")


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> tuple[int, int]:
    """Initialize jax.distributed when a multi-process run is configured;
    no-op (returns (0, 1)) otherwise.

    A run is multi-process when `coordinator_address` is given explicitly
    or the standard JAX env (JAX_COORDINATOR_ADDRESS + JAX_NUM_PROCESSES +
    JAX_PROCESS_ID) is set — the same contract `jax.distributed.initialize`
    auto-detects on Cloud TPU pods, made explicit so single-host runs never
    touch the distributed runtime.  Returns (process_index, process_count).
    """
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr is None and num_processes is None:
        return jax.process_index(), jax.process_count()
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "jax.distributed initialized: process %d / %d, %d local devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
    )
    return jax.process_index(), jax.process_count()


def is_coordinator() -> bool:
    """True on the process that owns run-folder writes (checkpoints, logs,
    metric series).  Process 0 by convention."""
    return jax.process_index() == 0


def make_multihost_mesh(
    n_data: int = -1, n_seq: int = 1, n_model: int = 1
) -> Mesh:
    """("data", "seq", "model") mesh over ALL processes' devices.

    Single process: exactly `make_mesh` (same device order — tests pin
    equality).  Multi-process: a hybrid DCN x ICI mesh where the process
    dimension lies entirely on "data" (see module docstring), so seq halos
    and model-parallel collectives never cross DCN.  Requires n_data to be
    a multiple of process_count and seq*model to fit inside one process's
    local device count.
    """
    n_proc = jax.process_count()
    if n_proc == 1:
        return make_mesh(n_data, n_seq, n_model)

    from jax.experimental import mesh_utils

    n_local = jax.local_device_count()
    n_total = n_proc * n_local
    if n_data == -1:
        assert n_total % (n_seq * n_model) == 0, (n_total, n_seq, n_model)
        n_data = n_total // (n_seq * n_model)
    assert n_data % n_proc == 0, (
        f"data axis ({n_data}) must be a multiple of process_count "
        f"({n_proc}): the DCN dimension lies on 'data'"
    )
    assert (n_data // n_proc) * n_seq * n_model == n_local, (
        n_data, n_seq, n_model, n_proc, n_local,
    )
    # Granule choice: `create_hybrid_device_mesh` defaults to slice_index
    # granules, which only exist on multi-slice TPU pods (one process per
    # slice).  Multi-host runs WITHIN one slice — and the multi-process CPU
    # backend used to test this path without hardware — have a single (or
    # no) slice_index, so fall back to process granules there; the layout
    # contract is the same either way: each process's devices form one
    # contiguous block of the "data" axis (process_batch_slice relies on
    # this for addressable-shard assembly).
    slice_ids = {getattr(d, "slice_index", None) for d in jax.devices()}
    by_process = None in slice_ids or len(slice_ids) != n_proc
    grid = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(n_data // n_proc, n_seq, n_model),
        dcn_mesh_shape=(n_proc, 1, 1),
        process_is_granule=by_process,
    )
    return Mesh(grid, ("data", "seq", "model"))


def process_batch_slice(global_batch: int, mesh: Mesh) -> slice:
    """Rows of the GLOBAL padded batch this process must materialize.

    The data axis is laid out with the process (DCN) dimension outermost
    (make_multihost_mesh), so each process owns one contiguous block of
    videos.  The loader applies this to its sample list before collating,
    so no host ever reads or pads another host's videos.
    """
    n_proc = jax.process_count()
    assert global_batch % n_proc == 0, (global_batch, n_proc)
    per = global_batch // n_proc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def shard_batch_arrays_multihost(mesh: Mesh, local_arrays: dict) -> dict:
    """Drop-in for `shard_batch_arrays` when each process holds only ITS
    slice of the batch (process_batch_slice rows): assembles global device
    arrays via `jax.make_array_from_process_local_data`, which moves each
    host's rows onto its own devices — zero cross-host data movement.

    Single process: bitwise-identical to `shard_batch_arrays` (the local
    slice IS the global batch)."""
    specs = batch_specs()
    out = {}
    for k, v in local_arrays.items():
        sharding = NamedSharding(mesh, specs[k])
        v = np.asarray(v)
        global_shape = (v.shape[0] * jax.process_count(),) + v.shape[1:]
        out[k] = jax.make_array_from_process_local_data(
            sharding, v, global_shape
        )
    return out
