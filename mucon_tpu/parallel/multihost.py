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
3. each process transfers ONLY its own rows of the collated batch:
   `process_batch_slice(global_batch, mesh)` says which (derived from the
   mesh's device layout; collate itself still runs on every host — see
   the function docstring);
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


def _distributed_client_active() -> bool:
    """True once jax.distributed.initialize has run in this process (by us
    or an external launcher) — calling initialize again raises."""
    try:
        from jax._src import distributed as _jdist

        return getattr(_jdist.global_state, "client", None) is not None
    except Exception:  # pragma: no cover - private-API drift
        return jax.process_count() > 1


def distributed_env_configured() -> bool:
    """True when the environment declares a multi-process launch (the
    standard JAX env an external launcher exports)."""
    return bool(
        os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("JAX_NUM_PROCESSES")
    )


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    auto: bool = False,
) -> tuple[int, int]:
    """Initialize jax.distributed when a multi-process run is configured;
    no-op (returns current (process_index, process_count)) otherwise.

    A run is multi-process when `coordinator_address` is given explicitly
    or the standard JAX env (JAX_COORDINATOR_ADDRESS + JAX_NUM_PROCESSES +
    JAX_PROCESS_ID) is set.  With ``auto=True`` (the CLI entries pass this
    when ``tpu.mesh.multihost`` is set) and no explicit env/args,
    `jax.distributed.initialize()`'s own cluster auto-detection is tried —
    that is the path real Cloud TPU pods take, where the coordinator comes
    from instance metadata, not JAX_* vars; if no cluster environment is
    detected either, the run proceeds single-process.

    Idempotent: a second call (e.g. the trainer after the CLI entry, or
    after an external launcher already initialized) is a no-op.

    MUST run before any jax call initializes the XLA backend — the CLI
    entries (cli/common.py::compose_config) call this before touching
    jax.devices(); custom launchers must do the same.
    Returns (process_index, process_count).
    """
    if _distributed_client_active():
        return jax.process_index(), jax.process_count()
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    explicit = addr is not None or num_processes is not None
    if not explicit and not auto:
        return jax.process_index(), jax.process_count()
    try:
        if explicit:
            jax.distributed.initialize(
                coordinator_address=addr,
                num_processes=num_processes,
                process_id=process_id,
            )
        else:
            # auto mode, no env/args: let jax's cluster detection look for
            # Cloud TPU metadata / SLURM / etc.
            jax.distributed.initialize()
    except RuntimeError as e:
        raise RuntimeError(
            "jax.distributed.initialize failed. On multihost runs it must "
            "execute BEFORE any jax call initializes the XLA backend "
            "(jax.devices(), jit, device_put, ...). The mucon_tpu CLI "
            "entries call init_distributed first when tpu.mesh.multihost "
            "is set; a custom launcher must call "
            "mucon_tpu.parallel.multihost.init_distributed() at its top."
        ) from e
    except ValueError:
        if explicit:
            raise
        # auto mode and jax could not detect a cluster environment:
        # a single-process dev run with multihost=True is allowed — the
        # mesh falls back to make_mesh and the math is identical.
        logger.info(
            "tpu.mesh.multihost set but no distributed environment "
            "detected (no JAX_COORDINATOR_ADDRESS / cloud metadata); "
            "running single-process"
        )
        return jax.process_index(), jax.process_count()
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
    # no) slice_index, so fall back to process granules there.  Either way
    # each process's devices must form one contiguous block of the "data"
    # axis, but the block's POSITION is not assumed: process_batch_slice
    # derives it from the built mesh's device->row mapping (slice-granule
    # order need not equal process_index order).
    slice_ids = {getattr(d, "slice_index", None) for d in jax.devices()}
    by_process = None in slice_ids or len(slice_ids) != n_proc
    grid = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(n_data // n_proc, n_seq, n_model),
        dcn_mesh_shape=(n_proc, 1, 1),
        process_is_granule=by_process,
    )
    return Mesh(grid, ("data", "seq", "model"))


def _process_data_rows(mesh: Mesh) -> slice:
    """Contiguous block of the mesh's "data" axis owned by THIS process,
    derived from the mesh's actual device->index mapping (never assumed
    from process_index: `create_hybrid_device_mesh` may order granules by
    slice_index on multi-slice pods, which is not guaranteed to equal
    process_index ordering)."""
    devs = np.asarray(mesh.devices)  # (data, seq, model)
    me = jax.process_index()
    mine = []
    for i in range(devs.shape[0]):
        owners = {d.process_index for d in devs[i].ravel()}
        if me in owners:
            assert owners == {me}, (
                f"data row {i} spans processes {sorted(owners)} — seq/model "
                "axes must stay within one process (make_multihost_mesh "
                "guarantees this; a hand-built mesh violated it)"
            )
            mine.append(i)
    assert mine and mine == list(range(mine[0], mine[0] + len(mine))), (
        f"process {me}'s data rows {mine} are not one contiguous block; "
        "make_array_from_process_local_data needs contiguous local rows"
    )
    return slice(mine[0], mine[-1] + 1)


def process_batch_slice(global_batch: int, mesh: Mesh) -> slice:
    """Rows of the GLOBAL padded batch this process must transfer.

    Derived from the mesh's device layout (`_process_data_rows`), so it is
    correct for both process-granule and slice-granule hybrid meshes even
    when granule order differs from process_index order.  Note the current
    trainer/evaluator apply this AFTER `batch_to_host_arrays` on the fully
    collated global batch — every host still reads, pads, and collates all
    videos; only the host->device transfer is sliced.  Moving the slice
    into the loader (pre-collate) is the remaining host-work optimization
    at Breakfast scale (~20 GB/epoch of collate measured round 2).
    """
    devs_rows = _process_data_rows(mesh)
    n_data = int(np.asarray(mesh.devices).shape[0])
    assert global_batch % n_data == 0, (global_batch, n_data)
    per_row = global_batch // n_data
    return slice(devs_rows.start * per_row, devs_rows.stop * per_row)


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
