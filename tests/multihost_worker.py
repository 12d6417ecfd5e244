"""Worker process for the REAL multi-process multihost test.

Spawned by tests/test_parallel.py::test_multihost_two_process_train_step —
NOT collected by pytest.  Each worker is one jax "host": it joins the
distributed runtime (jax.distributed over localhost, Gloo collectives on
the CPU backend), builds the global mesh with make_multihost_mesh, pads
and moves ONLY ITS OWN rows of the deterministic global batch
(process_batch_slice + shard_batch_arrays_multihost), runs one sharded
train step, and writes the replicated loss + a parameter checksum to a
JSON file for the parent to compare across processes and against the
single-process 8-device reference.

This is the multi-controller SPMD contract from parallel/multihost.py's
docstring exercised end-to-end without TPU pod hardware — the same
fake-backend story SURVEY.md §4 prescribes for sharded paths, extended
to multiple processes.
"""

import json
import sys

import numpy as np


def main() -> None:
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = sys.argv[3]
    out_path = sys.argv[4]

    import jax
    import jax.numpy as jnp

    from mucon_tpu.parallel.multihost import (
        init_distributed,
        is_coordinator,
        make_multihost_mesh,
        process_batch_slice,
        shard_batch_arrays_multihost,
    )

    init_distributed(
        f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes
    assert is_coordinator() == (process_id == 0)

    from mucon_tpu.data import collate_padded
    from mucon_tpu.harness.optim import create_optimizer
    from mucon_tpu.models import create_model
    from tests.test_model import D, M, NMAX, make_sample, small_cfg

    # identical deterministic setup on every process (seed-identical
    # loaders are the multihost contract, harness/trainer.py)
    cfg = small_cfg()
    rng = np.random.RandomState(0)
    samples = [make_sample(rng, 48 + 16 * i, 3, f"v{i}") for i in range(8)]
    batch = collate_padded(samples, n_max=NMAX, pad_multiple=64)
    model = create_model(
        cfg, num_classes=M, max_decoding_steps=NMAX + 1, input_feature_size=D
    )
    params = model.init_params(jax.random.PRNGKey(0), batch)

    mesh = make_multihost_mesh(jax.device_count())
    from mucon_tpu.models.model import batch_to_host_arrays

    host = batch_to_host_arrays(batch)
    sl = process_batch_slice(host["num_frames"].shape[0], mesh)
    arrays = shard_batch_arrays_multihost(
        mesh, {k: v[sl] for k, v in host.items()}
    )

    from mucon_tpu.parallel import make_sharded_train_step

    tx = create_optimizer(cfg, model.param_partition(params))
    params_in = jax.tree.map(jnp.array, params)
    opt_state = tx.init(params_in)
    step = make_sharded_train_step(model, tx, mesh, teacher_forcing=True)
    new_params, opt_state, loss = step(
        params_in, opt_state, jax.random.PRNGKey(7), arrays
    )
    # replicated outputs are addressable on every process
    checksum = float(
        sum(float(np.abs(np.asarray(l)).sum()) for l in jax.tree.leaves(new_params))
    )
    with open(out_path, "w") as f:
        json.dump(
            {
                "process": process_id,
                "process_count": jax.process_count(),
                "global_devices": jax.device_count(),
                "local_devices": jax.local_device_count(),
                "rows": [int(sl.start), int(sl.stop)],
                "loss": float(loss.main),
                "param_checksum": checksum,
            },
            f,
        )


if __name__ == "__main__":
    main()
