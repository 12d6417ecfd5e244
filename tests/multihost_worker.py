"""Worker process for the REAL multi-process multihost tests.

Spawned by tests/test_parallel.py (NOT collected by pytest).  Each worker
is one jax "host": it joins the distributed runtime (jax.distributed over
localhost, Gloo collectives on the CPU backend) and exercises one of two
modes:

* ``step`` — builds the global mesh with make_multihost_mesh, pads and
  moves ONLY ITS OWN rows of the deterministic global batch
  (process_batch_slice + shard_batch_arrays_multihost), runs one sharded
  train step, and writes the replicated loss + a parameter checksum for
  the parent to compare across processes and against the single-process
  8-device reference.
* ``trainer`` — runs a full 1-epoch SimpleTrainer with
  ``tpu.mesh.multihost=true`` on a shared synthetic dataset (the parent
  pre-generates it; loaders are seed-identical across processes, the
  multihost contract), proving the trainer-level integration: per-process
  batch-row slicing, replicated metrics, and coordinator-only
  checkpointing.

This is the multi-controller SPMD contract from parallel/multihost.py's
docstring exercised end-to-end without TPU pod hardware — the same
fake-backend story SURVEY.md §4 prescribes for sharded paths, extended
to multiple processes.
"""

import json
import sys

import numpy as np


def run_step_mode(out_path: str) -> None:
    import jax
    import jax.numpy as jnp

    from mucon_tpu.data import collate_padded
    from mucon_tpu.harness.optim import create_optimizer
    from mucon_tpu.models import create_model
    from mucon_tpu.models.model import batch_to_host_arrays
    from mucon_tpu.parallel import make_sharded_train_step
    from mucon_tpu.parallel.multihost import (
        make_multihost_mesh,
        process_batch_slice,
        shard_batch_arrays_multihost,
    )
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
    host = batch_to_host_arrays(batch)
    sl = process_batch_slice(host["num_frames"].shape[0], mesh)
    arrays = shard_batch_arrays_multihost(
        mesh, {k: v[sl] for k, v in host.items()}
    )

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
                "process": jax.process_index(),
                "process_count": jax.process_count(),
                "global_devices": jax.device_count(),
                "local_devices": jax.local_device_count(),
                "rows": [int(sl.start), int(sl.stop)],
                "loss": float(loss.main),
                "param_checksum": checksum,
            },
            f,
        )


def run_trainer_mode(
    out_path: str, data_root: str, run_root: str, coord_root: str
) -> None:
    import jax

    from mucon_tpu.data import handel_dataset
    from mucon_tpu.harness import SimpleTrainer
    from mucon_tpu.models import create_model
    from tests.test_parallel import multihost_trainer_cfg

    cfg = multihost_trainer_cfg(data_root, run_root)
    train_db = handel_dataset(cfg, train=True)
    model = create_model(
        cfg,
        train_db.get_num_classes(),
        train_db.max_transcript_length + 1,
        train_db.feat_dim,
    )
    # SimpleTrainer's own init_distributed() call hits the no-op branch
    # (no env, no args) because this worker already joined the runtime
    t = SimpleTrainer(cfg, "mh2proc", train_db, model)
    assert t.mesh is not None
    assert t.mesh.shape["data"] == jax.device_count()
    t.train()
    t.wait_for_save()

    events = [
        json.loads(line) for line in open(t.run_folder / "events.jsonl")
    ]
    train_losses = [e["main"] for e in events if e["kind"] == "epoch"]
    ckpts = sorted(
        p.name for p in (t.run_folder / "checkpoints").glob("epoch_*")
    ) if (t.run_folder / "checkpoints").exists() else []

    # multihost EVALUATION: fused program over the global mesh, per-process
    # batch rows, outputs all-gathered so every process computes the full
    # 24-field result.  Deterministic init params (not the trained ones) so
    # the parent's single-process reference is comparable.
    import dataclasses

    from mucon_tpu.harness import MuConEvaluator

    test_db = handel_dataset(cfg, train=False)
    ev_model = create_model(
        cfg,
        test_db.get_num_classes(),
        test_db.max_transcript_length + 1,
        test_db.feat_dim,
    )
    ev_params = ev_model.init_params(jax.random.PRNGKey(0))
    ev = MuConEvaluator(cfg=cfg, test_db=test_db, model=ev_model)
    ev.viterbi_mode(True)
    eval_result = dataclasses.asdict(ev.evaluate(ev_params))

    # multihost elastic RESUME: both processes restore the COORDINATOR's
    # epoch-1 checkpoint (one shared run folder in real deployments), the
    # restored host leaves are re-committed to the global mesh, and one
    # more epoch runs — the multihost analog of the single-process resume
    # contract (reference test_mucon.py:78)
    c2 = multihost_trainer_cfg(data_root, coord_root)
    c2.trainer.num_epochs = 3
    t2 = SimpleTrainer(
        c2, "mh2proc", train_db, model,
        run_number=50 + jax.process_index(),
    )
    assert t2.resume_latest(run="0")
    assert t2.epoch_num == 2
    t2.train()
    t2.wait_for_save()
    resumed = [
        json.loads(line)["main"]
        for line in open(t2.run_folder / "events.jsonl")
        if json.loads(line)["kind"] == "epoch"
    ]

    with open(out_path, "w") as f:
        json.dump(
            {
                "process": jax.process_index(),
                "process_count": jax.process_count(),
                "train_losses": train_losses,
                "checkpoints": ckpts,
                "eval": eval_result,
                "resumed_losses": resumed,
            },
            f,
        )


def main() -> None:
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = sys.argv[3]
    out_path = sys.argv[4]
    mode = sys.argv[5] if len(sys.argv) > 5 else "step"

    import jax

    from mucon_tpu.parallel.multihost import init_distributed, is_coordinator

    init_distributed(
        f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes
    assert is_coordinator() == (process_id == 0)

    if mode == "step":
        run_step_mode(out_path)
    elif mode == "trainer":
        run_trainer_mode(
            out_path,
            data_root=sys.argv[6],
            run_root=sys.argv[7],
            coord_root=sys.argv[8],
        )
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
