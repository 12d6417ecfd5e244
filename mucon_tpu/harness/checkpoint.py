"""Checkpoint save/restore for the self-describing run folder.

Layout contract (SURVEY.md §5.4, proved by reference call sites
test_mucon.py:41-43,78 and train_test_mucon.py:64):

    <trainer.root>/<exp_name>/<run_number>/
        config.yaml                  # snapshot; runs are self-describing
        checkpoints/epoch_<n>/
            model.msgpack            # parameter pytree
            optimizer.msgpack        # optimizer state pytree
            trainer_state.json       # epoch/iter counters, scheduler state
        metrics/...                  # metric series (metrics_store.py)
        data_<evaluator>.pkl         # evaluator artifact dumps

Serialization is flax msgpack (host-independent, works for any pytree of
arrays); restore requires congruent templates, which the trainer
reconstructs from config — same contract as the reference's
`load_training(run, epoch)`.
"""

from __future__ import annotations

import json
import threading
from pathlib import Path
from typing import Optional

import jax
from flax import serialization


def _write_checkpoint_files(
    folder: Path, params_host, opt_state_host, trainer_state: dict
) -> None:
    # every file goes through tmp-then-rename; model.msgpack (the file
    # latest_checkpoint() keys on) is renamed LAST, so a crash at any
    # point never leaves a checkpoint that load_training would trust
    state_tmp = folder / "trainer_state.json.tmp"
    with open(state_tmp, "w") as f:
        json.dump(trainer_state, f, indent=2)
    state_tmp.rename(folder / "trainer_state.json")
    for name, obj in (("optimizer", opt_state_host), ("model", params_host)):
        tmp = folder / f"{name}.msgpack.tmp"
        tmp.write_bytes(serialization.to_bytes(obj))
        tmp.rename(folder / f"{name}.msgpack")


def save_checkpoint(
    folder: Path, params, opt_state, trainer_state: dict, async_write: bool = False
) -> Optional["_AsyncWriter"]:
    """Persist a checkpoint.  With `async_write`, the device->host snapshot
    happens synchronously (so training can mutate params immediately after)
    but serialization + disk IO run on a background thread — the "periodic
    async checkpoint" capability from SURVEY.md §2.12 (the reference blocks
    training for the full save).  Returns the writer thread (or None)."""
    folder = Path(folder)
    folder.mkdir(parents=True, exist_ok=True)
    params = jax.device_get(params)
    opt_state = jax.device_get(opt_state)
    if not async_write:
        _write_checkpoint_files(folder, params, opt_state, trainer_state)
        return None
    return _AsyncWriter(folder, params, opt_state, dict(trainer_state))


class _AsyncWriter:
    """Background checkpoint writer whose failure is NOT silent: join()
    re-raises any writer-thread exception (e.g. ENOSPC) in the caller."""

    def __init__(self, folder, params, opt_state, trainer_state):
        self.error: Optional[BaseException] = None

        def run():
            try:
                _write_checkpoint_files(folder, params, opt_state, trainer_state)
            except BaseException as e:  # re-raised at join()
                self.error = e

        self._thread = threading.Thread(target=run, daemon=False)
        self._thread.start()

    def join(self) -> None:
        self._thread.join()
        if self.error is not None:
            raise self.error


def checkpoint_folder(root, exp_name, run_number, epoch: int) -> Path:
    """`<root>/<exp>/<run>/checkpoints/epoch_<n>` — the layout the trainer
    writes (trainer.py:_get_checkpointing_folder)."""
    return (
        Path(root)
        / exp_name
        / str(run_number)
        / "checkpoints"
        / f"epoch_{int(epoch)}"
    )


def load_params(root, exp_name, run_number, epoch: int, params_template):
    """Read-only parameter restore from a run folder.

    Unlike `SimpleTrainer.load_training` (the reference's resume surface,
    test_mucon.py:78), this never creates a run folder, never dumps a
    config.yaml, and never touches optimizer state — the right entry for
    evaluation-only flows (cli/test_mucon.py, cli/predict.py)."""
    folder = checkpoint_folder(root, exp_name, run_number, epoch)
    if not (folder / "model.msgpack").exists():
        raise FileNotFoundError(f"no checkpoint at {folder}")
    params, _, _ = load_checkpoint(folder, params_template)
    return params


def load_checkpoint(folder: Path, params_template, opt_state_template=None):
    """Returns (params, opt_state | None, trainer_state dict)."""
    folder = Path(folder)
    params = serialization.from_bytes(
        params_template, (folder / "model.msgpack").read_bytes()
    )
    opt_state = None
    opt_path = folder / "optimizer.msgpack"
    if opt_state_template is not None and opt_path.exists():
        opt_state = serialization.from_bytes(
            opt_state_template, opt_path.read_bytes()
        )
    state = {}
    sp = folder / "trainer_state.json"
    if sp.exists():
        with open(sp) as f:
            state = json.load(f)
    return params, opt_state, state
