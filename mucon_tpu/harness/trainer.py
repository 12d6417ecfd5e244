"""Training harness: the fandak-Trainer-equivalent experiment loop.

Reproduces the reference training semantics (src/mucon/trainers.py +
inferred fandak behavior, SURVEY.md §2.11/§3.1):

* run folder `<root>/<exp_name>/<run_number>/` with a config.yaml snapshot;
* epoch loop with teacher-forcing control on epoch start, eval/save
  cadence, scheduler step driven by eval results (plateau uses s_mof_nbg);
* gradient accumulation and the encoder/decoder-separate global-norm clip;
* `save_training()` / `load_training(run, epoch)` resume contract;
* persisted metric series under `metrics/` and evaluator pickles.

TPU design: ONE jitted, donated train step (forward + loss + grad + clip +
optimizer) per (bucket shape x teacher-forcing) — the epoch loop only feeds
padded batches and reads scalars; batches prefetch on a host thread.
"""

from __future__ import annotations

import dataclasses
import time
from collections import deque
from functools import partial
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mucon_tpu.data.batching import PaddedBatchLoader
from mucon_tpu.harness.cache import CacheBudget, arrays_nbytes
from mucon_tpu.harness.checkpoint import load_checkpoint, save_checkpoint
from mucon_tpu.harness.logging import RunLogger, StepTimer
from mucon_tpu.harness.metrics_store import MetricStore
from mucon_tpu.harness.optim import (
    Scheduler,
    create_optimizer,
    create_scheduler,
    set_learning_rate,
)
from mucon_tpu.models.model import batch_to_arrays


@dataclasses.dataclass(frozen=True)
class ReplayBatch:
    """Lightweight PaddedBatch stand-in on cache-replay epochs: batch
    callbacks receive this instead of a full batch when the device cache
    already holds every array (only identity + size are meaningful)."""

    video_names: tuple
    batch_size: int


def _next_run_number(exp_folder: Path) -> int:
    if not exp_folder.exists():
        return 0
    runs = [int(p.name) for p in exp_folder.iterdir() if p.name.isdigit()]
    return max(runs) + 1 if runs else 0


def _recommit_like(template, host_tree):
    """device_put every restored (host) leaf to the mesh layout of the
    live leaf it replaces — the checkpoint round-trip for mesh-sharded
    state.  Only NamedSharding (mesh-committed) leaves are re-committed:
    single-device leaves (e.g. the optax step count, created uncommitted
    by tx.init) stay host-side so jit remains free to place them."""
    from jax.sharding import NamedSharding

    def put(t, h):
        if isinstance(t, jax.Array) and isinstance(t.sharding, NamedSharding):
            return jax.device_put(h, t.sharding)
        return h

    return jax.tree.map(put, template, host_tree)


class SimpleTrainer:
    eval_metric_name_format = "eval_metric_{}"

    def __init__(
        self,
        cfg,
        exp_name: str,
        train_db,
        model,
        device=None,
        evaluators: Optional[List] = None,
        run_number: Optional[int] = None,
        seed: Optional[int] = None,
    ):
        self.cfg = cfg
        self.exp_name = exp_name
        self.train_db = train_db
        self.model = model
        self.device = device
        self.evaluators = list(evaluators) if evaluators else []

        self.update_trainer_using_config()

        # run folder (self-describing: config snapshot inside)
        self.root = self.figure_root()
        exp_folder = self.root / exp_name
        self.run_number = (
            run_number if run_number is not None else _next_run_number(exp_folder)
        )
        self.run_folder = exp_folder / str(self.run_number)
        self.run_folder.mkdir(parents=True, exist_ok=True)
        cfg.clone().dump_to_file(str(self.run_folder / "config.yaml"))

        self.logger = RunLogger(self.run_folder)
        self.metrics = MetricStore(self.run_folder / "metrics")
        self.timer = StepTimer()

        self.epoch_num = 0
        self.iter_num = 0
        self._train_loader = None
        # cumulative wall time of non-train/non-eval epoch-loop segments
        # (metric IO, scheduler, checkpoint starts/waits, callbacks) —
        # summarized in the "train_phases" event (VERDICT r4 #5)
        self.phase_seconds: Dict[str, float] = {}

        self.seed = cfg.system.seed if seed is None else seed
        self._rng = jax.random.PRNGKey(self.seed)

        # params + optimizer
        self.params = self.model.init_params(jax.random.PRNGKey(self.seed))
        self.partition = self.model.param_partition(self.params)
        self.tx = self.figure_optimizer()
        self.opt_state = self.tx.init(self.params)
        self.scheduler: Optional[Scheduler] = self.figure_scheduler()

        self.accumulate_grad_every = self.figure_accumulate_grad() or 1
        self._step_fns: Dict[bool, Any] = {}
        self._grad_fns: Dict[bool, Any] = {}

        # device-resident batch cache (tpu.cache_batches): static features
        # transfer once, epochs 2+ run with zero host->device traffic.
        # The byte budget (tpu.cache_budget_gb) is shared with this
        # trainer's evaluators: the hot train loop fills it first, eval
        # batches stream once it is spent (harness/cache.py)
        self._batch_cache: Dict[tuple, dict] = {}
        self.cache_budget = CacheBudget.from_config(cfg)
        for ev in self.evaluators:
            if getattr(ev, "cache_budget", None) is None:
                ev.cache_budget = self.cache_budget
        transfer = getattr(cfg.tpu, "feats_transfer_dtype", "auto")
        if transfer == "auto":
            self._feats_dtype = (
                jnp.bfloat16 if cfg.tpu.compute_dtype == "bfloat16" else None
            )
        elif transfer == "float32":
            self._feats_dtype = None
        elif transfer in ("float16", "bfloat16"):
            self._feats_dtype = jnp.dtype(transfer)
        elif transfer == "int8":
            # quantized wire: 1/4 the f32 bytes on the wire AND in the
            # device-resident cache (models/model.py::quantize_feats_int8)
            self._feats_dtype = "int8"
        else:
            raise ValueError(
                f"Invalid tpu.feats_transfer_dtype {transfer!r} "
                "(use 'auto'|'float32'|'float16'|'bfloat16'|'int8')"
            )

        # multi-device SPMD (tpu.mesh.enable): params replicated, batches
        # sharded over ("data", "seq"), gradient psum inserted by XLA —
        # the scale-out capability the reference lacks (SURVEY.md §2.12)
        self.mesh = None
        self._multihost = bool(getattr(cfg.tpu.mesh, "multihost", False))
        if cfg.tpu.mesh.enable and (
            self._multihost or len(jax.devices()) > 1
        ):
            if self._multihost:
                from mucon_tpu.parallel.multihost import (
                    init_distributed,
                    make_multihost_mesh,
                )

                # idempotent: the CLI entries already initialized before
                # any jax call (cli/common.py::compose_config); if an env-
                # configured launch reaches here UNinitialized (custom
                # launcher touched jax first), this raises with the fix.
                init_distributed()
                n_model = int(getattr(cfg.tpu.mesh, "model", 1))
                if jax.process_count() > 1 and n_model > 1:
                    raise RuntimeError(
                        "multihost + model-sharded params "
                        f"(tpu.mesh.model={n_model}) is not supported: "
                        "save_training's single-writer checkpoint needs "
                        "every param leaf addressable in full on the "
                        "coordinator, but model sharding leaves it only a "
                        "shard of each ft leaf. Use tpu.mesh.model=1 "
                        "across hosts (shard model within a host only)."
                    )
                self.mesh = make_multihost_mesh(
                    cfg.tpu.mesh.data,
                    cfg.tpu.mesh.seq,
                    n_model,
                )
            else:
                from mucon_tpu.parallel.mesh import mesh_from_config

                self.mesh = mesh_from_config(cfg)
            n_data = self.mesh.shape["data"]
            if self.cfg.tpu.batch_size % n_data != 0:
                raise ValueError(
                    f"tpu.batch_size ({self.cfg.tpu.batch_size}) must be a "
                    f"multiple of the mesh data axis ({n_data})"
                )
            if self.mesh.shape.get("model", 1) > 1:
                # tensor parallelism: commit the conv-stack channels to the
                # "model" axis and rebuild the optimizer state from the
                # committed tree so it inherits the same layout
                from mucon_tpu.parallel.mesh import shard_params

                self.params = shard_params(self.mesh, self.params)
                self.opt_state = self.tx.init(self.params)

    # -- template methods (fandak contract, trainers.py:60-106) -------------
    def update_trainer_using_config(self) -> None:
        self.save_every = self.cfg.trainer.save_every
        self.eval_every = self.cfg.trainer.eval_every

    def figure_root(self) -> Path:
        return Path(self.cfg.trainer.root)

    def figure_optimizer(self):
        return create_optimizer(self.cfg, self.partition)

    def figure_scheduler(self) -> Optional[Scheduler]:
        return create_scheduler(self.cfg)

    def figure_accumulate_grad(self) -> int:
        return self.cfg.trainer.accumulate_grad_every

    def figure_num_epochs(self) -> int:
        return self.cfg.trainer.num_epochs

    def create_train_dataloader(self) -> PaddedBatchLoader:
        if self._train_loader is not None:
            return self._train_loader
        self._train_loader = PaddedBatchLoader(
            self.train_db,
            batch_size=max(1, self.cfg.tpu.batch_size),
            pad_multiple=self.cfg.tpu.pad_multiple,
            shuffle=True,
            seed=self.seed,
            prefetch=max(1, self.cfg.system.num_workers),
            fixed_batches=self.cfg.tpu.cache_batches,
            # sharded batches must divide the mesh's data axis evenly (a
            # short remainder batch would need loss-polluting dummy videos);
            # divisible remainder batches are kept, non-divisible ones are
            # dropped with a loud warning in the loader
            batch_divisor=(
                self.mesh.shape["data"] if self.mesh is not None else 1
            ),
        )
        return self._train_loader

    def _make_arrays(self, batch) -> dict:
        """Batch -> device arrays.  Under a mesh, shard DIRECTLY from host
        numpy (one transfer per shard) — going through batch_to_arrays
        first would commit the full batch to device 0 and then reshard,
        doubling traffic on the h2d-bound tunnel."""
        if self.mesh is None:
            return batch_to_arrays(batch, feats_dtype=self._feats_dtype)
        from mucon_tpu.models.model import batch_to_host_arrays
        from mucon_tpu.parallel.mesh import shard_batch_arrays

        host = batch_to_host_arrays(batch, feats_dtype=self._feats_dtype)
        if self._multihost and jax.process_count() > 1:
            # each host moves only ITS rows of the global batch; the
            # loaders are seed-identical across processes so every
            # process sees the same global batch order
            from mucon_tpu.parallel.multihost import (
                process_batch_slice,
                shard_batch_arrays_multihost,
            )

            sl = process_batch_slice(host["num_frames"].shape[0], self.mesh)
            return shard_batch_arrays_multihost(
                self.mesh, {k: v[sl] for k, v in host.items()}
            )
        return shard_batch_arrays(self.mesh, host)

    def _batch_arrays(self, batch) -> dict:
        if not self.cfg.tpu.cache_batches:
            return self._make_arrays(batch)
        key = tuple(batch.video_names)
        arrays = self._batch_cache.get(key)
        if arrays is None:
            arrays = self._make_arrays(batch)
            if self.mesh is None:  # sharded arrays are already placed
                arrays = {k: jax.device_put(v) for k, v in arrays.items()}
            if self.cache_budget.try_reserve(
                arrays_nbytes(arrays), "train batch"
            ):
                self._batch_cache[key] = arrays
        return arrays

    def _prefetched(self, loader):
        """Yield (batch, arrays) with the host->device transfer issued
        `tpu.device_prefetch` batches ahead of compute.  JAX transfers are
        async, so putting batch k+1 on the wire before batch k's step is
        consumed hides the transfer behind device compute (double
        buffering; new TPU capability — the reference's pinned-memory
        DataLoader is the closest analogue, trainers.py:97-105)."""
        ahead = max(0, int(self.cfg.tpu.device_prefetch))
        if ahead == 0:
            for batch in loader:
                yield batch, self._batch_arrays(batch)
            return
        buf: deque = deque()
        for batch in loader:
            buf.append((batch, self._batch_arrays(batch)))
            if len(buf) > ahead:
                yield buf.popleft()
        while buf:
            yield buf.popleft()

    def _epoch_batches(self, loader):
        """(batch, arrays) pairs for one epoch.  Once every fixed batch is
        device-cached, replay the cache in the loader's own epoch order
        WITHOUT touching the dataset — no disk reads, no pad-collate: at
        Breakfast scale that is ~20 GB of host numpy work per epoch for
        arrays the device already holds."""
        if (
            self.cfg.tpu.cache_batches
            and loader.fixed_batches
            and len(loader) > 0
            and len(self._batch_cache) >= len(loader)
        ):
            epoch_before = loader.epoch
            replay = []
            for key, size in loader.iter_cached_keys():
                arrays = self._batch_cache.get(key)
                if arrays is None:  # composition changed: use the loader
                    replay = None
                    break
                replay.append((ReplayBatch(key, size), arrays))
            if replay is not None:
                return iter(replay)
            # iter_cached_keys already advanced the shuffle state; rewind so
            # the loader fallback replays the SAME epoch order (keeps the
            # trajectory bit-identical to the no-replay run)
            loader.epoch = epoch_before
        return self._prefetched(loader)

    def figure_scheduler_input(self, eval_results) -> Dict[str, Any]:
        if self.cfg.trainer.scheduler.name == "plateau" and eval_results:
            return {"metrics": eval_results[0].s_mof_nbg}
        return {}

    # -- callbacks ------------------------------------------------------------
    def on_start_epoch(self, epoch_num: int) -> None:
        self.model.set_teacher_forcing(self.cfg.model.teacher_forcing)

    def on_finish_epoch(self, epoch_num: int) -> None:
        if (epoch_num + 1) % self.eval_every == 0:
            for evaluator in self.evaluators:
                evaluator.set_checkpointing_folder(self._get_checkpointing_folder())
                evaluator.save_stuff()

    def on_start_batch(self, iter_num: int, batch) -> None:
        pass

    def on_finish_batch(self, iter_num: int, batch, loss) -> None:
        pass

    @staticmethod
    def _loss_scalars(loss) -> dict:
        """All 0-d fields of a loss dataclass as host floats.

        Fetched with ONE jax.device_get so logging costs a single
        device->host transfer; per-field float() would pay one full
        round trip per scalar (~2 ms each over the axon tunnel).
        """
        pending = {
            k: v
            for k, v in dataclasses.asdict(loss).items()
            if np.ndim(v) == 0
        }
        return {k: float(v) for k, v in jax.device_get(pending).items()}

    # -- jitted steps -----------------------------------------------------------
    def _make_step_fn(self, teacher_forcing: bool):
        if self.mesh is not None:
            from mucon_tpu.parallel.mesh import make_sharded_train_step

            return make_sharded_train_step(
                self.model, self.tx, self.mesh, teacher_forcing
            )
        model, tx = self.model, self.tx

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, rng, arrays):
            def loss_fn(p):
                fwd = model.forward(
                    p, arrays, rng=rng, train=True, teacher_forcing=teacher_forcing
                )
                loss = model.loss(fwd, arrays, teacher_forcing=teacher_forcing)
                return loss.main, loss

            grads, loss = jax.grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step

    def _make_grad_fn(self, teacher_forcing: bool):
        if self.mesh is not None:
            from mucon_tpu.parallel.mesh import make_sharded_grad_step

            return make_sharded_grad_step(
                self.model, self.mesh, teacher_forcing,
                self.accumulate_grad_every,
            )
        model = self.model
        k = float(self.accumulate_grad_every)

        @jax.jit
        def grad_step(params, acc, rng, arrays):
            def loss_fn(p):
                fwd = model.forward(
                    p, arrays, rng=rng, train=True, teacher_forcing=teacher_forcing
                )
                loss = model.loss(fwd, arrays, teacher_forcing=teacher_forcing)
                return loss.main / k, loss

            grads, loss = jax.grad(loss_fn, has_aux=True)(params)
            acc = jax.tree.map(jnp.add, acc, grads)
            return acc, loss

        return grad_step

    def _apply_accumulated(self, acc):
        @jax.jit
        def apply(params, opt_state, acc):
            updates, opt_state = self.tx.update(acc, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        self.params, self.opt_state = apply(self.params, self.opt_state, acc)

    # -- main loop ----------------------------------------------------------------
    def train(self) -> None:
        try:
            self._train_epochs()
        finally:
            # surface any in-flight async-checkpoint failure even when an
            # exception escapes the epoch loop
            self.wait_for_save()

    def _phase(self, name: str):
        """Accumulate wall time of the NON-train, non-eval epoch-loop
        segments (metric IO, scheduler, checkpoint starts/waits,
        callbacks) into self.phase_seconds — the timed run's "other"
        bucket, decomposed (VERDICT r4 #5)."""
        import contextlib

        @contextlib.contextmanager
        def cm():
            t0 = time.perf_counter()
            try:
                yield
            finally:
                self.phase_seconds[name] = (
                    self.phase_seconds.get(name, 0.0)
                    + time.perf_counter() - t0
                )

        return cm()

    def _train_epochs(self) -> None:
        num_epochs = self.figure_num_epochs()
        start = self.epoch_num
        t_loop0 = time.perf_counter()
        train_s = evals_s = 0.0
        for epoch in range(start, num_epochs):
            self.epoch_num = epoch
            with self._phase("callbacks"):
                self.on_start_epoch(epoch)
            t_tr0 = time.perf_counter()
            with self.logger.profile(
                enabled=epoch == self.cfg.trainer.profile_epoch
            ):
                self._train_one_epoch()
            train_s += time.perf_counter() - t_tr0

            eval_results = []
            if self.evaluators and (epoch + 1) % self.eval_every == 0:
                for i, evaluator in enumerate(self.evaluators):
                    t_ev0 = time.perf_counter()
                    result = evaluator.evaluate(self.params)
                    eval_seconds = time.perf_counter() - t_ev0
                    evals_s += eval_seconds
                    eval_results.append(result)
                    with self._phase("metric_io"):
                        name = self.eval_metric_name_format.format(i + 1)
                        self.metrics[name].set_value(result, epoch)
                        self.metrics[name].save()
                        self.logger.log(
                            f"eval_{i}",
                            epoch,
                            eval_seconds=eval_seconds,
                            eval_phases=getattr(
                                evaluator, "last_eval_phases", None
                            ),
                            **{
                                k: v
                                for k, v in dataclasses.asdict(result).items()
                                if isinstance(v, (int, float))
                            },
                        )
                # eval switches teacher forcing off; restore for training
                self.model.set_teacher_forcing(self.cfg.model.teacher_forcing)

            if self.scheduler is not None:
                with self._phase("scheduler"):
                    self.scheduler.step(
                        **self.figure_scheduler_input(eval_results)
                    )
                    self.opt_state = set_learning_rate(
                        self.opt_state, self.scheduler.lr
                    )

            if (epoch + 1) % self.save_every == 0:
                with self._phase("checkpoint_start"):
                    self.save_training()

            with self._phase("callbacks"):
                self.on_finish_epoch(epoch)
        with self._phase("checkpoint_wait"):
            self.wait_for_save()
        # one summary event: the epoch loop's wall clock split into
        # train / evals / the named overhead phases / untimed residual
        loop_s = time.perf_counter() - t_loop0
        accounted = train_s + evals_s + sum(self.phase_seconds.values())
        self.logger.log(
            "train_phases",
            self.epoch_num,
            loop_seconds=round(loop_s, 3),
            train_seconds=round(train_s, 3),
            eval_seconds=round(evals_s, 3),
            residual_seconds=round(max(0.0, loop_s - accounted), 3),
            **{
                f"{k}_seconds": round(v, 3)
                for k, v in sorted(self.phase_seconds.items())
            },
        )

    def _train_one_epoch(self) -> None:
        self._epoch_t0 = time.perf_counter()
        tf = self.model.teacher_forcing
        loader = self.create_train_dataloader()
        accumulate = self.accumulate_grad_every

        if accumulate == 1 and tf not in self._step_fns:
            self._step_fns[tf] = self._make_step_fn(tf)
        if accumulate > 1 and tf not in self._grad_fns:
            self._grad_fns[tf] = self._make_grad_fn(tf)

        acc = None
        last_loss = None
        for it, (batch, arrays) in enumerate(self._epoch_batches(loader)):
            self.on_start_batch(self.iter_num, batch)
            self._rng, step_rng = jax.random.split(self._rng)

            if accumulate == 1:
                self.params, self.opt_state, loss = self._step_fns[tf](
                    self.params, self.opt_state, step_rng, arrays
                )
            else:
                if acc is None:
                    acc = jax.tree.map(jnp.zeros_like, self.params)
                acc, loss = self._grad_fns[tf](self.params, acc, step_rng, arrays)
                if it % accumulate == accumulate - 1:
                    self._apply_accumulated(acc)
                    acc = jax.tree.map(jnp.zeros_like, self.params)

            self.timer.tick(batch.batch_size)
            if self.iter_num % 20 == 0:
                scalars = self._loss_scalars(loss)
                vps = self.timer.items_per_sec
                if vps:
                    scalars["videos_per_sec"] = vps
                scalars["lr"] = (
                    self.scheduler.lr if self.scheduler else self.cfg.trainer.learning_rate
                )
                self.logger.log("train", self.iter_num, **scalars)
            self.on_finish_batch(self.iter_num, batch, loss)
            self.iter_num += 1
            last_loss = loss

        # one synchronous epoch summary (cheap: a single device sync)
        if last_loss is not None:
            scalars = self._loss_scalars(last_loss)
            scalars["epoch_seconds"] = time.perf_counter() - self._epoch_t0
            self.logger.log("epoch", self.epoch_num, **scalars)

    # -- checkpointing (fandak contract) ---------------------------------------
    def _get_checkpointing_folder(self) -> Path:
        folder = self.run_folder / "checkpoints" / f"epoch_{self.epoch_num}"
        folder.mkdir(parents=True, exist_ok=True)
        return folder

    def save_training(self) -> None:
        if self._multihost:
            # one writer per run folder: non-coordinator processes skip
            # checkpointing.  Valid for data/seq meshes (params replicated,
            # so the coordinator's local devices hold every leaf in full);
            # multihost + model-sharded params is rejected at construction
            # (see __init__) until a shard-reassembling save exists.
            from mucon_tpu.parallel.multihost import is_coordinator

            if not is_coordinator():
                return
        state = {
            "epoch_num": self.epoch_num,
            "iter_num": self.iter_num,
            "scheduler": self.scheduler.state_dict() if self.scheduler else None,
        }
        self.wait_for_save()  # one writer at a time
        self._save_thread = save_checkpoint(
            self._get_checkpointing_folder(),
            self.params,
            self.opt_state,
            state,
            async_write=bool(self.cfg.trainer.async_checkpoint),
        )
        self._prune_checkpoints()

    def wait_for_save(self) -> None:
        """Block until any in-flight async checkpoint write finishes."""
        t = getattr(self, "_save_thread", None)
        if t is not None:
            t.join()
            self._save_thread = None

    def _prune_checkpoints(self) -> None:
        """Retention: keep only the newest K epoch checkpoints
        (trainer.keep_last_checkpoints; -1 keeps all)."""
        import shutil

        k = int(self.cfg.trainer.keep_last_checkpoints)
        if k < 0:
            return
        folder = self.run_folder / "checkpoints"
        if not folder.exists():
            return
        epochs = sorted(
            (
                int(p.name.split("_", 1)[1])
                for p in folder.iterdir()
                if p.name.startswith("epoch_") and p.name.split("_", 1)[1].isdigit()
            ),
        )
        for e in epochs[: max(0, len(epochs) - k)]:
            shutil.rmtree(folder / f"epoch_{e}", ignore_errors=True)

    def latest_checkpoint(self, run=None):
        """(run, epoch) of the newest checkpoint, or None.  The recovery
        primitive: a crashed run resumes with
        `trainer.load_training(*trainer.latest_checkpoint())`."""
        run = self.run_number if run is None else run
        folder = self.root / self.exp_name / str(run) / "checkpoints"
        if not folder.exists():
            return None
        epochs = [
            int(p.name.split("_", 1)[1])
            for p in folder.iterdir()
            if p.name.startswith("epoch_") and (p / "model.msgpack").exists()
        ]
        return (str(run), max(epochs)) if epochs else None

    def resume_latest(self, run=None) -> bool:
        """Resume from the newest checkpoint if one exists (elastic
        restart; continues the epoch loop from epoch_num + 1)."""
        found = self.latest_checkpoint(run)
        if found is None:
            return False
        self.load_training(*found)
        self.epoch_num += 1  # the stored epoch finished; continue after it
        return True

    def load_training(self, run, epoch: int) -> None:
        """Restore params/optimizer/counters from <root>/<exp>/<run>/
        checkpoints/epoch_<epoch>/ (reference test_mucon.py:78)."""
        folder = (
            self.root / self.exp_name / str(run) / "checkpoints" / f"epoch_{epoch}"
        )
        params, opt_state, state = load_checkpoint(
            folder, self.params, self.opt_state
        )
        if self.mesh is not None:
            # from_bytes returns HOST arrays; re-commit every leaf to the
            # sharding layout of the live template it replaces (the TP
            # "model"-axis conv channels and the opt state that inherited
            # them) — otherwise the first post-restore step would let jit
            # pick a fresh (replicated) layout and silently recompile
            params = _recommit_like(self.params, params)
            if opt_state is not None:
                opt_state = _recommit_like(self.opt_state, opt_state)
        self.params = params
        if opt_state is not None:
            self.opt_state = opt_state
        self.epoch_num = state.get("epoch_num", epoch)
        self.iter_num = state.get("iter_num", 0)
        if self.scheduler is not None and state.get("scheduler"):
            self.scheduler.load_state_dict(state["scheduler"])
            self.opt_state = set_learning_rate(self.opt_state, self.scheduler.lr)


class TrainerForTFExperiments(SimpleTrainer):
    """Disables teacher forcing after a given epoch (trainers.py:166-191)."""

    def __init__(self, *args, turnoff_tf_after_epoch: int = 1000, **kwargs):
        super().__init__(*args, **kwargs)
        self.turnoff_tf_after_epoch = turnoff_tf_after_epoch

    def on_start_epoch(self, epoch_num: int) -> None:
        self.model.set_teacher_forcing(epoch_num < self.turnoff_tf_after_epoch)
