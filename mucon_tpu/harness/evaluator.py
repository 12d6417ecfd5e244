"""Evaluation: the 24-field MuCon result with Viterbi decoding.

Port of the reference evaluator semantics (src/mucon/evaluators.py):

* free decoding (teacher forcing off; the alignment evaluator turns it on);
* transcript metrics on the s-head transcript (EOS dropped);
* Viterbi decode of the y-head log-softmax constrained to the s-head's own
  transcript, with a per-class Poisson length model whose means are the
  s-head's predicted lengths averaged per class via the one-hot trick
  (evaluators.py:146-180);
* s-head framewise prediction by repeating the transcript with rounded
  relative lengths (evaluators.py:28-35);
* all predictions nearest-interpolated to the GT length, then fed to the
  18 segmentation + 2 transcript + 6 edit/F1 metric objects;
* per-video raw outputs pickled for offline visualization (save_stuff).

TPU design: the model forward runs on padded device batches; the Viterbi DP
runs as the batched dense scan on device (mucon_tpu/ops/viterbi.py) instead
of the reference's per-video host Python DP — the host only does the O(K)
traceback walk and the numpy metric updates.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from mucon_tpu.data.batching import PaddedBatch, PaddedBatchLoader
from mucon_tpu.decode.length_model import PoissonModel
from mucon_tpu.decode.grammar import SingleTranscriptGrammar
from mucon_tpu.decode.viterbi_host import ViterbiDecoder
from mucon_tpu.metrics import (
    AbsLenDiffMetric,
    Edit,
    F1Score,
    IoDMetric,
    IoUMetric,
    MatchingScoreMetric,
    Metric,
    MoFAccuracyMetric,
)
from mucon_tpu.models.model import batch_to_arrays, resolve_pallas_flag
from mucon_tpu.ops.viterbi import (
    dense_viterbi_decode_batch,
    positions_to_results,
)
from mucon_tpu.utils import make_same_size_interpolate


def create_segmentation_from_segments(
    actions: np.ndarray, lengths: np.ndarray, n_frames: int
) -> np.ndarray:
    """Expand (transcript, relative lengths) to frames (evaluators.py:28-35)."""
    lengths = lengths * n_frames
    lengths = np.around(lengths).astype(int)
    lengths[lengths < 0] = 0
    return np.repeat(actions, lengths)


def one_hot(a: np.ndarray, num_classes: int) -> np.ndarray:
    return np.eye(num_classes)[a.reshape(-1)]


@dataclass
class MuConEvaluatorResult:
    """24 metric fields (reference evaluators.py:38-67)."""

    y_mof: float
    y_mof_nbg: float
    y_iod: float
    y_iou: float

    s_mof: float
    s_mof_nbg: float
    s_iod: float
    s_iou: float
    s_iod_nbg: float
    s_iou_nbg: float

    s_mat_score: float
    s_len_diff: float

    vit_mof: float
    vit_mof_nbg: float
    vit_iod: float
    vit_iou: float
    vit_iod_nbg: float
    vit_iou_nbg: float

    vit_edit_score: float
    vit_f1_score: Tuple[float, float, float]
    y_edit_score: float
    y_f1_score: Tuple[float, float, float]
    s_edit_score: float
    s_f1_score: Tuple[float, float, float]


class MuConEvaluator:
    """fandak-Evaluator-equivalent (SURVEY.md §2.11, §2.14)."""

    def __init__(self, cfg, test_db, model, device=None):
        self.cfg = cfg
        self.test_db = test_db
        self.model = model
        self.device = device
        self.name = "eval"
        self.checkpointing_folder: Optional[Path] = None
        # device-cache byte budget: the owning trainer injects its own
        # (shared) budget; standalone evaluators build one lazily from cfg
        self.cache_budget = None

        self.enable_viterbi = False
        self.viterbi_multi_length = cfg.evaluator.viterbi.multi_length
        self.frame_sampling = cfg.evaluator.viterbi.frame_sampling
        self.viterbi_backend = cfg.evaluator.viterbi.backend
        # API-parity attribute (reference evaluators.py:80); grammar and
        # length model are installed per video on the host backend path
        self.vi_decoder = ViterbiDecoder(
            None, None, frame_sampling=self.frame_sampling
        )

        bg = test_db.background_class_ids

        self.y_mof_metric = MoFAccuracyMetric()
        self.y_mof_nbg_metric = MoFAccuracyMetric(ignore_ids=bg)
        self.y_iod_metric = IoDMetric()
        self.y_iou_metric = IoUMetric()

        self.s_mof_metric = MoFAccuracyMetric()
        self.s_mof_nbg_metric = MoFAccuracyMetric(ignore_ids=bg)
        self.s_iod_metric = IoDMetric()
        self.s_iou_metric = IoUMetric()
        self.s_iod_nbg_metric = IoDMetric(ignore_ids=bg)
        self.s_iou_nbg_metric = IoUMetric(ignore_ids=bg)

        self.vit_mof_metric = MoFAccuracyMetric()
        self.vit_mof_nbg_metric = MoFAccuracyMetric(ignore_ids=bg)
        self.vit_iod_metric = IoDMetric()
        self.vit_iou_metric = IoUMetric()
        self.vit_iod_nbg_metric = IoDMetric(ignore_ids=bg)
        self.vit_iou_nbg_metric = IoUMetric(ignore_ids=bg)

        self.s_mat_score_metric = MatchingScoreMetric()
        self.s_abs_len_diff_metric = AbsLenDiffMetric()

        self.vit_edit_score_metric = Edit()
        self.y_edit_score_metric = Edit()
        self.s_edit_score_metric = Edit()
        self.vit_f1_score_metric = F1Score()
        self.y_f1_score_metric = F1Score()
        self.s_f1_score_metric = F1Score()

    # -- mode switches ------------------------------------------------------
    def viterbi_mode(self, mode: bool = True) -> None:
        self.enable_viterbi = mode

    def get_name(self) -> str:
        return self.name

    def set_name(self, name: str) -> None:
        self.name = name

    def set_checkpointing_folder(self, folder: Path) -> None:
        self.checkpointing_folder = Path(folder)

    # -- main loop --------------------------------------------------------------
    def _fused_backend(self) -> bool:
        """Static: will evaluate() run the fused device path?"""
        return (
            self.viterbi_backend == "device"
            and not self.viterbi_multi_length
        )

    def _single_shape(self) -> bool:
        """Pad the WHOLE eval pass to one (batch_size, T_max) shape
        (tpu.eval_single_shape, fused path only).  Motivation (VERDICT
        r3 #4): eval device compute is tiny (252 Breakfast-scale videos
        ≈ 70 ms at the measured ~11 Mframes/s ceiling) but every
        length-bucket shape compiles its own fused program — minutes
        each cold over the remote compile service, repeated per distinct
        (B, T_pad).  One shape = one compile; padding exactness is a
        framework invariant (padded rows/frames are masked and sliced
        off by _consume_fused)."""
        return bool(
            getattr(self.cfg.tpu, "eval_single_shape", False)
        ) and self._fused_backend()

    def _eval_pad_to(self):
        if not self._single_shape():
            return None
        import numpy as np

        t_max = max(
            self.test_db.num_frames(i) for i in range(len(self.test_db))
        )
        pm = self.cfg.tpu.pad_multiple
        return int(-(-t_max // pm) * pm)

    def create_dataloader(self) -> PaddedBatchLoader:
        return PaddedBatchLoader(
            self.test_db,
            batch_size=max(1, self.cfg.tpu.batch_size),
            pad_multiple=self.cfg.tpu.pad_multiple,
            shuffle=False,
            bucket_by_length=True,
            prefetch=2,
            pad_to=self._eval_pad_to(),
        )

    def on_start_eval(self) -> None:
        # free decoding unless we're the alignment evaluator
        self.model.set_teacher_forcing(False)
        self.y_segs, self.s_segs, self.vit_segs = [], [], []
        self.s_lens, self.s_transcript = [], []
        self.target_segs, self.target_transcripts = [], []
        for attrname in dir(self):
            attr = getattr(self, attrname)
            if isinstance(attr, Metric):
                attr.reset()

    def evaluate(self, params) -> MuConEvaluatorResult:
        import time as _time

        self.on_start_eval()
        # wall-clock decomposition of one evaluation pass (VERDICT r3 #4):
        # stream = batch fetch (disk+collate+transfer, or cache replay),
        # first_dispatch = the first program call (includes compile),
        # dispatch = remaining program calls, consume = host traceback +
        # metric updates, finish = aggregation.  Logged by the trainer
        # per periodic eval.
        ph = dict(stream=0.0, first_dispatch=0.0, dispatch=0.0,
                  consume=0.0, finish=0.0)
        self.last_eval_phases = ph
        fused = (
            self.viterbi_backend == "device"
            and not self.viterbi_multi_length
        )
        if fused:
            # pipelined: dispatch batch k+d's device program and START the
            # async d2h copy of its outputs right away; consume (traceback +
            # metric updates) only outputs whose copies have LANDED
            # (is_ready), so the host never blocks mid-stream while the
            # device still has work.  Measured on v5e over the axon tunnel
            # (scripts/probe_eval_async_tpu.py, B=128 Tpad=2560): blocking
            # device_get 41.7 ms/batch, fixed depth-3 21.0, is_ready drain
            # 16.3 — within 6% of the 15.4 ms dispatch-only bound.  The
            # depth cap (tpu.eval_pipeline_depth) bounds resident output
            # trees (~0.4 MB each at B=128) if the host falls behind.
            from collections import deque

            import jax

            max_depth = max(2, int(self.cfg.tpu.eval_pipeline_depth))
            prog = None
            pending: deque = deque()

            # Multi-process: the program's outputs are sharded over the
            # global "data" axis, so a process can only d2h its OWN rows.
            # One compiled identity with replicated out_shardings all-
            # gathers every batch's (small, packed) outputs onto every
            # process — each process then consumes ALL videos and computes
            # the identical full 24-field result, so no cross-process
            # metric merge machinery is needed.  The wire is the packed
            # 2-leaf format (~0.4 MB/batch at B=128): gathering it is
            # cheap next to the fused program itself.
            replicate = None
            if jax.process_count() > 1:
                from jax.sharding import NamedSharding, PartitionSpec

                if self._eval_mesh() is None:
                    raise RuntimeError(
                        "multi-process evaluation requires the mesh "
                        "(tpu.mesh.enable=True): without it there is no "
                        "global sharding to address another process's "
                        "rows through — plain device_put of the full "
                        "batch is meaningless in a multi-process run"
                    )
                repl = NamedSharding(self._eval_mesh(), PartitionSpec())
                replicate = jax.jit(lambda t: t, out_shardings=repl)

            def _consume_next():
                t0 = _time.perf_counter()
                b, out = pending.popleft()
                self._consume_fused(b, jax.device_get(out))
                ph["consume"] += _time.perf_counter() - t0

            def _head_ready():
                return pending and all(
                    leaf.is_ready()
                    for leaf in jax.tree.leaves(pending[0][1])
                )

            batches = iter(self._eval_batches())
            first = True
            while True:
                t0 = _time.perf_counter()
                nxt = next(batches, None)
                ph["stream"] += _time.perf_counter() - t0
                if nxt is None:
                    break
                batch, arrays = nxt
                t0 = _time.perf_counter()
                if prog is None:
                    prog = self._get_fused_program()
                out = prog(params, arrays)
                if replicate is not None:
                    out = replicate(out)
                for leaf in jax.tree.leaves(out):
                    leaf.copy_to_host_async()
                ph["first_dispatch" if first else "dispatch"] += (
                    _time.perf_counter() - t0
                )
                first = False
                pending.append((batch, out))
                while _head_ready():
                    _consume_next()
                if len(pending) > max_depth:
                    _consume_next()
            while pending:
                _consume_next()
        else:
            import jax

            if jax.process_count() > 1:
                raise RuntimeError(
                    "multihost evaluation requires the fused device "
                    "backend (evaluator.viterbi.backend='device', "
                    "multi_length=false): the host-oracle path moves "
                    "full batches to device 0, which does not exist as "
                    "an addressable whole in a multi-process run"
                )
            for batch in self.create_dataloader():
                # host-backend (oracle) path: never mesh-pad — predict()
                # and the metric loops index the UNPADDED batch
                arrays = (
                    self._batch_arrays(batch)
                    if self._eval_mesh() is None
                    else batch_to_arrays(batch)
                )
                fwd = self.model.forward(params, arrays, train=False)
                self.batch_eval_calculation(batch, fwd)
        t0 = _time.perf_counter()
        result = self.on_finish_eval()
        ph["finish"] = _time.perf_counter() - t0
        return result

    def _eval_mesh(self):
        """Mesh for sharded evaluation (tpu.mesh.enable; lazy, cached)."""
        import jax

        if not (self.cfg.tpu.mesh.enable and len(jax.devices()) > 1):
            return None
        if not hasattr(self, "_mesh"):
            if getattr(self.cfg.tpu.mesh, "multihost", False):
                # multi-process run: same DCN x ICI hybrid mesh the trainer
                # builds (parallel/multihost.py); single process delegates
                # to make_mesh so the math is identical either way
                from mucon_tpu.parallel.multihost import make_multihost_mesh

                self._mesh = make_multihost_mesh(
                    self.cfg.tpu.mesh.data,
                    self.cfg.tpu.mesh.seq,
                    int(getattr(self.cfg.tpu.mesh, "model", 1)),
                )
            else:
                from mucon_tpu.parallel.mesh import mesh_from_config

                self._mesh = mesh_from_config(self.cfg)
        return self._mesh

    def _eval_feats_dtype(self):
        """tpu.eval_feats_transfer_dtype: eval feature wire format.
        float32 (default) keeps exact metric parity; float16/bfloat16
        halve eval HBM + wire bytes (the model upcasts on device)."""
        from mucon_tpu.models.model import resolve_eval_feats_dtype

        return resolve_eval_feats_dtype(self.cfg)

    def _make_arrays(self, batch: PaddedBatch) -> dict:
        mesh = self._eval_mesh()
        if mesh is None:
            if self._single_shape():
                # row-pad the remainder batch to batch_size with dummy
                # videos (same mechanism as the mesh path below) so the
                # whole pass is ONE compiled shape; _consume_fused
                # slices outputs back to batch.batch_size
                import jax

                from mucon_tpu.models.model import batch_to_host_arrays
                from mucon_tpu.parallel.mesh import pad_batch_to_multiple

                arrays = batch_to_host_arrays(
                    batch, feats_dtype=self._eval_feats_dtype()
                )
                arrays = pad_batch_to_multiple(
                    arrays, max(1, self.cfg.tpu.batch_size)
                )
                import jax.numpy as jnp

                return {k: jnp.asarray(v) for k, v in arrays.items()}
            return batch_to_arrays(batch, feats_dtype=self._eval_feats_dtype())
        # eval must score EVERY video, so short batches are padded with
        # dummy videos (loss is never computed here) and their outputs are
        # discarded by the per-video loops, which run over batch.batch_size
        from mucon_tpu.models.model import batch_to_host_arrays
        from mucon_tpu.parallel.mesh import (
            pad_batch_to_multiple,
            shard_batch_arrays,
        )

        arrays = batch_to_host_arrays(
            batch, feats_dtype=self._eval_feats_dtype()
        )
        # single-shape eval pads rows all the way to batch_size (itself
        # mesh-divisible by the trainer contract); otherwise just to the
        # next data-axis multiple
        arrays = pad_batch_to_multiple(
            arrays,
            max(1, self.cfg.tpu.batch_size)
            if self._single_shape()
            else mesh.shape["data"],
        )
        import jax

        if jax.process_count() > 1:
            # multi-process: each host moves only ITS rows of the padded
            # global batch (same contract as the trainer's multihost path)
            from mucon_tpu.parallel.multihost import (
                process_batch_slice,
                shard_batch_arrays_multihost,
            )

            sl = process_batch_slice(arrays["num_frames"].shape[0], mesh)
            return shard_batch_arrays_multihost(
                mesh, {k: v[sl] for k, v in arrays.items()}
            )
        return shard_batch_arrays(self._mesh, arrays)

    def _eval_batches(self):
        """(host batch, device arrays) pairs for one evaluation pass.

        The eval set is fixed (shuffle=False, deterministic bucketing), so
        after one pass in which EVERY batch's device arrays fit the cache
        budget, later evaluations replay (metadata batch, device arrays)
        pairs directly — no disk reads, no pad-collate, no transfer.  The
        metric loops need only the small label/transcript fields, so the
        replayed host batch drops the feature block (at Breakfast scale
        ~3.4 GB of host numpy per eval otherwise; measured motivation in
        docs/TIMED_RUN.md — periodic evals were ~45 s for 4 batches whose
        device programs total <1 s).  Mirrors the trainer's cache replay
        (harness/trainer.py::_epoch_batches)."""
        replay = getattr(self, "_fused_replay", None)
        if replay is not None:
            yield from replay
            return
        import dataclasses

        import numpy as np

        recording = [] if self.cfg.tpu.cache_batches else None
        for batch in self.create_dataloader():
            arrays = self._batch_arrays(batch)
            if recording is not None:
                cached = (
                    getattr(self, "_array_cache", {}).get(
                        tuple(batch.video_names)
                    )
                    is arrays
                )
                if cached:
                    # keep .shape[1] (Tpad) valid but free the data
                    meta = dataclasses.replace(
                        batch,
                        feats=np.empty(
                            (batch.feats.shape[0], batch.feats.shape[1], 0),
                            np.float32,
                        ),
                    )
                    recording.append((meta, arrays))
                else:  # budget miss: replay would skip streaming batches
                    recording = None
            yield batch, arrays
        if recording:
            self._fused_replay = recording

    def _batch_arrays(self, batch: PaddedBatch) -> dict:
        """Eval batches are fixed (shuffle=False): with tpu.cache_batches
        the device arrays persist across the per-epoch evaluations."""
        if not self.cfg.tpu.cache_batches:
            return self._make_arrays(batch)
        if not hasattr(self, "_array_cache"):
            self._array_cache = {}
        key = tuple(batch.video_names)
        arrays = self._array_cache.get(key)
        if arrays is None:
            import jax

            arrays = self._make_arrays(batch)
            if self._eval_mesh() is None:  # sharded arrays are already placed
                arrays = {k: jax.device_put(v) for k, v in arrays.items()}
            if self.cache_budget is None:
                from mucon_tpu.harness.cache import CacheBudget

                self.cache_budget = CacheBudget.from_config(self.cfg)
            from mucon_tpu.harness.cache import arrays_nbytes

            if self.cache_budget.try_reserve(
                arrays_nbytes(arrays), "eval batch", pool="eval"
            ):
                self._array_cache[key] = arrays
        return arrays

    # -- fused device path ------------------------------------------------
    def _get_fused_program(self):
        tf = self.model.teacher_forcing
        key = ("fused_eval", tf, self.frame_sampling)
        prog = getattr(self, "_fused_cache", {}).get(key)
        if prog is None:
            from mucon_tpu.ops.eval_fused import build_fused_eval
            from mucon_tpu.parallel.mesh import mesh_is_data_only

            mesh = self._eval_mesh()
            # a data-only mesh with kernels enabled runs the whole fused
            # program per shard via shard_map — the mesh path keeps the
            # benchmarked Pallas kernels (VERDICT r2 #1); seq/model meshes
            # (or kernels off) fall back to GSPMD-partitioned XLA
            shardmap = (
                mesh is not None
                and mesh_is_data_only(mesh)
                and self.model.kernels_active(train=False)
            )
            kernels = resolve_pallas_flag(self.cfg.tpu.use_pallas) and (
                mesh is None or shardmap
            )
            prog = build_fused_eval(
                self.model,
                teacher_forcing=tf,
                frame_sampling=self.frame_sampling,
                use_pallas_viterbi=kernels,
                use_pallas_forward=mesh is None or shardmap,
                mesh=mesh if shardmap else None,
            )
            if not hasattr(self, "_fused_cache"):
                self._fused_cache = {}
            self._fused_cache[key] = prog
        return prog

    def _consume_fused(self, batch: PaddedBatch, out: dict) -> None:
        """Host half of one fused device program (mucon_tpu/ops/
        eval_fused.py): wire unpack, tracebacks and numpy metric updates."""
        from mucon_tpu.ops.eval_fused import unpack_eval_wire

        # y labels travel at Tz; unpack upsamples them on host.  Device
        # output rows may exceed the true batch (single-shape / sharded
        # eval pads with dummy videos) — pad num_frames to match; every
        # consumer below slices per video to t_i, so t_full only needs
        # to cover the longest real video (replayed host batches carry
        # no feats block to read a pad width from).
        nf = np.asarray(batch.num_frames)
        rows = np.asarray(out["y_argmax"]).shape[0]
        if rows > nf.shape[0]:
            nf = np.concatenate(
                [nf, np.ones(rows - nf.shape[0], nf.dtype)]
            )
        out = unpack_eval_wire(
            out,
            n_steps_dim=self.model.max_decoding_steps,
            n_max=batch.transcript.shape[1],
            num_frames=nf,
            t_full=int(nf.max()),
        )
        B = batch.batch_size

        s_transcripts, s_rel_lengths = [], []
        for i in range(B):
            n = int(out["n_dec"][i])
            s_transcripts.append([int(x) for x in out["transcripts"][i, :n]])
            s_rel_lengths.append(out["rel_lengths"][i, :n])
        if self.enable_viterbi:
            # slice to the true batch (sharded eval pads with dummy videos);
            # the pointer walk already ran on device (vit_pos)
            vit_labels = [
                r.labels
                for r in positions_to_results(
                    batch.num_frames[:B],
                    out["transcripts"][:B],
                    out["n_dec"][:B],
                    out["vit_score"][:B],
                    out["vit_pos"][:B],
                    out["vit_k_valid"][:B],
                    self.frame_sampling,
                )
            ]
        else:
            vit_labels = [None] * B

        # reference predict() semantics for what the transcript metrics see:
        # teacher forcing -> GT + EOS with EOS dropped == GT (same list)
        self._feed_all_metrics(
            batch,
            y_pred_full=out["y_argmax"],
            s_transcripts=s_transcripts,
            s_rel_lengths=s_rel_lengths,
            vit_labels=vit_labels,
        )

    def _feed_all_metrics(
        self, batch, y_pred_full, s_transcripts, s_rel_lengths, vit_labels
    ) -> None:
        for i in range(batch.batch_size):
            t_i = int(batch.num_frames[i])
            n_i = int(batch.transcript_len[i])
            target_labels = np.asarray(batch.gt_label[i, :t_i])
            target_transcript = list(batch.transcript[i, :n_i])

            self.s_mat_score_metric.add(
                target_transcript=target_transcript,
                predicted_transcript=s_transcripts[i],
            )
            self.s_abs_len_diff_metric.add(
                target_transcript=target_transcript,
                predicted_transcript=s_transcripts[i],
            )

            y_pred = np.asarray(y_pred_full[i][:t_i])
            s_pred = create_segmentation_from_segments(
                actions=np.asarray(s_transcripts[i], dtype=np.int64),
                lengths=np.asarray(s_rel_lengths[i])[: len(s_transcripts[i])],
                n_frames=t_i,
            )
            if s_pred.size == 0:
                s_pred = np.zeros(t_i, np.int64)

            s_same = make_same_size_interpolate(s_pred, target_labels)
            y_same = make_same_size_interpolate(y_pred, target_labels)

            for m in (
                self.s_mof_metric, self.s_mof_nbg_metric, self.s_iod_metric,
                self.s_iod_nbg_metric, self.s_iou_metric, self.s_iou_nbg_metric,
                self.s_edit_score_metric, self.s_f1_score_metric,
            ):
                m(targets=target_labels, predictions=s_same)
            for m in (
                self.y_mof_metric, self.y_mof_nbg_metric, self.y_iod_metric,
                self.y_iou_metric, self.y_edit_score_metric,
                self.y_f1_score_metric,
            ):
                m(targets=target_labels, predictions=y_same)

            if self.enable_viterbi and vit_labels[i] is not None:
                vit_same = make_same_size_interpolate(vit_labels[i], target_labels)
                for m in (
                    self.vit_mof_metric, self.vit_mof_nbg_metric,
                    self.vit_iod_metric, self.vit_iod_nbg_metric,
                    self.vit_iou_metric, self.vit_iou_nbg_metric,
                    self.vit_edit_score_metric, self.vit_f1_score_metric,
                ):
                    m(targets=target_labels, predictions=vit_same)
                self.vit_segs.append(vit_same)
            else:
                self.vit_segs.append(s_same)

            self.y_segs.append(y_same)
            self.s_segs.append(s_same)
            self.s_lens.append(np.asarray(s_rel_lengths[i]))
            self.s_transcript.append(s_transcripts[i])
            self.target_segs.append(target_labels)
            self.target_transcripts.append(target_transcript)

    # -- per-batch ---------------------------------------------------------------
    def batch_eval_calculation(self, batch: PaddedBatch, fwd) -> None:
        preds = self.model.predict(batch, fwd)
        M = self.test_db.get_num_classes()
        B = batch.batch_size

        # per-video s-head predictions (EOS dropped)
        s_transcripts = [p.transcript[:-1] for p in preds]
        s_rel_lengths = [np.asarray(p.lengths) for p in preds]

        vit_labels: List[Optional[np.ndarray]] = [None] * B
        if self.enable_viterbi:
            vit_labels = self._decode_viterbi_batch(
                batch, preds, s_transcripts, s_rel_lengths, M
            )

        for i in range(B):
            t_i = int(batch.num_frames[i])
            n_i = int(batch.transcript_len[i])
            target_labels = np.asarray(batch.gt_label[i, :t_i])
            target_transcript = list(batch.transcript[i, :n_i])

            self.s_mat_score_metric.add(
                target_transcript=target_transcript,
                predicted_transcript=s_transcripts[i],
            )
            self.s_abs_len_diff_metric.add(
                target_transcript=target_transcript,
                predicted_transcript=s_transcripts[i],
            )

            y_pred = np.argmax(preds[i].segmentation_logits, axis=1)
            s_pred = create_segmentation_from_segments(
                actions=np.asarray(s_transcripts[i], dtype=np.int64),
                lengths=s_rel_lengths[i][: len(s_transcripts[i])],
                n_frames=t_i,
            )
            if s_pred.size == 0:
                s_pred = np.zeros(t_i, np.int64)

            s_same = make_same_size_interpolate(s_pred, target_labels)
            y_same = make_same_size_interpolate(y_pred, target_labels)

            for m in (
                self.s_mof_metric, self.s_mof_nbg_metric, self.s_iod_metric,
                self.s_iod_nbg_metric, self.s_iou_metric, self.s_iou_nbg_metric,
                self.s_edit_score_metric, self.s_f1_score_metric,
            ):
                m(targets=target_labels, predictions=s_same)
            for m in (
                self.y_mof_metric, self.y_mof_nbg_metric, self.y_iod_metric,
                self.y_iou_metric, self.y_edit_score_metric,
                self.y_f1_score_metric,
            ):
                m(targets=target_labels, predictions=y_same)

            if self.enable_viterbi:
                vit_same = make_same_size_interpolate(vit_labels[i], target_labels)
                for m in (
                    self.vit_mof_metric, self.vit_mof_nbg_metric,
                    self.vit_iod_metric, self.vit_iod_nbg_metric,
                    self.vit_iou_metric, self.vit_iou_nbg_metric,
                    self.vit_edit_score_metric, self.vit_f1_score_metric,
                ):
                    m(targets=target_labels, predictions=vit_same)
                self.vit_segs.append(vit_same)
            else:
                self.vit_segs.append(s_same)

            self.y_segs.append(y_same)
            self.s_segs.append(s_same)
            self.s_lens.append(s_rel_lengths[i])
            self.s_transcript.append(s_transcripts[i])
            self.target_segs.append(target_labels)
            self.target_transcripts.append(target_transcript)

    def _decode_viterbi_batch(self, batch, preds, s_transcripts, s_rel_lengths, M):
        """Per-class Poisson means from the s-head (evaluators.py:152-168),
        then dense device decode (or the host oracle when configured)."""
        B = batch.batch_size
        all_lambdas = np.ones((B, M), np.float64)
        transcripts, n_valid = [], []
        n_max = max(1, max(len(t) for t in s_transcripts))

        for i in range(B):
            tr = [t for t in s_transcripts[i] if 0 <= t < M]
            if not tr:  # degenerate: decode against background only
                tr = [0]
            t_i = int(batch.num_frames[i])
            actions = one_hot(np.array(tr), M)
            lam = np.dot(s_rel_lengths[i][: len(tr)], actions) * t_i
            k = actions.sum(0)
            k[k == 0] = 1
            lam /= k
            lam[lam == 0] = 1
            all_lambdas[i] = lam
            transcripts.append(tr + [0] * (n_max - len(tr)))
            n_valid.append(len(tr))

        if self.viterbi_backend == "host":
            out = []
            for i in range(B):
                self.vi_decoder.grammar = SingleTranscriptGrammar(
                    transcripts[i][: n_valid[i]], M
                )
                self.vi_decoder.length_model = PoissonModel(all_lambdas[i])
                self.vi_decoder.set_multi_length(False)
                _, labels, _ = self.vi_decoder.decode(
                    preds[i].segmentation_logits.astype(np.float64)
                )
                out.append(np.asarray(labels))
            return out

        # device dense DP over the whole padded batch
        t_pad = int(batch.feats.shape[1])
        log_probs = np.zeros((B, t_pad, M), np.float32)
        for i in range(B):
            t_i = int(batch.num_frames[i])
            log_probs[i, :t_i] = preds[i].segmentation_logits
        results = dense_viterbi_decode_batch(
            log_probs,
            batch.num_frames,
            np.asarray(transcripts, np.int32),
            np.asarray(n_valid, np.int32),
            all_lambdas.astype(np.float32),
            frame_sampling=self.frame_sampling,
        )
        return [r.labels for r in results]

    # -- finish -----------------------------------------------------------------
    def on_finish_eval(self) -> MuConEvaluatorResult:
        self.to_save = {
            "y_segs": self.y_segs,
            "s_segs": self.s_segs,
            "vit_segs": self.vit_segs,
            "s_lens": self.s_lens,
            "s_transcript": self.s_transcript,
            "target_segs": self.target_segs,
            "target_transcripts": self.target_transcripts,
        }
        return MuConEvaluatorResult(
            s_mat_score=self.s_mat_score_metric.summary(),
            s_len_diff=self.s_abs_len_diff_metric.summary(),
            s_mof=self.s_mof_metric.summary(),
            s_mof_nbg=self.s_mof_nbg_metric.summary(),
            s_iod=self.s_iod_metric.summary(),
            s_iod_nbg=self.s_iod_nbg_metric.summary(),
            s_iou=self.s_iou_metric.summary(),
            s_iou_nbg=self.s_iou_nbg_metric.summary(),
            y_mof=self.y_mof_metric.summary(),
            y_mof_nbg=self.y_mof_nbg_metric.summary(),
            y_iod=self.y_iod_metric.summary(),
            y_iou=self.y_iou_metric.summary(),
            vit_mof=self.vit_mof_metric.summary(),
            vit_mof_nbg=self.vit_mof_nbg_metric.summary(),
            vit_iod=self.vit_iod_metric.summary(),
            vit_iod_nbg=self.vit_iod_nbg_metric.summary(),
            vit_iou=self.vit_iou_metric.summary(),
            vit_iou_nbg=self.vit_iou_nbg_metric.summary(),
            y_edit_score=self.y_edit_score_metric.summary(),
            y_f1_score=tuple(self.y_f1_score_metric.summary()),
            s_edit_score=self.s_edit_score_metric.summary(),
            s_f1_score=tuple(self.s_f1_score_metric.summary()),
            vit_edit_score=self.vit_edit_score_metric.summary(),
            vit_f1_score=tuple(self.vit_f1_score_metric.summary()),
        )

    def save_stuff(self) -> None:
        assert self.checkpointing_folder is not None
        import jax

        if jax.process_count() > 1:
            # one writer per run folder (the replicated consume gives every
            # process identical to_save contents — writing any one copy is
            # the complete artifact)
            from mucon_tpu.parallel.multihost import is_coordinator

            if not is_coordinator():
                return
        self.checkpointing_folder.mkdir(parents=True, exist_ok=True)
        with open(self.checkpointing_folder / f"data_{self.name}.pkl", "wb") as f:
            pickle.dump(self.to_save, f)


class MuConAlignmentEvaluator(MuConEvaluator):
    """Action *alignment*: decode with the GT transcript (teacher forcing)
    — reference evaluators.py:343-347."""

    def on_start_eval(self) -> None:
        super().on_start_eval()
        self.model.set_teacher_forcing(True)
