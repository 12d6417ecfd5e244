"""Padded, bucketed, prefetched batching — the TPU input pipeline.

The reference hard-codes batch size 1 (general_dataset.py:169-173,
trainers.py:100).  On TPU we feed [B x Tpad x D] padded batches instead:

* videos are length-bucketed each epoch (sorted by frame count inside a
  shuffled window) so batch padding waste is small;
* Tpad is rounded up to a configurable multiple so XLA sees a handful of
  static shapes (one compilation per bucket) instead of one per video;
* transcripts are padded to the dataset's max transcript length, so the
  decoder scan has a single static shape;
* every downstream loss/metric consumes the explicit `num_frames` /
  `transcript_len` masks — padding never changes a value (tested).

A small background-thread prefetcher overlaps host npy loading with device
compute (the reference used torch DataLoader workers for the same purpose).
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence

import numpy as np

from mucon_tpu.data.general_dataset import GeneralDataset, Sample


@dataclass
class PaddedBatch:
    """A batch of padded videos (host numpy; device transfer at use site).

    Shapes: B videos, Tpad frames, D features, Nmax transcript slots.
    """

    feats: np.ndarray  # [B x Tpad x D] float32
    num_frames: np.ndarray  # [B] int32 — true T_i
    gt_label: np.ndarray  # [B x Tpad] int32 (0-padded; mask with num_frames)
    transcript: np.ndarray  # [B x Nmax] int32 (0-padded)
    transcript_len: np.ndarray  # [B] int32 — true N_i
    tf_input: np.ndarray  # [B x (Nmax+1)] int32 — SOS + transcript
    tf_target: np.ndarray  # [B x (Nmax+1)] int32 — transcript + EOS
    absolute_lengths: np.ndarray  # [B x Nmax] float32 (zeros when weak)
    fully_supervised: np.ndarray  # [B] bool
    video_names: List[str]

    @property
    def batch_size(self) -> int:
        return self.feats.shape[0]


def collate_padded(
    samples: Sequence[Sample],
    n_max: int,
    pad_multiple: int = 512,
    t_pad: Optional[int] = None,
) -> PaddedBatch:
    """Pad a list of per-video samples into one batch."""
    B = len(samples)
    max_t = max(s.feats.shape[0] for s in samples)
    if t_pad is None:
        t_pad = -(-max_t // pad_multiple) * pad_multiple
    assert t_pad >= max_t and t_pad % 16 == 0, (t_pad, max_t)
    D = samples[0].feats.shape[1]

    feats = np.zeros((B, t_pad, D), np.float32)
    gt = np.zeros((B, t_pad), np.int32)
    num_frames = np.zeros(B, np.int32)
    transcript = np.zeros((B, n_max), np.int32)
    n_len = np.zeros(B, np.int32)
    tf_in = np.zeros((B, n_max + 1), np.int32)
    tf_tg = np.zeros((B, n_max + 1), np.int32)
    abs_len = np.zeros((B, n_max), np.float32)
    full_sup = np.zeros(B, bool)
    names = []

    # bulk pad-copies through the native kernel when layouts match (GIL
    # released for the ~B*Tpad*D*4-byte memcpy; mucon_tpu/native/collate.cpp)
    from mucon_tpu.native import pad_copy_feats_native, pad_copy_labels_native

    feats_done = pad_copy_feats_native(feats, [s.feats for s in samples])
    gt_done = pad_copy_labels_native(gt, [s.gt_label for s in samples])

    for i, s in enumerate(samples):
        t = s.feats.shape[0]
        n = s.transcript.shape[0]
        assert n <= n_max, f"transcript length {n} exceeds n_max {n_max}"
        if not feats_done:
            feats[i, :t] = s.feats
        if not gt_done:
            gt[i, :t] = s.gt_label
        num_frames[i] = t
        transcript[i, :n] = s.transcript
        n_len[i] = n
        tf_in[i, : n + 1] = s.transcript_tf_input
        tf_tg[i, : n + 1] = s.transcript_tf_target
        if getattr(s, "absolute_lengths", None) is not None:
            abs_len[i, :n] = s.absolute_lengths
        full_sup[i] = bool(getattr(s, "fully_supervised", False))
        names.append(s.video_name)

    return PaddedBatch(
        feats=feats,
        num_frames=num_frames,
        gt_label=gt,
        transcript=transcript,
        transcript_len=n_len,
        tf_input=tf_in,
        tf_target=tf_tg,
        absolute_lengths=abs_len,
        fully_supervised=full_sup,
        video_names=names,
    )


class PaddedBatchLoader:
    """Length-bucketed batch iterator with optional background prefetch."""

    def __init__(
        self,
        dataset: GeneralDataset,
        batch_size: int,
        pad_multiple: int = 512,
        shuffle: bool = True,
        seed: int = 0,
        bucket_by_length: bool = True,
        drop_remainder: bool = False,
        prefetch: int = 2,
        fixed_batches: bool = False,
        batch_divisor: int = 1,
        pad_to: Optional[int] = None,
    ):
        """`fixed_batches=True` freezes batch COMPOSITION across epochs
        (length-sorted groups) and shuffles only batch order — this makes
        every batch a stable unit that a device-resident cache can key on
        (see mucon_tpu/harness/trainer.py: the features are static
        pre-extracted I3D, so after epoch 1 no host->device transfer is
        needed at all)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.pad_multiple = pad_multiple
        self.shuffle = shuffle
        self.seed = seed
        self.bucket_by_length = bucket_by_length
        self.drop_remainder = drop_remainder
        self.prefetch = prefetch
        self.fixed_batches = fixed_batches
        # mesh sharding needs every batch's video count divisible by the
        # data axis; a divisible remainder batch is KEPT (it just compiles
        # a second shape), only a non-divisible one is dropped — with a
        # loud one-time warning, since under fixed_batches that drop would
        # silently exclude the same videos every epoch
        self.batch_divisor = max(1, batch_divisor)
        # pad_to: fixed time dimension for EVERY batch (instead of
        # per-batch longest-video rounding) — one compiled shape for the
        # whole pass; used by single-shape evaluation (harness/evaluator)
        self.pad_to = pad_to
        self._warned_drop = False
        self.epoch = 0
        self.n_max = dataset.max_transcript_length
        # frame counts via mmap header reads — cheap one-time pass
        self._lengths = np.array(
            [dataset.num_frames(i) for i in range(len(dataset))]
        )

    def __len__(self) -> int:
        n = len(self.dataset)
        sizes = [self.batch_size] * (n // self.batch_size)
        if n % self.batch_size and not self.drop_remainder:
            sizes.append(n % self.batch_size)
        if self.batch_divisor > 1:
            sizes = [s for s in sizes if s % self.batch_divisor == 0]
        return len(sizes)

    def _filter_batches(self, batches: List[np.ndarray]) -> List[np.ndarray]:
        if self.drop_remainder and len(batches[-1]) < self.batch_size:
            batches = batches[:-1]
        if self.batch_divisor > 1:
            kept = [b for b in batches if len(b) % self.batch_divisor == 0]
            if len(kept) < len(batches) and not self._warned_drop:
                n_lost = sum(len(b) for b in batches) - sum(len(b) for b in kept)
                import warnings

                warnings.warn(
                    f"PaddedBatchLoader: dropping {n_lost} video(s) whose "
                    f"remainder batch is not divisible by the mesh data "
                    f"axis ({self.batch_divisor}); with fixed_batches these "
                    f"are the SAME videos every epoch — pick a batch size "
                    f"so that len(dataset) % batch_size % {self.batch_divisor}"
                    f" == 0 to train on everything",
                    stacklevel=3,
                )
                self._warned_drop = True
            batches = kept
        return batches

    def _batch_indices(self) -> List[np.ndarray]:
        n = len(self.dataset)
        rng = np.random.RandomState(self.seed + self.epoch)
        if self.fixed_batches:
            order = np.argsort(self._lengths, kind="stable")
            batches = [
                order[i : i + self.batch_size]
                for i in range(0, n, self.batch_size)
            ]
            batches = self._filter_batches(batches)
            if self.shuffle:
                rng.shuffle(batches)
            return batches
        order = rng.permutation(n) if self.shuffle else np.arange(n)
        if self.bucket_by_length:
            # stable sort by length within the shuffled order: batches group
            # similar lengths, but epoch-to-epoch composition still varies
            window = max(self.batch_size * 16, self.batch_size)
            chunks = [order[i : i + window] for i in range(0, n, window)]
            order = np.concatenate(
                [c[np.argsort(self._lengths[c], kind="stable")] for c in chunks]
            )
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, n, self.batch_size)
        ]
        batches = self._filter_batches(batches)
        if self.shuffle:
            rng.shuffle(batches)
        return batches

    def iter_cached_keys(self):
        """One epoch's batch plan as (video-name tuple, size) pairs — the
        device-cache keys — computed WITHOUT touching feature data.

        Cache-replay support (harness/trainer.py): with fixed_batches the
        batch COMPOSITION is frozen, so once every batch is device-resident
        an epoch needs only the shuffled batch ORDER; skipping `__iter__`
        avoids re-reading + pad-collating the full feature set (tens of GB
        of numpy work per epoch at Breakfast scale) for arrays the device
        already holds.  Advances the epoch shuffle state exactly like one
        `__iter__` pass."""
        assert self.fixed_batches, "cache replay requires fixed_batches"
        batches = self._batch_indices()
        self.epoch += 1
        names = self.dataset.file_names
        for idxs in batches:
            yield tuple(names[int(i)] for i in idxs), len(idxs)

    def _make_batch(self, idxs: np.ndarray) -> PaddedBatch:
        samples = [self.dataset[int(i)] for i in idxs]
        return collate_padded(
            samples, self.n_max, self.pad_multiple, t_pad=self.pad_to
        )

    def __iter__(self) -> Iterator[PaddedBatch]:
        batches = self._batch_indices()
        self.epoch += 1
        if self.prefetch <= 0:
            for idxs in batches:
                yield self._make_batch(idxs)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            try:
                for idxs in batches:
                    q.put(self._make_batch(idxs))
            except Exception as e:  # surface loader errors to the consumer
                q.put(e)
            q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, Exception):
                raise item
            yield item
