"""Forward/loss/predict output containers.

Batched, padded equivalents of the reference dataclasses
(models.py:85-131).  Mapping to the reference (per video i):

* `MuConForwardOut.transcript`  [(N+1) x (M+1)]  ->  transcript[i, :N_i+1]
* `MuConForwardOut.lengths`     [N]              ->  lengths[i, :N_i]
* `MuConForwardOut.segmentation`[Tf x M]         ->  segmentation[i, :T_i]
"""

from typing import List

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class MuConForwardOut:
    transcript: jnp.ndarray  # [B x S x (M+1)] per-step log-softmax logits
    lengths: jnp.ndarray  # [B x S] raw (un-normalized) length scalars
    segmentation: jnp.ndarray  # [B x T x M] framewise logits (y head)
    tokens: jnp.ndarray  # [B x S] per-step argmax token ids
    n_steps: jnp.ndarray  # [B] decode-step count actually used (N_i + 1 in
    # teacher-forced/training mode; EOS position + 1 in free decoding)
    tz_lengths: jnp.ndarray  # [B] encoder output lengths (T_i // 16)
    segmentation_z: jnp.ndarray = None  # [B x Tz x M] PRE-upsample head
    # logits: segmentation == nearest-upsample(segmentation_z) row-for-row
    # (the conv and the index selection commute — see mucon.py).  The
    # fused eval program consumes THIS and never materializes the full-T
    # tensor on device (argmax / log-softmax / window sums all commute
    # with the upsample selection — ops/eval_fused.py round 5).


@struct.dataclass
class MuConLoss:
    main: jnp.ndarray
    transcript_loss: jnp.ndarray
    mucon_loss: jnp.ndarray
    length_loss: jnp.ndarray
    smoothing_loss: jnp.ndarray


@struct.dataclass
class MuConFullySupervisedLoss(MuConLoss):
    classification_loss: jnp.ndarray
    supervised_length_loss: jnp.ndarray


class MuConPredictOut:
    """Host-side per-video predictions (reference: models.py:112-131)."""

    def __init__(
        self,
        transcript: List[int],
        lengths: np.ndarray,
        segmentation_logits: np.ndarray,
    ):
        self.transcript = transcript  # includes EOS, length = N + 1
        self.lengths = lengths  # [N] softmaxed, sums to 1
        self.segmentation_logits = segmentation_logits  # [T x M] log-softmax
