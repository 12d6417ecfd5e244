"""Host-side (numpy) Viterbi decoder with reference-exact semantics.

This is the general hypothesis-expansion DP that works with ANY grammar
(including full path grammars for the research "full decoding" mode).  The
fast path for the README flow — SingleTranscriptGrammar — is the dense
fixed-shape DP on TPU in `mucon_tpu/ops/viterbi.py`; this module is its
score oracle and the fallback for grammars with branching.

Behavioral notes, mirrored from the reference implementation
(`/root/reference/src/core/viterbi/viterbi.py`) because the published vit_*
metrics depend on them:

* Windows of `frame_sampling` frames are scored via cumulative sums; the
  first window ends at frame `frame_sampling - 1`.
* On a label transition processed at window k, the window's FRAME score is
  attributed to the OLD label, while the traceback node (and therefore the
  emitted framewise labels for that window) carry the NEW label
  (viterbi.py:92-123).  This one-window skew is kept.
* The `T mod frame_sampling` remainder frames are labeled with the LAST
  segment's label but placed at the BEGINNING of the returned label
  sequence, while the remainder LENGTH is added to the last segment
  (viterbi.py:140-158).  This is faithfully reproduced (quirk and all).
* Hypothesis pruning sorts by (score, state-key) and keeps the top
  `max_hypotheses` (viterbi.py:74-79).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from mucon_tpu.decode.grammar import Grammar
from mucon_tpu.decode.length_model import LengthModel


@dataclass
class Segment:
    label: int
    length: int


class ViterbiDecoder:
    """Grammar + length-model constrained decode of framewise log-probs."""

    def __init__(
        self,
        grammar: Optional[Grammar],
        length_model: Optional[LengthModel],
        frame_sampling: int = 1,
        max_hypotheses: float = np.inf,
    ):
        self.grammar = grammar
        self.length_model = length_model
        self.frame_sampling = frame_sampling
        self.max_hypotheses = max_hypotheses

    def set_multi_length(self, mode: bool = True) -> None:
        # kept for API parity with the reference (a no-op there too,
        # viterbi.py:40-41)
        pass

    # -- public API -------------------------------------------------------
    def decode(self, log_frame_probs: np.ndarray):
        """Returns (score, framewise labels list, [Segment...])."""
        assert log_frame_probs.shape[1] == self.grammar.n_classes()
        S = self.frame_sampling
        n_frames = log_frame_probs.shape[0]
        cum = np.cumsum(log_frame_probs, axis=0)

        def window_score(t: int, label: int) -> float:
            if t >= S:
                return cum[t, label] - cum[t - S, label]
            return cum[t, label]

        # traceback arena: (label, parent_index, is_boundary)
        nodes: List[Tuple[int, int, bool]] = []

        # state -> (score, node_index); state = (full context incl. current
        # label, current segment length)
        start_ctx = (self.grammar.start_symbol(),)
        hyps: Dict[Tuple[Tuple[int, ...], int], Tuple[float, int]] = {}
        for label in self.grammar.possible_successors(start_ctx):
            sc = self.grammar.score(start_ctx, label) + window_score(S - 1, label)
            nodes.append((label, -1, True))
            self._keep_best(hyps, (start_ctx + (label,), S), sc, len(nodes) - 1)

        for t in range(2 * S - 1, n_frames, S):
            new_hyps: Dict[Tuple[Tuple[int, ...], int], Tuple[float, int]] = {}
            for (ctx, length), (score, node) in hyps.items():
                label = ctx[-1]
                w = window_score(t, label)
                # continue the current segment
                if length + S <= self.length_model.max_length():
                    nodes.append((label, node, False))
                    self._keep_best(
                        new_hyps, (ctx, length + S), score + w, len(nodes) - 1
                    )
                # or transition to a successor label
                len_score = self.length_model.score(length, label)
                for nxt in self.grammar.possible_successors(ctx):
                    if nxt == self.grammar.end_symbol():
                        continue
                    sc = score + w + len_score + self.grammar.score(ctx, nxt)
                    nodes.append((nxt, node, True))
                    self._keep_best(new_hyps, (ctx + (nxt,), S), sc, len(nodes) - 1)
            hyps = new_hyps
            self._prune(hyps)

        # transition to the end symbol
        best_score, best_node = -np.inf, -1
        for (ctx, length), (score, node) in hyps.items():
            label = ctx[-1]
            sc = (
                score
                + self.length_model.score(length, label)
                + self.grammar.score(ctx, self.grammar.end_symbol())
            )
            if sc >= best_score:
                best_score, best_node = sc, node

        labels, segments = self._traceback(nodes, best_node, n_frames)
        return best_score, labels, segments

    # -- internals ------------------------------------------------------------
    @staticmethod
    def _keep_best(hyps, key, score, node) -> None:
        if key not in hyps or hyps[key][0] <= score:
            hyps[key] = (score, node)

    def _prune(self, hyps) -> None:
        if len(hyps) > self.max_hypotheses:
            ranked = sorted((v[0], k) for k, v in hyps.items())
            for _, key in ranked[: len(hyps) - int(self.max_hypotheses)]:
                del hyps[key]

    def _traceback(self, nodes, node_idx: int, n_frames: int):
        S = self.frame_sampling
        if node_idx < 0:  # degenerate input (no surviving hypothesis)
            return [0] * n_frames, [Segment(0, n_frames)]
        newest_label = nodes[node_idx][0]

        # walk newest -> oldest
        rev_labels: List[int] = []
        segments: List[Segment] = [Segment(nodes[node_idx][0], 0)]
        idx = node_idx
        while idx != -1:
            label, parent, boundary = nodes[idx]
            segments[-1].length += S
            rev_labels.extend([label] * S)
            if boundary and parent != -1:
                segments.append(Segment(nodes[parent][0], 0))
            idx = parent

        # remainder quirk (see module docstring): remainder frames carry the
        # newest label but land at the START after reversal
        remainder = n_frames - len(rev_labels)
        segments[0].length += remainder
        rev_labels.extend([newest_label] * remainder)

        return list(reversed(rev_labels)), list(reversed(segments))


# Backwards-compatible alias matching the reference class name
Viterbi = ViterbiDecoder
