"""Dense single-transcript Viterbi decoding on TPU.

The reference decodes with a Python hypothesis-dict DP on the host
(`/root/reference/src/core/viterbi/viterbi.py`), which is the slowest part
of its evaluation.  For the README flow the grammar is always a
`SingleTranscriptGrammar` (evaluators.py:148-150), so the hypothesis space
is EXACTLY (position-in-transcript n, current-segment length l): a dense
[N x L] table.  The unbounded dict DP becomes a fixed-shape `jax.lax.scan`
over strided frame windows with max-reductions — vmappable over a batch of
videos and fully on-device.  Traceback pointers (the argmax segment length
at each transition) stream out of the scan; the cheap O(K) walk happens on
host in numpy.

Score semantics are bit-matched to the reference DP (including the
old-label window attribution on transitions and the remainder-placement
quirk — see mucon_tpu/decode/viterbi_host.py's docstring).  Parity is
enforced by tests/test_viterbi.py against the host oracle.

Precision note: window scores are computed by summing each window's frames
directly (reshape + sum) rather than by cumulative-sum differences — same
math, better f32 conditioning on 10k+-frame videos.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from mucon_tpu.decode.length_model import poisson_log_table
from mucon_tpu.decode.viterbi_host import Segment

NEG = -1e30  # -inf stand-in that survives f32 arithmetic


@dataclass
class DenseDecodeResult:
    score: float
    labels: np.ndarray  # [T] framewise labels
    segments: List[Segment]


def _poisson_rows(lam, lengths):
    """log Poisson(l; lam) with the reference's renormalization quirk
    (length_model.py:51-71): norm uses round(lam) except the factorial term
    which truncates.  lam: [...], lengths: [L] -> [..., L]."""
    lam = lam.astype(jnp.float32)
    r = jnp.round(lam)
    norms = r * jnp.log(r) - r - jax.lax.lgamma(jnp.floor(lam) + 1.0)
    lengths = lengths.astype(jnp.float32)
    logfak = jax.lax.lgamma(lengths + 1.0)
    out = (
        lengths * jnp.log(lam)[..., None]
        - lam[..., None]
        - logfak
        - norms[..., None]
    )
    return jnp.where(lengths > 0, out, NEG)


def viterbi_precompute(
    log_probs,  # [T_pad x M]
    t_valid,  # []
    transcript,  # [n_max]
    class_lambdas,  # [M]
    *,
    frame_sampling: int,
    max_len: int,
    l_max: int,
):
    """Shared DP inputs: per-window per-position scores W [K x n_max],
    Poisson table pois [n_max x l_max], and the true window count."""
    S = frame_sampling
    T_pad, M = log_probs.shape
    K = T_pad // S  # static window count upper bound
    k_valid = t_valid // S  # true window count

    # per-window per-class scores (window sums, not cumsum diffs — better
    # f32 conditioning on long videos): [K x M]
    wsum = jnp.sum(log_probs[: K * S].reshape(K, S, M), axis=1)
    W = wsum[:, jnp.clip(transcript, 0, M - 1)]  # [K x n_max]

    lens = (jnp.arange(l_max) + 1) * S  # lengths in frames: S..l_max*S
    lam = class_lambdas[jnp.clip(transcript, 0, M - 1)]  # [n_max]
    pois = _poisson_rows(lam, lens)  # [n_max x l_max]
    pois = jnp.where(lens[None, :] < max_len, pois, NEG)
    return W, pois, k_valid


def viterbi_precompute_z(
    log_probs_z,  # [Tz x M] PRE-upsample framewise log-probs
    up_idx,  # [T_pad] int32 monotone nearest-upsample source indices
    t_valid,  # []
    transcript,  # [n_max]
    class_lambdas,  # [M]
    *,
    frame_sampling: int,
    max_len: int,
    l_max: int,
):
    """viterbi_precompute from the PRE-upsample logits (round 5).

    The full-T framewise log-probs are a nearest upsample of the Tz-level
    ones (log_softmax commutes with the per-position selection), so each
    window sum Σ_{t in window k} lp[t] equals Σ_s C[k, s] · lp_z[s] with
    C[k, s] = #frames of window k whose source index is s — computed
    EXACTLY from `up_idx` via searchsorted (idx is monotone), no [T x M]
    tensor ever materialized.  The device cost drops from a [B x T x M]
    gather + log_softmax + window reduce (~2.3 ms/batch at B=128,
    Tpad=2560, measured by the round-5 xplane decomposition) to a tiny
    [K x Tz] @ [Tz x M] matmul.  Scores match viterbi_precompute to f32
    reassociation (weighted sum vs repeated adds), ~1e-6."""
    S = frame_sampling
    Tz, M = log_probs_z.shape
    T_pad = up_idx.shape[0]
    K = T_pad // S
    k_valid = t_valid // S

    # C[k, s] = #frames of window k whose source index is s — a direct
    # compare-and-reduce over the window-reshaped idx.  (A searchsorted
    # formulation computes the same counts but lowers to a sequential
    # while + per-element gathers on TPU — measured 2.4 + 2.4 ms/batch
    # at B=128; this fused compare/reduce is VPU-trivial.)
    idx_w = up_idx[: K * S].reshape(K, S)
    C = jnp.sum(
        (idx_w[:, :, None] == jnp.arange(Tz)[None, None, :]).astype(
            log_probs_z.dtype
        ),
        axis=1,
    )  # [K x Tz]
    wsum = C @ log_probs_z  # [K x M]
    W = wsum[:, jnp.clip(transcript, 0, M - 1)]  # [K x n_max]

    lens = (jnp.arange(l_max) + 1) * S
    lam = class_lambdas[jnp.clip(transcript, 0, M - 1)]
    pois = _poisson_rows(lam, lens)
    pois = jnp.where(lens[None, :] < max_len, pois, NEG)
    return W, pois, k_valid


def _dense_viterbi_scan(
    log_probs,  # [T_pad x M] framewise log-probs
    t_valid,  # [] int32: true frame count
    transcript,  # [n_max] int32 (padded)
    n_valid,  # [] int32: true transcript length
    class_lambdas,  # [M] float32 per-class Poisson means
    *,
    frame_sampling: int,
    max_len: int,
    n_max: int,
    l_max: int,
):
    """Core fixed-shape DP. Returns (final_score, best_final_len_idx,
    backptr [K x n_max], n_windows)."""
    S = frame_sampling
    W, pois, k_valid = viterbi_precompute(
        log_probs, t_valid, transcript, class_lambdas,
        frame_sampling=S, max_len=max_len, l_max=l_max,
    )
    return _dense_viterbi_from_tables(
        W, pois, k_valid, n_valid,
        frame_sampling=S, max_len=max_len, n_max=n_max, l_max=l_max,
    )


def _dense_viterbi_from_tables(
    W,  # [K x n_max] per-window per-position scores
    pois,  # [n_max x l_max]
    k_valid,  # [] int32
    n_valid,  # [] int32
    *,
    frame_sampling: int,
    max_len: int,
    n_max: int,
    l_max: int,
):
    """The DP body of _dense_viterbi_scan on precomputed tables (so the
    fused eval can build W from the PRE-upsample logits —
    viterbi_precompute_z)."""
    S = frame_sampling
    K = W.shape[0]

    n_ids = jnp.arange(n_max)
    valid_n = n_ids < n_valid  # [n_max]

    # init: window 0 in state (n=0, l=1)
    init = jnp.full((n_max, l_max), NEG, jnp.float32)
    init = init.at[0, 0].set(W[0, 0])

    stay_ok = (jnp.arange(l_max) + 1 + 1) * S <= max_len  # can we grow to l+1?

    def step(scores, k):
        w_k = W[k]  # [n_max]
        # stay: (n, l) -> (n, l+1)
        grown = jnp.full_like(scores, NEG)
        grown = grown.at[:, 1:].set(
            jnp.where(stay_ok[:-1][None, :], scores[:, :-1], NEG)
        )
        grown = grown + w_k[:, None]
        # advance: (n-1, l) -> (n, 1); window + length scores use OLD label
        exit_best = jnp.max(scores + pois, axis=1)  # [n_max]
        exit_arg = jnp.argmax(scores + pois, axis=1)  # [n_max]
        adv = jnp.full((n_max,), NEG)
        adv = adv.at[1:].set(exit_best[:-1] + w_k[:-1])
        adv = jnp.where(valid_n, adv, NEG)
        bp = jnp.zeros((n_max,), jnp.int32).at[1:].set(exit_arg[:-1])

        # stay can never produce l=1, so the l=1 slot is advance-only
        new_scores = grown.at[:, 0].set(adv)
        new_scores = jnp.where(valid_n[:, None], new_scores, NEG)
        # windows at/after the video end don't change the state
        live = k < k_valid
        out = jnp.where(live, new_scores, scores)
        return out, bp

    ks = jnp.arange(1, K) if K > 1 else jnp.zeros((0,), jnp.int32)
    final_scores, bps = jax.lax.scan(step, init, ks)

    # finalize: only the last transcript position may emit END
    last_n = jnp.clip(n_valid - 1, 0, n_max - 1)
    fin = final_scores[last_n] + pois[last_n]  # [l_max]
    best_l = jnp.argmax(fin)
    best_score = fin[best_l]
    return best_score, best_l, bps, k_valid


@partial(jax.jit, static_argnames=("frame_sampling", "max_len", "n_max", "l_max"))
def _dense_viterbi_scan_batched(
    log_probs, t_valid, transcripts, n_valid, class_lambdas, **static
):
    """One compiled program for the whole batch (vmap INSIDE jit — calling
    vmap eagerly would dispatch the scan op-by-op)."""
    fn = partial(_dense_viterbi_scan, **static)
    return jax.vmap(fn)(log_probs, t_valid, transcripts, n_valid, class_lambdas)


def dense_viterbi_decode(
    log_probs: np.ndarray,
    transcript: List[int],
    class_lambdas: np.ndarray,
    frame_sampling: int = 30,
    max_len: int = 2000,
    n_max: int | None = None,
    t_pad: int | None = None,
) -> DenseDecodeResult:
    """Decode one video. See `dense_viterbi_decode_batch` for the batched path."""
    n = len(transcript)
    n_max = n_max or n
    padded = list(transcript) + [0] * (n_max - n)
    res = dense_viterbi_decode_batch(
        log_probs[None],
        np.array([log_probs.shape[0]]),
        np.array([padded]),
        np.array([n]),
        np.asarray(class_lambdas)[None],
        frame_sampling=frame_sampling,
        max_len=max_len,
        t_pad=t_pad,
    )
    return res[0]


def dense_viterbi_decode_batch(
    log_probs,  # [B x T_pad x M]
    t_valid,  # [B]
    transcripts,  # [B x n_max]
    n_valid,  # [B]
    class_lambdas,  # [B x M]
    frame_sampling: int = 30,
    max_len: int = 2000,
    t_pad: int | None = None,
) -> List[DenseDecodeResult]:
    """Batched dense decode: device scan + host traceback walk."""
    log_probs = np.asarray(log_probs, np.float32)
    B, T, M = log_probs.shape
    if t_pad is not None and t_pad > T:
        log_probs = np.pad(log_probs, ((0, 0), (0, t_pad - T), (0, 0)))
        T = t_pad
    S = frame_sampling
    n_max = transcripts.shape[1]
    l_max = max_len // S  # largest l with stay-reachable length l*S <= max_len

    score, best_l, bps, k_valid = jax.device_get(
        _dense_viterbi_scan_batched(
            jnp.asarray(log_probs),
            jnp.asarray(t_valid, jnp.int32),
            jnp.asarray(transcripts, jnp.int32),
            jnp.asarray(n_valid, jnp.int32),
            jnp.asarray(class_lambdas, jnp.float32),
            frame_sampling=S,
            max_len=max_len,
            n_max=n_max,
            l_max=l_max,
        )
    )

    return host_traceback_batched(
        t_valid, transcripts, n_valid, score, best_l, bps, k_valid, S
    )


def _host_traceback(
    n_frames: int,
    transcript: List[int],
    score: float,
    best_l: int,
    bps: np.ndarray,  # [K-1 x n_max]; row i corresponds to window i+1
    k_valid: int,
    S: int,
) -> DenseDecodeResult:
    """Walk the argmax pointers back into framewise labels + segments,
    reproducing the reference traceback semantics (incl. remainder quirk)."""
    N = len(transcript)
    # position per window, walked newest -> oldest
    n = N - 1
    l = best_l + 1  # 1-based segment length in windows
    pos_rev = []  # transcript position of each window, newest first
    for k in range(k_valid - 1, 0, -1):
        pos_rev.append(n)
        if l > 1:
            l -= 1
        else:
            new_n = n - 1
            l = int(bps[k - 1, n]) + 1  # bps row k-1 <-> window k
            n = new_n
    pos_rev.append(max(n, 0))  # window 0
    positions = list(reversed(pos_rev))  # oldest first

    window_labels = [transcript[min(max(p, 0), N - 1)] for p in positions]
    remainder = n_frames - k_valid * S

    # labels: remainder frames carry the newest label, placed FIRST
    labels = [window_labels[-1]] * remainder
    for wl in window_labels:
        labels.extend([wl] * S)

    # segments: consecutive windows at the same position; remainder length
    # is added to the final segment
    segments: List[Segment] = []
    for p, wl in zip(positions, window_labels):
        if segments and p == prev_p:  # noqa: F821
            segments[-1].length += S
        else:
            segments.append(Segment(wl, S))
        prev_p = p
    if segments:
        segments[-1].length += remainder

    return DenseDecodeResult(score=score, labels=np.array(labels), segments=segments)


def host_traceback_batched(
    t_valid,  # [B] true frame counts
    transcripts,  # [B x n_max] (padded; only the first n_valid[b] entries used)
    n_valid,  # [B] true transcript lengths
    scores,  # [B]
    best_l,  # [B]
    bps,  # [B x K-1 x n_max]
    k_valid,  # [B]
    S: int,
) -> List[DenseDecodeResult]:
    """Vectorized `_host_traceback` over the batch.

    The per-video version walks ~K windows in Python and builds a
    ~T-long Python list per video (~260k list appends at B=128/T=2048),
    which dominates end-to-end eval time on the host.  Here the
    sequential pointer walk runs once over k with [B]-wide numpy ops
    (the walk is independent across videos) and labels come from one
    np.repeat per video.  Output is element-exact vs `_host_traceback`
    (tests/test_viterbi.py pins batched == per-video on random DPs).
    """
    n_valid = np.asarray(n_valid, np.int64)
    bps = np.asarray(bps)
    k_valid = np.asarray(k_valid, np.int64)
    B = n_valid.shape[0]
    K = bps.shape[1] + 1
    rows = np.arange(B)

    n = n_valid - 1
    l = np.asarray(best_l, np.int64) + 1
    pos = np.zeros((B, K), np.int64)
    for k in range(K - 1, 0, -1):
        active = k < k_valid
        pos[:, k] = n
        stay = l > 1
        # bps is consulted only on transitions (l == 1); inactive or
        # staying rows gather a dummy index 0
        idx = np.where(active & ~stay, n, 0)
        bp_l = bps[rows, k - 1, idx].astype(np.int64) + 1
        l_new = np.where(stay, l - 1, bp_l)
        n_new = np.where(stay, n, n - 1)
        l = np.where(active, l_new, l)
        n = np.where(active, n_new, n)
    pos[:, 0] = np.maximum(n, 0)

    return positions_to_results(
        t_valid, transcripts, n_valid, scores, pos, k_valid, S
    )


def traceback_positions_device(bps, k_valid, n_valid, best_l):
    """On-device batched pointer walk: bps [B x K-1 x n_max] -> window
    positions [B x K] (int32).

    Same walk as `host_traceback_batched`, run as a lax.scan inside the
    fused eval program so the full backpointer table never leaves the
    device — at B=128/T_pad=2560 that is 1.29 MB of d2h per batch (the
    single largest eval wire cost over the axon tunnel) replaced by a
    43 KB positions block.  Gathers clamp out-of-range indices (numpy's
    negative-index wrap is only reachable from UNREACHABLE DP states —
    same benign class as the documented argmax-tie divergence)."""
    B, Km1, n_max = bps.shape
    n0 = jnp.asarray(n_valid, jnp.int32) - 1
    l0 = jnp.asarray(best_l, jnp.int32) + 1
    k_valid = jnp.asarray(k_valid, jnp.int32)
    rows = jnp.arange(B)

    if Km1 == 0:
        return jnp.maximum(n0, 0)[:, None]

    # iterate newest -> oldest: xs[i] = (window index k, bps row k-1)
    ks = jnp.arange(Km1, 0, -1, dtype=jnp.int32)
    bps_rev = jnp.flip(bps, axis=1).transpose(1, 0, 2)  # [K-1 x B x n_max]

    def step(carry, x):
        n, l = carry
        k, bp_row = x
        active = k < k_valid
        stay = l > 1
        idx = jnp.clip(jnp.where(active & ~stay, n, 0), 0, n_max - 1)
        bp_l = bp_row[rows, idx].astype(jnp.int32) + 1
        l_new = jnp.where(stay, l - 1, bp_l)
        n_new = jnp.where(stay, n, n - 1)
        return (
            jnp.where(active, n_new, n),
            jnp.where(active, l_new, l),
        ), n  # emit the position BEFORE the update (newest first)

    (n_f, _), pos_rev = jax.lax.scan(step, (n0, l0), (ks, bps_rev))
    pos = jnp.concatenate(
        [jnp.maximum(n_f, 0)[:, None], jnp.flip(pos_rev.T, axis=1)], axis=1
    )
    return pos.astype(jnp.int32)


def positions_to_results(
    t_valid,  # [B] true frame counts
    transcripts,  # [B x n_max]
    n_valid,  # [B]
    scores,  # [B]
    pos,  # [B x K] window positions (host or device walk)
    k_valid,  # [B]
    S: int,
) -> List[DenseDecodeResult]:
    """Expand window positions into framewise labels + segments
    (labels/segments half of the traceback; one np.repeat per video)."""
    t_valid = np.asarray(t_valid, np.int64)
    transcripts = np.asarray(transcripts, np.int64)
    n_valid = np.asarray(n_valid, np.int64)
    scores = np.asarray(scores)
    pos = np.asarray(pos, np.int64)
    k_valid = np.asarray(k_valid, np.int64)
    B = t_valid.shape[0]

    results = []
    for b in range(B):
        kv = int(k_valid[b])
        N = int(n_valid[b])
        nf = int(t_valid[b])
        p = pos[b, :kv]
        wl = transcripts[b, np.clip(p, 0, N - 1)]
        rem = nf - kv * S

        labels = np.empty(nf, np.int64)
        labels[:rem] = wl[-1]  # remainder frames lead with the newest label
        labels[rem:] = np.repeat(wl, S)

        change = np.flatnonzero(np.diff(p)) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [kv]))
        segments = [
            Segment(int(wl[s]), int((e - s) * S))
            for s, e in zip(starts, ends)
        ]
        segments[-1].length += rem
        results.append(
            DenseDecodeResult(
                score=float(scores[b]), labels=labels, segments=segments
            )
        )
    return results
