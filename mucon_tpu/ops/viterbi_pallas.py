"""Dense single-transcript Viterbi DP as Pallas TPU kernels.

Two formulations (reference DP: /root/reference/src/core/viterbi/viterbi.py,
dense-space derivation in mucon_tpu/ops/viterbi.py):

- `dense_viterbi_pallas_batched` (the routed default): the WHOLE batch in
  one program — state [L x B*N] with batch rows on lanes, so each of the
  K sequential window steps does B*N-lane vector work.  8.65x faster than
  the grid version at B=128 on v5e (round-5 probe).
- `dense_viterbi_pallas` (grid): one program per video, [N x L] state in
  VMEM scratch.  Kept as the fallback when the batched footprint exceeds
  VMEM, and as the small-B path.

The lax.scan formulation (mucon_tpu/ops/viterbi.py) dispatches K ~ T/30
tiny [N x L] updates through XLA's loop machinery; the grid kernel runs
the whole DP in ONE program per video: the [N_max x L_max] score table
lives in VMEM scratch, the window loop is an in-kernel `fori_loop`, and
only the backpointers stream out to HBM.  State is ~8 KB, far under VMEM;
the per-window work is pure VPU max/add — which is exactly why the grid
serializes: B latency-bound programs of tiny tiles (the round-1 lesson,
measured again here at 3.34 ms/batch vs 0.39 batched).

Inputs are the same precomputed tensors the scan version uses:
  W    [K x N_max]    per-window per-position frame scores
  pois [N_max x L_max] Poisson length scores per (position, length bucket)
Scalar-prefetch carries each video's window count and transcript length.
Semantics are identical to `_dense_viterbi_scan` (tested in interpret mode
and against the host oracle).  Hardware note: on unreachable states every
candidate is the same absorbed NEG value, and Mosaic's argmax breaks the
tie by LAST index where XLA picks FIRST — those backpointers are never
visited by the traceback (scores and final states match exactly), so
decoded labels are identical.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mucon_tpu.ops.viterbi import NEG


def _viterbi_kernel(
    s: int,  # static: frame_sampling
    max_len: int,  # static
    kv_ref,  # scalar-prefetch [B] int32: window counts
    nv_ref,  # scalar-prefetch [B] int32: transcript lengths
    w_ref,  # [1 x K x N] window scores
    pois_ref,  # [1 x N x L] poisson scores
    score_ref,  # out [1 x 8 x 128] (scalar at [0,0,0]; tile-padded)
    bestl_ref,  # out [1 x 8 x 128] int32 (scalar at [0,0,0])
    bps_ref,  # out [1 x K-1 x N] int32
    scores,  # VMEM scratch [N x L]
):
    b = pl.program_id(0)
    k_valid = kv_ref[b]
    n_valid = nv_ref[b]
    K = w_ref.shape[1]
    N, L = scores.shape

    n_ids = jax.lax.broadcasted_iota(jnp.int32, (N, L), 0)
    l_ids = jax.lax.broadcasted_iota(jnp.int32, (N, L), 1)
    valid_n_col = n_ids[:, :1] < n_valid  # [N x 1]

    pois = pois_ref[0]  # [N x L]
    # init: window 0 puts (n=0, l=1) at W[0, 0]
    w0 = w_ref[0, 0, 0]
    scores[:] = jnp.where((n_ids == 0) & (l_ids == 0), w0, NEG)

    stay_ok = (l_ids + 2) * s <= max_len  # can the SOURCE bucket grow?

    def body(k, _):
        cur = scores[:]
        w_k = w_ref[0, k, :]  # [N]
        # stay: (n, l) -> (n, l+1): shift right along lanes
        grown = pltpu.roll(jnp.where(stay_ok, cur, NEG), 1, 1)
        grown = jnp.where(l_ids == 0, NEG, grown) + w_k[:, None]
        # advance: best exit of position n-1
        exit_scores = cur + pois
        exit_best = jnp.max(exit_scores, axis=1, keepdims=True)  # [N x 1]
        exit_arg = jnp.argmax(exit_scores, axis=1).astype(jnp.int32)  # [N]
        adv = pltpu.roll(exit_best + w_k[:, None], 1, 0)  # from n-1
        adv = jnp.where((n_ids[:, :1] == 0) | ~valid_n_col, NEG, adv)
        bp = pltpu.roll(exit_arg[:, None], 1, 0)[:, 0]

        new = jnp.where(l_ids == 0, adv, grown)
        new = jnp.where(valid_n_col, new, NEG)

        live = k < k_valid
        scores[:] = jnp.where(live, new, cur)
        bps_ref[0, k - 1, :] = bp
        return 0

    jax.lax.fori_loop(1, K, body, 0)

    # finalize at the last transcript position (row select via masked max)
    last_n = jnp.maximum(n_valid - 1, 0)
    fin = scores[:] + pois  # [N x L]
    fin_row = jnp.max(jnp.where(n_ids == last_n, fin, -jnp.inf), axis=0)
    best_l = jnp.argmax(fin_row).astype(jnp.int32)
    score_ref[0] = jnp.full((8, 128), jnp.max(fin_row), jnp.float32)
    bestl_ref[0] = jnp.full((8, 128), best_l, jnp.int32)


def _viterbi_batched_kernel(
    s: int,  # static: frame_sampling
    max_len: int,  # static
    w_ref,  # [K x R] f32 per-window scores, windows on sublanes
    pois_ref,  # [L x R] f32
    meta_ref,  # [3 x R] int32 rows: (k_valid, n_valid, n position)
    scores_ref,  # out [L x R] f32 — doubles as the DP state
    bps_ref,  # out [K-1 x R] int32
):
    # Layout note: length buckets L ride the SUBLANE dim and the flattened
    # batch rows R = B*N ride LANES — the per-step window-score read and
    # the per-step backpointer store are then dynamic SUBLANE accesses
    # (`w_ref[pl.ds(k, 1), :]`), which Mosaic supports at any offset;
    # dynamic LANE offsets must be 128-aligned and reject this kernel.
    L, R = scores_ref.shape
    K = w_ref.shape[0]

    kv_row = meta_ref[0:1, :]  # [1 x R]
    nv_row = meta_ref[1:2, :]
    n_row = meta_ref[2:3, :]
    nzero = n_row == 0
    valid_n = n_row < nv_row

    l_ids = jax.lax.broadcasted_iota(jnp.int32, (L, R), 0)
    stay_ok = (l_ids + 2) * s <= max_len

    pois = pois_ref[:]

    # init: window 0 puts each video's (n=0, l=1) at W[0]
    scores_ref[:] = jnp.where(nzero & (l_ids == 0), w_ref[0:1, :], NEG)

    def body(k, _):
        cur = scores_ref[:]
        w_row = w_ref[pl.ds(k, 1), :]  # [1 x R]
        # stay: (n, l) -> (n, l+1): shift down sublanes; the l=0 slot
        # (and the value wrapped from l=L-1) is overwritten below
        grown = pltpu.roll(jnp.where(stay_ok, cur, NEG), 1, 0)
        grown = jnp.where(l_ids == 0, NEG, grown) + w_row
        # advance: best exit of position n-1; the lane roll crosses the
        # video boundary at n=0 but that row is masked to NEG (and its
        # backpointer is never consulted — position 0 has no predecessor)
        exit_scores = cur + pois
        exit_best = jnp.max(exit_scores, axis=0, keepdims=True)  # [1 x R]
        # first-index argmax via min-reduce (matches XLA/scan tie-breaking
        # exactly, unlike Mosaic's last-index argmax in the grid kernel)
        exit_arg = jnp.min(
            jnp.where(exit_scores == exit_best, l_ids, L), axis=0,
            keepdims=True,
        ).astype(jnp.int32)
        adv = pltpu.roll(exit_best + w_row, 1, 1)
        adv = jnp.where(nzero | ~valid_n, NEG, adv)
        bp = pltpu.roll(exit_arg, 1, 1)

        new = jnp.where(l_ids == 0, adv, grown)
        new = jnp.where(valid_n, new, NEG)

        live = kv_row > k  # [1 x R] — dead windows freeze the state
        scores_ref[:] = jnp.where(live, new, cur)
        bps_ref[pl.ds(k - 1, 1), :] = bp
        return 0

    jax.lax.fori_loop(1, K, body, 0)


def dense_viterbi_pallas_batched(
    window_scores,  # [B x K x N] f32
    pois,  # [B x N x L] f32
    k_valid,  # [B] int32
    n_valid,  # [B] int32
    frame_sampling: int,
    max_len: int = 2000,
    interpret: bool = False,
):
    """Whole-batch dense Viterbi DP in ONE Pallas program.

    `dense_viterbi_pallas` (below) runs a grid of B per-video programs —
    each fori_loop step touches a tiny [N x L] tile, so the K-step
    sequential chain is latency-bound and the B programs serialize
    (the round-1 "per-video grid" lesson, re-learned here: 3.07 ms/batch
    at B=128, ~29% of the round-5 fused eval).  This version flattens the
    batch into the LANE dim — state [L x B*N], per-window scores [K x B*N]
    sliced along sublanes — so the same K sequential steps each do
    B*N-lane vector work.  Per-video masks ride a [3 x B*N] meta block
    (k_valid, n_valid, position); cross-video wraps of the two rolls land
    only in masked slots (l=0 / n=0).  The finalize (last-position max)
    moves to XLA on the streamed-out final table.  Semantics identical to
    `_dense_viterbi_scan` including FIRST-index argmax ties (min-reduce
    formulation — tighter than the grid kernel's documented last-index
    Mosaic ties).  Returns (score [B], best_l [B], bps [B x K-1 x N]).
    """
    B, K, N = window_scores.shape
    L = pois.shape[2]
    if K < 2:  # degenerate: no transitions — XLA handles it
        from mucon_tpu.ops.viterbi import _dense_viterbi_from_tables

        fn = jax.vmap(
            partial(
                _dense_viterbi_from_tables,
                frame_sampling=frame_sampling,
                max_len=max_len,
                n_max=N,
                l_max=L,
            )
        )
        score, best_l, bps, _ = fn(window_scores, pois, k_valid, n_valid)
        return score, best_l, bps

    R = B * N
    kv = k_valid.astype(jnp.int32)
    nv = n_valid.astype(jnp.int32)
    meta = jnp.stack(
        [
            jnp.repeat(kv, N),
            jnp.repeat(nv, N),
            jnp.tile(jnp.arange(N, dtype=jnp.int32), B),
        ],
        axis=0,
    )  # [3 x R]
    w_kr = jnp.transpose(window_scores, (1, 0, 2)).reshape(K, R)
    pois_lr = jnp.transpose(pois, (2, 0, 1)).reshape(L, R)

    kernel = partial(_viterbi_batched_kernel, frame_sampling, max_len)
    final, bps_kr = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((L, R), jnp.float32),
            jax.ShapeDtypeStruct((K - 1, R), jnp.int32),
        ],
        interpret=interpret,
    )(w_kr, pois_lr, meta)

    bps = bps_kr.reshape(K - 1, B, N).transpose(1, 0, 2)
    # finalize: only the last transcript position may emit END
    fin = final.reshape(L, B, N).transpose(1, 2, 0) + pois
    last_n = jnp.clip(nv - 1, 0, N - 1)
    fin_row = fin[jnp.arange(B), last_n]  # [B x L]
    best_l = jnp.argmax(fin_row, axis=1).astype(jnp.int32)
    score = jnp.max(fin_row, axis=1)
    return score, best_l, bps


def viterbi_batched_vmem_bytes(B, K, N, L):
    """VMEM footprint of the batched program (R on lanes pads to 128;
    sublane dims pad to 8)."""
    R = -(-(B * N) // 128) * 128

    def _pad(x):
        return -(-x // 8) * 8

    return 4 * R * (_pad(K) + 2 * _pad(L) + 8 + _pad(K - 1))


def dense_viterbi_pallas(
    window_scores,  # [B x K x N] f32
    pois,  # [B x N x L] f32
    k_valid,  # [B] int32
    n_valid,  # [B] int32
    frame_sampling: int,
    max_len: int = 2000,
    interpret: bool = False,
):
    """Returns (score [B], best_l [B], bps [B x K-1 x N])."""
    B, K, N = window_scores.shape
    L = pois.shape[2]
    kernel = partial(_viterbi_kernel, frame_sampling, max_len)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, K, N), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, N, L), lambda b, *_: (b, 0, 0)),
        ],
        out_specs=[
            # "scalar" outputs are tile-padded (TPU lowering requires the
            # trailing block dims be (8, 128)-aligned); value sits at [0, 0]
            pl.BlockSpec((1, 8, 128), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, K - 1, N), lambda b, *_: (b, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((N, L), jnp.float32)],
    )
    score, best_l, bps = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, K - 1, N), jnp.int32),
        ],
        interpret=interpret,
    )(
        k_valid.astype(jnp.int32),
        n_valid.astype(jnp.int32),
        window_scores,
        pois,
    )
    return score[:, 0, 0], best_l[:, 0, 0], bps
