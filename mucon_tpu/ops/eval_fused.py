"""Fused device-side evaluation program: forward + Viterbi prep + dense DP.

The naive eval path pulls each video's [T x M] log-probs to the host
(predict), re-derives the Poisson means there, and pushes the matrix back
for decoding.  This program keeps everything on device in ONE jitted call:

    forward (free or teacher-forced decode)
    -> log_softmax framewise logits, argmax labels
    -> s-head transcript + masked-softmax relative lengths
    -> per-class Poisson means via the one-hot averaging trick
       (reference evaluators.py:152-168, vectorized as a scatter-add)
    -> batched dense Viterbi scan (mucon_tpu/ops/viterbi.py)

    -> batched backpointer walk (traceback_positions_device)

Only small tensors reach the host: argmax labels [B x T] (int8), tokens,
lengths, and per-window transcript positions [B x K] — the backpointer
table itself never leaves the device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def build_fused_eval(model, teacher_forcing: bool, frame_sampling: int,
                     max_len: int = 2000, use_pallas_viterbi: bool = False,
                     use_pallas_forward: bool = True):
    """Returns a jitted fn(params, arrays) -> dict of host-ready outputs.

    `use_pallas_forward=False` forces the XLA forward (needed when the
    inputs are sharded over a mesh — the fused single-device kernels don't
    partition; GSPMD shards the XLA graph instead)."""
    S = frame_sampling

    @jax.jit
    def run(params, arrays):
        fwd = model.forward(
            params, arrays, train=False, teacher_forcing=teacher_forcing,
            use_pallas=None if use_pallas_forward else False,
        )
        B, T, M = fwd.segmentation.shape
        seg_lp = jax.nn.log_softmax(fwd.segmentation, axis=-1)
        y_argmax = jnp.argmax(seg_lp, axis=-1).astype(jnp.int32)

        n_max = arrays["transcript"].shape[1]
        steps = jnp.arange(fwd.lengths.shape[1])

        if teacher_forcing:
            # alignment mode: GT transcript, lengths over the first N steps
            trs = arrays["transcript"]
            n_dec = arrays["transcript_len"]
        else:
            # free decode: EOS-dropped predicted transcript
            n_dec = jnp.maximum(fwd.n_steps - 1, 1)
            toks = fwd.tokens[:, :n_max]
            trs = jnp.where(toks >= M, 0, toks)
        trs = jnp.where(steps[None, :n_max] < n_dec[:, None], trs, 0)

        # relative lengths: softmax over the first n_dec raw scalars
        len_valid = steps[None, :] < n_dec[:, None]
        logits = jnp.where(len_valid, fwd.lengths, -jnp.inf)
        rel = jax.nn.softmax(logits, axis=1)  # [B x S_steps]

        # per-class Poisson means, one-hot averaging (evaluators.py:152-168)
        tr_1hot = jax.nn.one_hot(trs, M) * len_valid[:, :n_max, None]
        lam_sum = jnp.einsum("bs,bsm->bm", rel[:, :n_max], tr_1hot)
        lam = lam_sum * arrays["num_frames"].astype(jnp.float32)[:, None]
        count = jnp.sum(tr_1hot, axis=1)
        lam = lam / jnp.maximum(count, 1.0)
        lam = jnp.where(lam == 0.0, 1.0, lam)

        l_max = max_len // S
        if use_pallas_viterbi:
            from mucon_tpu.ops.viterbi import viterbi_precompute
            from mucon_tpu.ops.viterbi_pallas import dense_viterbi_pallas

            W, pois, k_valid = jax.vmap(
                partial(
                    viterbi_precompute,
                    frame_sampling=S,
                    max_len=max_len,
                    l_max=l_max,
                )
            )(seg_lp, arrays["num_frames"], trs, lam)
            score, best_l, bps = dense_viterbi_pallas(
                W, pois, k_valid, n_dec,
                frame_sampling=S, max_len=max_len,
                interpret=jax.default_backend() == "cpu",
            )
        else:
            from mucon_tpu.ops.viterbi import _dense_viterbi_scan

            decode = jax.vmap(
                partial(
                    _dense_viterbi_scan,
                    frame_sampling=S,
                    max_len=max_len,
                    n_max=n_max,
                    l_max=l_max,
                )
            )
            score, best_l, bps, k_valid = decode(
                seg_lp, arrays["num_frames"], trs, n_dec, lam
            )

        # on-device pointer walk: ship [B x K] positions (~43 KB at
        # B=128) instead of the [B x K-1 x n_max] backpointer table
        # (~1.3 MB) — the largest d2h cost of the eval batch
        from mucon_tpu.ops.viterbi import traceback_positions_device

        vit_pos = traceback_positions_device(bps, k_valid, n_dec, best_l)

        # int8 labels halve-and-half the y wire (M < 128 always here)
        y_wire = y_argmax.astype(jnp.int8) if M < 128 else y_argmax

        return dict(
            y_argmax=y_wire,
            tokens=fwd.tokens,
            n_steps=fwd.n_steps,
            rel_lengths=rel,
            n_dec=n_dec,
            transcripts=trs,
            vit_score=score,
            vit_best_l=best_l,
            vit_pos=vit_pos,
            vit_k_valid=k_valid,
        )

    return run
