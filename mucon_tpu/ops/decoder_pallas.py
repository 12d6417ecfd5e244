"""Fused teacher-forced attention-decoder recurrence as Pallas TPU programs.

The decoder is the remaining sequential residual of the train step
(docs/ROOFLINE.md): S = max_decoding_steps (~25) scan iterations whose
per-step math — additive attention over Tz encoder states + one LSTM cell —
is far too small ([B x H] matmuls at B=8, H=128) to hide XLA's per-step
while-loop overhead, and the backward scan pays it a second time.

Division of labor (the wavenet-v3 lesson applied to a recurrence):

* the KERNELS run only the true sequential chains — the forward (h, c)
  recurrence and the backward (dh, dc) reverse chain — with the encoder
  block, attention tables and every weight VMEM-resident for the whole
  trajectory, one program each;
* everything vectorizable over S stays in XLA: embedding lookup + dropout
  (upstream of the chain, so the kernels are gather- and prng-free), the
  transcript/length heads + log_softmax/argmax (downstream, from the
  stashed h trajectory), and ALL weight-gradient contractions (computed
  from the per-step gradient vectors the backward kernel emits —
  `dgate/dcpre/dsc` — as big [S*B x ..] matmuls XLA tiles onto the MXU).

Semantics match the flax `DecoderCell` scan (mucon_tpu/models/mucon.py,
reference models.py:641-744) step for step; teacher forcing only (free
decoding feeds the argmax back through the embedding, which stays on the
scan/while_loop path).  Verified against the scan + XLA autodiff in
tests/test_decoder_pallas.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30  # -inf stand-in: exp(_NEG - max) underflows to exactly 0.0
_VMEM_LIMIT = 110 * 1024 * 1024  # Mosaic's 16 MB scoped-vmem default
# OOMs the backward program past ~B=32/Tz=160 (measured: 17.9 MB at
# B=32/Tz=192); v5e has headroom, same limit as the wavenet kernels


# ---------------------------------------------------------------------------
# shared per-step math (traced inside both kernels and the XLA twin)
# ---------------------------------------------------------------------------


def _attention(h, attn_pre, enc, maskf, wl2, bl2, v):
    """One step of additive attention given the carry h [B x H].

    Returns (q, u, a, ctx): query, tanh table [B x Tz x H], softmax
    weights [B x Tz], context [B x E]."""
    q = jnp.dot(h, wl2, preferred_element_type=jnp.float32) + bl2
    u = jnp.tanh(attn_pre + q[:, None, :])
    sc = jnp.sum(u * v[None, None, :], axis=-1)
    sc = jnp.where(maskf > 0, sc, _NEG)
    m = jnp.max(sc, axis=-1, keepdims=True)
    ex = jnp.exp(sc - m) * maskf
    a = ex / jnp.sum(ex, axis=-1, keepdims=True)
    ctx = jnp.sum(a[:, :, None] * enc, axis=1)
    return q, u, a, ctx


def _gates(comb, h, wih, whh, bl):
    g = (
        jnp.dot(comb, wih, preferred_element_type=jnp.float32)
        + jnp.dot(h, whh, preferred_element_type=jnp.float32)
        + bl
    )
    H = whh.shape[0]
    i = jax.nn.sigmoid(g[:, :H])
    f = jax.nn.sigmoid(g[:, H : 2 * H])
    gg = jnp.tanh(g[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(g[:, 3 * H :])
    return i, f, gg, o


def _mm_t(a, b):
    """a [.. x K] @ b^T for b [N x K] — dot_general, no materialized
    transpose (explicit .T inside Mosaic is pathological; CLAUDE.md s4)."""
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------------------
# forward chain kernel
# ---------------------------------------------------------------------------


def _chain_fwd_kernel(
    emb_ref, enc_ref, pre_ref, mask_ref, h0_ref, c0_ref,
    wl2_ref, bl2_ref, v_ref, wc1_ref, wc2_ref, bc_ref,
    wih_ref, whh_ref, bl_ref,
    hs_ref, cs_ref, comb_ref,
):
    S = emb_ref.shape[0]
    enc = enc_ref[...]
    pre = pre_ref[...]
    maskf = mask_ref[...]
    wl2 = wl2_ref[...]
    bl2 = bl2_ref[0]
    v = v_ref[0]
    wc1 = wc1_ref[...]
    wc2 = wc2_ref[...]
    bc = bc_ref[0]
    wih = wih_ref[...]
    whh = whh_ref[...]
    bl = bl_ref[0]

    def step(s, carry):
        h, c = carry
        e = emb_ref[s]
        _, _, _, ctx = _attention(h, pre, enc, maskf, wl2, bl2, v)
        cpre = (
            jnp.dot(e, wc1, preferred_element_type=jnp.float32)
            + jnp.dot(ctx, wc2, preferred_element_type=jnp.float32)
            + bc
        )
        comb = jnp.maximum(cpre, 0.0)
        i, f, g, o = _gates(comb, h, wih, whh, bl)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        hs_ref[s] = h
        cs_ref[s] = c
        comb_ref[s] = comb
        return h, c

    jax.lax.fori_loop(0, S, step, (h0_ref[...], c0_ref[...]))


# ---------------------------------------------------------------------------
# backward chain kernel
# ---------------------------------------------------------------------------


def _chain_bwd_kernel(
    emb_ref, enc_ref, pre_ref, mask_ref, hin_ref, cin_ref,
    wl2_ref, bl2_ref, v_ref, wc1_ref, wc2_ref, bc_ref,
    wih_ref, whh_ref, bl_ref,
    dh_ext_ref, dc_ext_ref, dcomb_ext_ref,
    dgate_ref, dcpre_ref, dsc_ref, dh0_ref, dc0_ref,
):
    S, B, H = hin_ref.shape
    enc = enc_ref[...]
    pre = pre_ref[...]
    maskf = mask_ref[...]
    wl2 = wl2_ref[...]
    bl2 = bl2_ref[0]
    v = v_ref[0]
    wc1 = wc1_ref[...]
    wc2 = wc2_ref[...]
    bc = bc_ref[0]
    wih = wih_ref[...]
    whh = whh_ref[...]
    bl = bl_ref[0]

    def step(k, carry):
        s = S - 1 - k
        dh_c, dc_c = carry
        h = hin_ref[s]
        c = cin_ref[s]
        e = emb_ref[s]

        # replay the step from the stashed input state
        _, u, a, ctx = _attention(h, pre, enc, maskf, wl2, bl2, v)
        cpre = (
            jnp.dot(e, wc1, preferred_element_type=jnp.float32)
            + jnp.dot(ctx, wc2, preferred_element_type=jnp.float32)
            + bc
        )
        comb = jnp.maximum(cpre, 0.0)
        i, f, g, o = _gates(comb, h, wih, whh, bl)
        c_out = f * c + i * g
        tc = jnp.tanh(c_out)

        # reverse chain
        dh = dh_c + dh_ext_ref[s]
        dc = dc_c + dc_ext_ref[s]
        do = dh * tc
        dct = dh * o * (1.0 - tc * tc) + dc
        di = dct * g
        df = dct * c
        dg = dct * i
        dc_c = dct * f
        dgate = jnp.concatenate(
            [
                di * i * (1.0 - i),
                df * f * (1.0 - f),
                dg * (1.0 - g * g),
                do * o * (1.0 - o),
            ],
            axis=-1,
        )
        dcomb = _mm_t(dgate, wih) + dcomb_ext_ref[s]
        dh_p = _mm_t(dgate, whh)
        dcpre = dcomb * (cpre > 0.0).astype(jnp.float32)
        dctx = _mm_t(dcpre, wc2)
        da = jnp.sum(dctx[:, None, :] * enc, axis=-1)
        dsc = a * (da - jnp.sum(a * da, axis=-1, keepdims=True))
        dup = dsc[:, :, None] * v[None, None, :] * (1.0 - u * u)
        dq = jnp.sum(dup, axis=1)
        dh_c = dh_p + _mm_t(dq, wl2)

        dgate_ref[s] = dgate
        dcpre_ref[s] = dcpre
        dsc_ref[s] = dsc
        return dh_c, dc_c

    z = jnp.zeros((B, H), jnp.float32)
    dh_c, dc_c = jax.lax.fori_loop(0, S, step, (z, z))
    dh0_ref[...] = dh_c
    dc0_ref[...] = dc_c


# ---------------------------------------------------------------------------
# custom-vjp chain
# ---------------------------------------------------------------------------


def _row(x):
    """1-D vector -> [1, N] block (Mosaic-friendly 2-D ref)."""
    return x.reshape(1, -1).astype(jnp.float32)


def _chain_call(interpret, emb, enc, pre, maskf, h0, c0,
                wl2, bl2, v, wc1, wc2, bc, wih, whh, bl):
    S, B, H = emb.shape[0], emb.shape[1], whh.shape[0]
    outs = (
        jax.ShapeDtypeStruct((S, B, H), jnp.float32),
        jax.ShapeDtypeStruct((S, B, H), jnp.float32),
        jax.ShapeDtypeStruct((S, B, H), jnp.float32),
    )
    return pl.pallas_call(
        _chain_fwd_kernel,
        out_shape=outs,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(
        emb, enc, pre, maskf, h0, c0,
        wl2, _row(bl2), _row(v), wc1, wc2, _row(bc), wih, whh, _row(bl),
    )


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def decoder_chain(interpret, emb, enc, pre, maskf, h0, c0,
                  wl2, bl2, v, wc1, wc2, bc, wih, whh, bl):
    """The sequential (h, c) chain of the teacher-forced decoder, one
    Pallas program for all S steps.

    emb   [S x B x H]  embedded+activated+dropped teacher-forced inputs
    enc   [B x Tz x E] encoder outputs (E = 2H bidirectional)
    pre   [B x Tz x H] attention pre-projection enc @ W1
    maskf [B x Tz]     1.0 on valid encoder frames
    h0/c0 [B x H]      decoder init state
    wl2/bl2            attention l2 (query) projection [H x H]/[H]
    v     [H]          attention score vector
    wc1/wc2/bc         attn_combine split: emb rows [H x H], ctx rows
                       [E x H], bias [H]
    wih/whh/bl         LSTM cell [H x 4H] x2, folded bias [4H]

    Returns (hs [S x B x H], cs [S x B x H], comb [S x B x H]) — the
    post-step hidden/cell trajectories and the pre-LSTM combined
    activation (the two tensors the heads need)."""
    return _chain_call(interpret, emb, enc, pre, maskf, h0, c0,
                       wl2, bl2, v, wc1, wc2, bc, wih, whh, bl)


def _chain_fwd_rule(interpret, emb, enc, pre, maskf, h0, c0,
                    wl2, bl2, v, wc1, wc2, bc, wih, whh, bl):
    hs, cs, comb = _chain_call(interpret, emb, enc, pre, maskf, h0, c0,
                               wl2, bl2, v, wc1, wc2, bc, wih, whh, bl)
    res = (emb, enc, pre, maskf, h0, c0, wl2, bl2, v, wc1, wc2, bc,
           wih, whh, bl, hs, cs, comb)
    return (hs, cs, comb), res


def _chain_bwd_rule(interpret, res, cts):
    (emb, enc, pre, maskf, h0, c0, wl2, bl2, v, wc1, wc2, bc,
     wih, whh, bl, hs, cs, comb) = res
    dhs, dcs, dcomb_ext = cts
    S, B, H = emb.shape
    Tz = enc.shape[1]

    # input-state trajectories (step s consumed h_in[s] = hs[s-1])
    h_in = jnp.concatenate([h0[None], hs[:-1]], axis=0)
    c_in = jnp.concatenate([c0[None], cs[:-1]], axis=0)

    outs = (
        jax.ShapeDtypeStruct((S, B, 4 * H), jnp.float32),
        jax.ShapeDtypeStruct((S, B, H), jnp.float32),
        jax.ShapeDtypeStruct((S, B, Tz), jnp.float32),
        jax.ShapeDtypeStruct((B, H), jnp.float32),
        jax.ShapeDtypeStruct((B, H), jnp.float32),
    )
    dgate, dcpre, dsc, dh0, dc0 = pl.pallas_call(
        _chain_bwd_kernel,
        out_shape=outs,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(
        emb, enc, pre, maskf, h_in, c_in,
        wl2, _row(bl2), _row(v), wc1, wc2, _row(bc), wih, whh, _row(bl),
        dhs, dcs, dcomb_ext,
    )

    # everything below is vectorized over S — XLA territory.  Recompute
    # the attention tables once for the whole trajectory (no chain).
    q_all = h_in @ wl2 + bl2
    u_all = jnp.tanh(pre[None] + q_all[:, :, None, :])  # [S x B x Tz x H]
    sc = jnp.sum(u_all * v[None, None, None, :], axis=-1)
    sc = jnp.where(maskf[None] > 0, sc, _NEG)
    a_all = jax.nn.softmax(sc, axis=-1) * maskf[None]
    ctx_all = jnp.einsum("sbt,bte->sbe", a_all, enc)

    d_emb = _mm_t(dcpre, wc1)
    dctx = _mm_t(dcpre, wc2)
    d_enc = jnp.einsum("sbt,sbe->bte", a_all, dctx)
    dup = dsc[..., None] * v * (1.0 - u_all * u_all)
    d_pre = jnp.sum(dup, axis=0)
    dq = jnp.sum(dup, axis=2)  # [S x B x H]

    def contract(x, y):  # sum_{s,b} x[s,b,:] (x) y[s,b,:]
        return jax.lax.dot_general(
            x.reshape(-1, x.shape[-1]), y.reshape(-1, y.shape[-1]),
            (((0,), (0,)), ((), ())),
        )

    d_wl2 = contract(h_in, dq)
    d_bl2 = jnp.sum(dq, axis=(0, 1))
    d_v = jnp.einsum("sbth,sbt->h", u_all, dsc)
    d_wc1 = contract(emb, dcpre)
    d_wc2 = contract(ctx_all, dcpre)
    d_bc = jnp.sum(dcpre, axis=(0, 1))
    d_wih = contract(comb, dgate)
    d_whh = contract(h_in, dgate)
    d_bl = jnp.sum(dgate, axis=(0, 1))

    return (d_emb, d_enc, d_pre, jnp.zeros_like(maskf), dh0, dc0,
            d_wl2, d_bl2, d_v, d_wc1, d_wc2, d_bc, d_wih, d_whh, d_bl)


decoder_chain.defvjp(_chain_fwd_rule, _chain_bwd_rule)


# ---------------------------------------------------------------------------
# XLA twin (fallback + oracle) and the shared heads glue
# ---------------------------------------------------------------------------


def decoder_chain_xla(emb, enc, pre, maskf, h0, c0,
                      wl2, bl2, v, wc1, wc2, bc, wih, whh, bl,
                      unroll: int = 1):
    """lax.scan twin of `decoder_chain` — same step math, differentiable
    by XLA autodiff; the A/B reference and the routing fallback."""

    def step(carry, e):
        h, c = carry
        _, _, _, ctx = _attention(h, pre, enc, maskf, wl2, bl2, v)
        cpre = e @ wc1 + ctx @ wc2 + bc
        comb = jnp.maximum(cpre, 0.0)
        i, f, g, o = _gates(comb, h, wih, whh, bl)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), (h, c, comb)

    _, (hs, cs, comb) = jax.lax.scan(step, (h0, c0), emb, unroll=unroll)
    return hs, cs, comb


def decoder_heads(hs, comb, w_tf, b_tf, w_to, b_to, w_lf, b_lf, w_lo, b_lo):
    """Transcript + length heads over the whole trajectory at once
    (reference models.py:250-274, 697-705).  `s_input = relu(concat(
    combined, logits))` decomposes as a split matmul: `combined` is
    already ReLU-output, so relu(concat) = (comb, relu(logits))."""
    H = hs.shape[-1]
    th = jnp.maximum(hs @ w_tf + b_tf, 0.0)
    logits = th @ w_to + b_to
    lh = jnp.maximum(
        comb @ w_lf[:H] + jnp.maximum(logits, 0.0) @ w_lf[H:] + b_lf, 0.0
    )
    lengths = (lh @ w_lo)[..., 0] + b_lo
    return logits, lengths


def pack_decoder_chain_params(dp, enc_dim: int):
    """Split the flax `decoder` param subtree (mucon_tpu DecoderCell) into
    the chain's packed arrays.  Packing is traced, so autodiff distributes
    the folded-bias and split-matmul gradients back to the flax leaves."""
    wl2 = dp["attention_l2"]["kernel"]
    bl2 = dp["attention_l2"]["bias"]
    v = dp["attention_V"]
    wc = dp["attn_combine"]["kernel"]
    H = wl2.shape[0]
    wc1, wc2 = wc[:H], wc[H : H + enc_dim]
    bc = dp["attn_combine"]["bias"]
    wih = dp["lstm"]["w_ih"]
    whh = dp["lstm"]["w_hh"]
    bl = dp["lstm"]["b_ih"] + dp["lstm"]["b_hh"]
    return wl2, bl2, v, wc1, wc2, bc, wih, whh, bl


def decoder_teacher_forced(dp, emb, enc, pre, maskf, h0, c0,
                           use_kernel: bool, interpret: bool = False,
                           unroll: int = 1):
    """Full teacher-forced decode from pre-embedded inputs: chain (Pallas
    or scan) + vectorized heads + log_softmax/argmax.

    dp: the flax `decoder` param subtree.  Returns (logprobs [S x B x M+1],
    lengths [S x B], tokens [S x B]) — the scan branch's layout."""
    packed = pack_decoder_chain_params(dp, enc.shape[-1])
    f32 = lambda x: x.astype(jnp.float32)
    args = (f32(emb), f32(enc), f32(pre), f32(maskf), f32(h0), f32(c0),
            *(f32(p) for p in packed))
    if use_kernel:
        hs, cs, comb = decoder_chain(interpret, *args)
    else:
        hs, cs, comb = decoder_chain_xla(*args, unroll=unroll)
    logits, lengths = decoder_heads(
        hs, comb,
        dp["transcript_fc"]["kernel"], dp["transcript_fc"]["bias"],
        dp["transcript_out"]["kernel"], dp["transcript_out"]["bias"],
        dp["length_fc"]["kernel"], dp["length_fc"]["bias"],
        dp["length_out"]["kernel"], dp["length_out"]["bias"],
    )
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tokens = jnp.argmax(logprobs, axis=-1).astype(jnp.int32)
    return logprobs, lengths.astype(jnp.float32), tokens


def decoder_chain_vmem_bytes(S, B, Tz, H, E) -> int:
    """Resident bytes of the BACKWARD program (the larger of the two):
    trajectory blocks + encoder/attention tables + weights + the
    [B x Tz x H] working set of one attention replay."""
    traj = S * B * (8 * H + 4 * H + Tz)  # emb/hin/cin/dh/dc/dcomb/outs + dgate + dsc
    tables = B * Tz * (E + H + 1)
    weights = 2 * H * H + E * H + 2 * H * 4 * H + 6 * H
    work = 3 * B * Tz * H
    return 4 * (traj + tables + weights + work)
