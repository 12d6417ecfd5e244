"""Fused BiLSTM recurrence as ONE Pallas TPU program.

The roofline residual of the train/eval step is the sequential scans
(docs/ROOFLINE.md): the BiLSTM recurrence is Tz ~ 128 iterations of tiny
[B x H] @ [H x 4H] matmuls, which XLA runs through its while-loop
machinery with per-iteration overhead that dwarfs the math at B=8.  This
kernel keeps the recurrent weights, the input projections and the (h, c)
state resident in VMEM and runs the whole time loop as an in-kernel
`fori_loop` — the XLA loop overhead disappears and each step is one VMEM
roundtrip.

Division of labor mirrors the scan path (mucon_tpu/models/lstm.py): the
big [B*T x I] @ [I x 4H] input projection stays in XLA (genuinely
MXU-bound), the kernel gets xp with BOTH biases folded in.  Both
directions run in the same program on the same loop (the backward
direction over the valid-prefix-reversed sequence, exactly like the fused
scan).

Semantics match `MaskedBiLSTM`'s fused scan bit-for-bit up to matmul
accumulation order (verified in tests/test_pallas.py); torch nn.LSTM gate
conventions as everywhere else (reference models.py:195-201).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _bilstm_kernel(xp_ref, m_ref, whh_ref, outs_ref, hf_ref, cf_ref):
    """xp [T,2,B,4H] (biases folded), m [T,B,1], w_hh [2,H,4H] ->
    outs [T,2,B,H], final h/c [2,B,H]."""
    T, _, B, _ = xp_ref.shape
    H = whh_ref.shape[1]
    w_f = whh_ref[0]
    w_b = whh_ref[1]

    def cell(xp_d, h, c, w):
        gates = xp_d + jnp.dot(h, w, preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H :])
        c_n = f * c + i * g
        return o * jnp.tanh(c_n), c_n

    def step(t, carry):
        h_f, c_f, h_b, c_b = carry
        m_t = m_ref[t]  # [B, 1] state-freeze mask
        hf_n, cf_n = cell(xp_ref[t, 0], h_f, c_f, w_f)
        hb_n, cb_n = cell(xp_ref[t, 1], h_b, c_b, w_b)
        h_f = m_t * hf_n + (1.0 - m_t) * h_f
        c_f = m_t * cf_n + (1.0 - m_t) * c_f
        h_b = m_t * hb_n + (1.0 - m_t) * h_b
        c_b = m_t * cb_n + (1.0 - m_t) * c_b
        outs_ref[t, 0] = h_f
        outs_ref[t, 1] = h_b
        return h_f, c_f, h_b, c_b

    z = jnp.zeros((B, H), jnp.float32)
    h_f, c_f, h_b, c_b = jax.lax.fori_loop(0, T, step, (z, z, z, z))
    hf_ref[0] = h_f
    hf_ref[1] = h_b
    cf_ref[0] = c_f
    cf_ref[1] = c_b


@partial(jax.jit, static_argnames=("interpret",))
def bilstm_recurrence_pallas(xp, m, w_hh, interpret: bool = False):
    """Run the fused two-direction masked LSTM recurrence in one program.

    xp   [T, 2, B, 4H] float32 — input projections with b_ih AND b_hh
         folded in (time-major so each step's load is contiguous)
    m    [T, B] float32 — 1.0 on valid frames (state freezes at 0.0)
    w_hh [2, H, 4H] float32 — recurrent weights (forward, backward)

    Returns (outs [T, 2, B, H], h_fin [2, B, H], c_fin [2, B, H]).
    """
    T, two, B, H4 = xp.shape
    assert two == 2, xp.shape
    H = H4 // 4
    out_shape = (
        jax.ShapeDtypeStruct((T, 2, B, H), jnp.float32),
        jax.ShapeDtypeStruct((2, B, H), jnp.float32),
        jax.ShapeDtypeStruct((2, B, H), jnp.float32),
    )
    return pl.pallas_call(
        _bilstm_kernel,
        out_shape=out_shape,
        interpret=interpret,
    )(xp.astype(jnp.float32), m[:, :, None].astype(jnp.float32), w_hh)


def bilstm_vmem_bytes(T: int, B: int, H: int) -> int:
    """Resident bytes of one program: xp + outs + weights + state."""
    return 4 * (T * 2 * B * 4 * H + T * 2 * B * H + 2 * H * 4 * H + 4 * B * H)


def bilstm_recurrence_xla(xp, m, w_hh, unroll: int = 1):
    """The lax.scan twin of the kernel (same inputs/outputs) — the A/B
    reference and the fallback when the program exceeds VMEM."""
    T, _, B, H4 = xp.shape
    H = H4 // 4

    def step(carry, inp):
        h, c = carry  # [2, B, H]
        xp_t, m_t = inp  # [2, B, 4H], [B]
        gates = xp_t + jnp.einsum(
            "dbh,dhg->dbg", h, w_hh, preferred_element_type=jnp.float32
        )
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        mm = m_t[None, :, None]
        h = mm * h_new + (1 - mm) * h
        c = mm * c_new + (1 - mm) * c
        return (h, c), h

    init = (jnp.zeros((2, B, H), jnp.float32), jnp.zeros((2, B, H), jnp.float32))
    (h, c), outs = jax.lax.scan(step, init, (xp, m), unroll=unroll)
    return outs, h, c


# ---------------------------------------------------------------------------
# trainable variant: custom VJP with a reverse-chain backward program
# (the decoder-chain recipe — ops/decoder_pallas.py — applied to the
# encoder recurrence).  The fwd program additionally stashes the cell
# trajectory; the bwd program runs ONLY the sequential (dh, dc) reverse
# chain and emits per-step dgate vectors; the w_hh gradient contraction
# happens in XLA from the stashed h trajectory (vectorized over T).
# ---------------------------------------------------------------------------


def _bilstm_train_fwd_kernel(xp_ref, m_ref, whh_ref,
                             outs_ref, hf_ref, cf_ref, cs_ref):
    """Same recurrence as _bilstm_kernel, plus cs [T,2,B,H] cell stash."""
    T, _, B, _ = xp_ref.shape
    H = whh_ref.shape[1]
    w_f = whh_ref[0]
    w_b = whh_ref[1]

    def cell(xp_d, h, c, w):
        gates = xp_d + jnp.dot(h, w, preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H :])
        c_n = f * c + i * g
        return o * jnp.tanh(c_n), c_n

    def step(t, carry):
        h_f, c_f, h_b, c_b = carry
        m_t = m_ref[t]
        hf_n, cf_n = cell(xp_ref[t, 0], h_f, c_f, w_f)
        hb_n, cb_n = cell(xp_ref[t, 1], h_b, c_b, w_b)
        h_f = m_t * hf_n + (1.0 - m_t) * h_f
        c_f = m_t * cf_n + (1.0 - m_t) * c_f
        h_b = m_t * hb_n + (1.0 - m_t) * h_b
        c_b = m_t * cb_n + (1.0 - m_t) * c_b
        outs_ref[t, 0] = h_f
        outs_ref[t, 1] = h_b
        cs_ref[t, 0] = c_f
        cs_ref[t, 1] = c_b
        return h_f, c_f, h_b, c_b

    z = jnp.zeros((B, H), jnp.float32)
    h_f, c_f, h_b, c_b = jax.lax.fori_loop(0, T, step, (z, z, z, z))
    hf_ref[0] = h_f
    hf_ref[1] = h_b
    cf_ref[0] = c_f
    cf_ref[1] = c_b


def _bilstm_bwd_kernel(xp_ref, m_ref, whh_ref, outs_ref, cs_ref,
                       douts_ref, dhf_ref, dcf_ref, dxp_ref):
    """Reverse (dh, dc) chain for both directions; emits dgate (= dxp)
    per step.  Replays each step's gates from the stashed previous state
    (the state-freeze mask makes outs/cs[t-1] exactly the step-t input)."""
    T, _, B, H4 = xp_ref.shape
    H = whh_ref.shape[1]
    ws = (whh_ref[0], whh_ref[1])

    def mm_t(a, b):  # a [B x 4H] @ b^T for b [H x 4H]
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def step(k, carry):
        t = T - 1 - k
        dh_f, dc_f, dh_b, dc_b = carry
        m_t = m_ref[t]
        tp = jnp.maximum(t - 1, 0)
        has_prev = (t > 0).astype(jnp.float32)
        carries = []
        for d, (dh, dc) in enumerate(((dh_f, dc_f), (dh_b, dc_b))):
            h_prev = outs_ref[tp, d] * has_prev
            c_prev = cs_ref[tp, d] * has_prev
            gates = xp_ref[t, d] + jnp.dot(
                h_prev, ws[d], preferred_element_type=jnp.float32
            )
            i = jax.nn.sigmoid(gates[:, :H])
            f = jax.nn.sigmoid(gates[:, H : 2 * H])
            g = jnp.tanh(gates[:, 2 * H : 3 * H])
            o = jax.nn.sigmoid(gates[:, 3 * H :])
            c_new = f * c_prev + i * g
            tc = jnp.tanh(c_new)

            dht = dh + douts_ref[t, d]
            dhn = dht * m_t
            dhp = dht * (1.0 - m_t)
            dcn = dc * m_t
            dcp = dc * (1.0 - m_t)
            do = dhn * tc
            dct = dhn * o * (1.0 - tc * tc) + dcn
            di = dct * g
            df = dct * c_prev
            dg = dct * i
            dgate = jnp.concatenate(
                [
                    di * i * (1.0 - i),
                    df * f * (1.0 - f),
                    dg * (1.0 - g * g),
                    do * o * (1.0 - o),
                ],
                axis=-1,
            )
            dxp_ref[t, d] = dgate
            carries.append(mm_t(dgate, ws[d]) + dhp)
            carries.append(dct * f + dcp)
        return tuple(carries)

    init = (dhf_ref[0], dcf_ref[0], dhf_ref[1], dcf_ref[1])
    jax.lax.fori_loop(0, T, step, init)


def _bilstm_train_call(interpret, xp, m, w_hh):
    T, _, B, H4 = xp.shape
    H = H4 // 4
    outs = (
        jax.ShapeDtypeStruct((T, 2, B, H), jnp.float32),
        jax.ShapeDtypeStruct((2, B, H), jnp.float32),
        jax.ShapeDtypeStruct((2, B, H), jnp.float32),
        jax.ShapeDtypeStruct((T, 2, B, H), jnp.float32),
    )
    return pl.pallas_call(
        _bilstm_train_fwd_kernel, out_shape=outs, interpret=interpret
    )(xp.astype(jnp.float32), m[:, :, None].astype(jnp.float32), w_hh)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def bilstm_recurrence_train(interpret, xp, m, w_hh):
    """Differentiable fused BiLSTM recurrence (train traces).

    Same contract as bilstm_recurrence_pallas: xp [T,2,B,4H] with both
    biases folded, m [T,B] float 1/0, w_hh [2,H,4H]; returns
    (outs [T,2,B,H], h_fin [2,B,H], c_fin [2,B,H])."""
    outs, hf, cf, _ = _bilstm_train_call(interpret, xp, m, w_hh)
    return outs, hf, cf


def _bilstm_train_fwd_rule(interpret, xp, m, w_hh):
    outs, hf, cf, cs = _bilstm_train_call(interpret, xp, m, w_hh)
    return (outs, hf, cf), (xp, m, w_hh, outs, cs)


def _bilstm_train_bwd_rule(interpret, res, cts):
    xp, m, w_hh, outs, cs = res
    douts, dhf, dcf = cts
    T, _, B, H4 = xp.shape
    H = H4 // 4
    (dxp,) = pl.pallas_call(
        _bilstm_bwd_kernel,
        out_shape=(jax.ShapeDtypeStruct((T, 2, B, H4), jnp.float32),),
        interpret=interpret,
    )(xp, m[:, :, None].astype(jnp.float32), w_hh, outs, cs, douts, dhf,
      dcf)
    # w_hh grad in XLA, vectorized over T: gates consumed h_prev = the
    # (state-frozen) output of the previous step
    h_prev = jnp.concatenate(
        [jnp.zeros((1, 2, B, H), jnp.float32), outs[:-1]], axis=0
    )
    dw = jnp.einsum("tdbh,tdbg->dhg", h_prev, dxp)
    return dxp, jnp.zeros_like(m), dw


bilstm_recurrence_train.defvjp(_bilstm_train_fwd_rule, _bilstm_train_bwd_rule)


def bilstm_train_vmem_bytes(T: int, B: int, H: int) -> int:
    """Resident bytes of the BACKWARD program (the larger one):
    xp + dxp + outs/cs/douts + weights + state."""
    return 4 * (2 * T * 2 * B * 4 * H + 3 * T * 2 * B * H
                + 2 * H * 4 * H + 8 * B * H)
