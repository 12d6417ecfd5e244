"""LSTM cells and masked (bi)directional LSTMs as `jax.lax.scan`s.

torch LSTM gate conventions (gate order i, f, g, o; two bias vectors) are
reproduced so weights are interchangeable and training dynamics match the
reference's nn.LSTM encoder/decoder (models.py:195-201, 245-249).

TPU notes: the input projection x @ W_ih for ALL timesteps is hoisted out of
the scan into one large MXU matmul; the sequential part only carries the
h @ W_hh recurrence.  Padded timesteps are masked so the carried state
freezes at each video's last valid frame — the final (h, c) equal what an
exact-length LSTM would produce.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mucon_tpu.models.layers import time_mask, torch_lstm_init
from mucon_tpu.models.routing import log_route, resolve_pallas_flag


def lstm_step(x_proj, h, c, w_hh, b_hh):
    """One LSTM step given a precomputed input projection [B x 4H]."""
    gates = x_proj + h @ w_hh + b_hh
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


class LSTMCellParams(nn.Module):
    """Parameter container for one torch-layout LSTM cell."""

    input_size: int
    hidden_size: int

    def setup(self):
        H, I = self.hidden_size, self.input_size
        init = torch_lstm_init(H)
        self.w_ih = self.param("w_ih", init, (I, 4 * H))
        self.w_hh = self.param("w_hh", init, (H, 4 * H))
        self.b_ih = self.param("b_ih", init, (4 * H,))
        self.b_hh = self.param("b_hh", init, (4 * H,))

    def __call__(self, x, h, c):
        return lstm_step(x @ self.w_ih + self.b_ih, h, c, self.w_hh, self.b_hh)

    def project_inputs(self, xs):
        """[B x T x I] -> [B x T x 4H] hoisted input projection."""
        return xs @ self.w_ih + self.b_ih


def _scan_direction(cell: LSTMCellParams, xs, mask, unroll: int = 1):
    """Run one direction over [B x T x I] with state-freezing mask [B x T].

    Returns (outputs [B x T x H], (h_final, c_final))."""
    B, T, _ = xs.shape
    H = cell.hidden_size
    x_proj = cell.project_inputs(xs)  # one big MXU matmul
    w_hh, b_hh = cell.w_hh, cell.b_hh

    def step(carry, inp):
        h, c = carry
        xp, m = inp  # [B x 4H], [B]
        h_new, c_new = lstm_step(xp, h, c, w_hh, b_hh)
        m = m[:, None]
        h = m * h_new + (1 - m) * h
        c = m * c_new + (1 - m) * c
        return (h, c), h

    init = (jnp.zeros((B, H), xs.dtype), jnp.zeros((B, H), xs.dtype))
    (h, c), outs = jax.lax.scan(
        step, init, (x_proj.swapaxes(0, 1), mask.swapaxes(0, 1)),
        unroll=unroll,
    )
    return outs.swapaxes(0, 1), (h, c)


def _reverse_valid(xs, lengths):
    """Reverse each video's valid prefix in place: out[t] = x[len-1-t]."""
    T = xs.shape[1]
    ids = jnp.arange(T)
    rev = lengths[:, None] - 1 - ids[None, :]
    rev = jnp.clip(rev, 0, T - 1)
    return jnp.take_along_axis(xs, rev[:, :, None], axis=1)


class MaskedBiLSTM(nn.Module):
    """Bidirectional masked LSTM matching torch nn.LSTM(bidirectional=True).

    Outputs [B x T x 2H] (zeroed beyond each length) and the final
    (h, c) per direction concatenated as [B x 2H] each, matching torch's
    h_n.view(1, -1) flatten order (forward then backward —
    models.py:603-609).
    """

    input_size: int
    hidden_size: int
    bidirectional: bool = True
    unroll: int = 1  # lax.scan unroll factor: the [B x H] recurrence
    # matmuls are far too small to fill the MXU, so the scan is
    # loop-overhead bound; unrolling amortizes it (measured on v5e —
    # see docs/ROOFLINE.md step decomposition)
    use_pallas: object = False  # tri-state (tpu.use_pallas_lstm): run the
    # recurrence as ONE Pallas program (ops/lstm_pallas.py) with weights +
    # state VMEM-resident. Measured on v5e at the flagship shape (Tz=128,
    # B=8, H=128): 0.32 vs 0.34 ms per call against the unroll-8 scan,
    # checksum-identical (scripts/probe_lstm_kernel_tpu.py). f32,
    # bidirectional, VMEM-gated; anything else falls back to the scan.
    kernel_differentiable: bool = False  # train traces: use the custom-VJP
    # variant (bilstm_recurrence_train — fwd stashes the cell trajectory,
    # backward runs the reverse (dh, dc) chain as one program and emits
    # per-step dgate vectors; w_hh grads contract in XLA). The caller
    # (models/mucon.py) sets this per trace from tpu.use_pallas_lstm_train.

    def _kernel_vmem_budget(self) -> int:
        return 64 * 2**20  # the fused eval program shares VMEM; flagship
        # train shape is 5.5 MB, eval B=128/Tz=160 (105 MB) must fall back

    def _route_to_kernel(self, xs) -> bool:
        """Static (trace-time) routing for the fused recurrence kernel."""
        from mucon_tpu.ops.lstm_pallas import (
            bilstm_train_vmem_bytes,
            bilstm_vmem_bytes,
        )

        if not resolve_pallas_flag(self.use_pallas):
            return False
        B, T, _ = xs.shape
        if not self.bidirectional:
            log_route(f"bilstm Tz={T} B={B}: scan (kernel is 2-direction)")
            return False
        if xs.dtype != jnp.float32:
            log_route(
                f"bilstm Tz={T} B={B}: scan (kernel is f32, got {xs.dtype})"
            )
            return False
        vmem_fn = (
            bilstm_train_vmem_bytes
            if self.kernel_differentiable
            else bilstm_vmem_bytes
        )
        need = vmem_fn(T, B, self.hidden_size)
        if need > self._kernel_vmem_budget():
            log_route(
                f"bilstm Tz={T} B={B}: scan (kernel needs "
                f"{need / 2**20:.0f} MB VMEM > budget)"
            )
            return False
        log_route(
            f"bilstm Tz={T} B={B}: fused Pallas recurrence "
            f"({'train VJP, ' if self.kernel_differentiable else ''}"
            f"{need / 2**20:.1f} MB VMEM)"
        )
        return True

    def setup(self):
        self.fwd = LSTMCellParams(self.input_size, self.hidden_size)
        if self.bidirectional:
            self.bwd = LSTMCellParams(self.input_size, self.hidden_size)

    def __call__(self, xs, lengths) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
        B, T, _ = xs.shape
        m = time_mask(T, lengths, xs.dtype)
        if not self.bidirectional:
            out_f, (h_f, c_f) = _scan_direction(self.fwd, xs, m, self.unroll)
            return out_f * m[:, :, None], (h_f, c_f)

        # Both directions in ONE scan: the sequential chain is the latency
        # bottleneck on TPU (tiny [B x H] matmuls can't fill the MXU), so
        # halving the step count ~halves the encoder-scan wall time.  The
        # backward direction runs over the valid-prefix-reversed sequence,
        # which shares the same mask.
        H = self.hidden_size
        xs_r = _reverse_valid(xs, lengths)
        xp = jnp.stack(
            [self.fwd.project_inputs(xs), self.bwd.project_inputs(xs_r)]
        )  # [2 x B x T x 4H]
        w_hh = jnp.stack([self.fwd.w_hh, self.bwd.w_hh])  # [2 x H x 4H]
        b_hh = jnp.stack([self.fwd.b_hh, self.bwd.b_hh])  # [2 x 4H]

        if self._route_to_kernel(xs):
            from mucon_tpu.ops.lstm_pallas import (
                bilstm_recurrence_pallas,
                bilstm_recurrence_train,
            )

            # fold b_hh in (the kernel takes fully-projected gates)
            xp_folded = jnp.moveaxis(xp + b_hh[:, None, None, :], 2, 0)
            interp = jax.default_backend() == "cpu"
            if self.kernel_differentiable:
                outs, hc, cc = bilstm_recurrence_train(
                    interp, xp_folded, m.swapaxes(0, 1), w_hh
                )
            else:
                outs, hc, cc = bilstm_recurrence_pallas(
                    xp_folded, m.swapaxes(0, 1), w_hh, interpret=interp
                )
        else:

            def step(carry, inp):
                h, c = carry  # [2 x B x H]
                xp_t, m_t = inp  # [2 x B x 4H], [B]
                gates = (
                    xp_t + jnp.einsum("dbh,dhg->dbg", h, w_hh) + b_hh[:, None, :]
                )
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
                h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
                mm = m_t[None, :, None]
                h = mm * h_new + (1 - mm) * h
                c = mm * c_new + (1 - mm) * c
                return (h, c), h

            init = (
                jnp.zeros((2, B, H), xs.dtype),
                jnp.zeros((2, B, H), xs.dtype),
            )
            (hc, cc), outs = jax.lax.scan(
                step, init, (jnp.moveaxis(xp, 2, 0), m.swapaxes(0, 1)),
                unroll=self.unroll,
            )
        # outs: [T x 2 x B x H]
        out_f = outs[:, 0].swapaxes(0, 1)
        out_b = _reverse_valid(outs[:, 1].swapaxes(0, 1), lengths)
        out = jnp.concatenate([out_f, out_b], axis=-1) * m[:, :, None]
        h = jnp.concatenate([hc[0], hc[1]], axis=-1)
        c = jnp.concatenate([cc[0], cc[1]], axis=-1)
        return out, (h, c)
