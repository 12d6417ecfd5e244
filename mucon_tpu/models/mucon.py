"""The MuCon model: temporal encoder + seq2seq transcript decoder + framewise
classifier, as pure-functional Flax modules.

Architecture parity with the reference `MuCon` (models.py:133-778):

* ft: WaveNet-style dilated conv stack, 16x temporal downsample,
  GroupNorm(32) -> ReLU -> Dropout (models.py:746-773);
* fs: BiLSTM encoder over z, final (h, c) projected to decoder init
  (models.py:600-623), additive attention tanh(zW1 + l2(h))@V
  (models.py:730-744), embedding -> attn-combine -> LSTM cell ->
  transcript MLP and length MLP per step (models.py:641-727);
* fc: nearest-neighbor 16x upsample of z + 1x1 conv (models.py:567-582).

TPU design: everything is batched over padded videos with explicit length
masks; the decoder is a `jax.lax.scan` over a fixed S = max_decoding_steps
steps (teacher-forced steps beyond N_i+1 and free steps after EOS are
masked downstream, reproducing the reference's dynamic loop lengths and EOS
break, models.py:635-727); teacher forcing / free decoding are static flags
(two compiled traces).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mucon_tpu.models.layers import (
    masked_group_norm,
    interpolate_nearest_time,
    scaled_normal_init,
    time_mask,
    torch_linear_init,
)
from mucon_tpu.models.lstm import LSTMCellParams, MaskedBiLSTM
from mucon_tpu.models.outputs import MuConForwardOut
from mucon_tpu.models.temporal import (
    Conv1x1,
    MSTCNPPFirstStage,
    NoFt,
    WaveNetBlock,
)

# top-level parameter collections, mirroring the reference's two clip groups
# (models.py:284-303)
ENCODE_MODULES = (
    "ft",
    "ft_last_gn",
    "fs_encoder_lstm",
    "fs_encoder_hidden_out",
    "fs_encoder_cn_out",
)
DECODE_MODULES = (
    "fs_decoder_attention_W1",
    "fs_decoder_attention_l3",
    "decoder",
    "conv_classifier",
)


class TorchDense(nn.Module):
    """nn.Linear with torch default init."""

    in_features: int
    out_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        init = torch_linear_init(self.in_features)
        w = self.param("kernel", init, (self.in_features, self.out_features))
        b = self.param("bias", init, (self.out_features,))
        return jnp.dot(x.astype(self.dtype), w.astype(self.dtype)) + b.astype(
            self.dtype
        )


class GroupNormMasked(nn.Module):
    num_groups: int
    num_channels: int

    @nn.compact
    def __call__(self, x, lengths):
        scale = self.param("scale", nn.initializers.ones, (self.num_channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.num_channels,))
        return masked_group_norm(
            x.astype(jnp.float32), lengths, self.num_groups, scale, bias
        )


class DecoderCell(nn.Module):
    """One decode step (models.py:641-727). Scanned via nn.scan."""

    hidden: int
    enc_out_dim: int  # 2H for bidirectional encoder
    num_classes: int  # M
    embed_dropout: float
    train: bool
    free_decode: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, token_tf, enc_out, attn_pre, tz_mask):
        h, c, prev_token = carry
        M, H = self.num_classes, self.hidden

        token = prev_token if self.free_decode else token_tf

        # input embedding -> ReLU -> dropout (models.py:655-660)
        emb = nn.Embed(
            num_embeddings=M + 2,
            features=H,
            embedding_init=nn.initializers.normal(stddev=1.0),
            name="embedding",
        )(token)
        emb = nn.relu(emb)
        emb = nn.Dropout(self.embed_dropout, deterministic=not self.train)(emb)

        # additive attention over encoder states (models.py:730-744)
        q = TorchDense(H, H, dtype=self.dtype, name="attention_l2")(h)
        u = jnp.tanh(attn_pre + q[:, None, :])  # [B x Tz x H]
        v = self.param("attention_V", scaled_normal_init(H), (H,))
        scores = jnp.einsum("bth,h->bt", u, v.astype(u.dtype))
        scores = jnp.where(tz_mask > 0, scores, -jnp.inf)
        attn = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bt,btd->bd", attn, enc_out)  # [B x 2H]

        # combine + LSTM step (models.py:679-696)
        combined = TorchDense(
            self.enc_out_dim + H, H, dtype=self.dtype, name="attn_combine"
        )(jnp.concatenate([emb, ctx], axis=-1))
        combined = nn.relu(combined)
        h, c = LSTMCellParams(H, H, name="lstm")(combined, h, c)

        # transcript head: Linear -> ReLU -> Linear (models.py:250-260)
        t_hidden = nn.relu(TorchDense(H, H, dtype=self.dtype, name="transcript_fc")(h))
        logits = TorchDense(H, M + 1, dtype=self.dtype, name="transcript_out")(
            t_hidden
        )

        # length head over relu(concat(attn_out, logits)) (models.py:262-274,
        # 702-705)
        s_input = nn.relu(jnp.concatenate([combined, logits], axis=-1))
        l_hidden = nn.relu(
            TorchDense(H + M + 1, H // 2, dtype=self.dtype, name="length_fc")(s_input)
        )
        length = TorchDense(H // 2, 1, dtype=self.dtype, name="length_out")(l_hidden)[
            :, 0
        ]

        logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        next_token = jnp.argmax(logprobs, axis=-1).astype(jnp.int32)

        return (h, c, next_token), (logprobs, length.astype(jnp.float32), next_token)


# Trace-time A/B toggle for the framewise-head order (see the head
# comment in MuConNet.__call__): False = conv at Tz then upsample (the
# fast path, default); True = the reference's upsample-then-conv order.
# Both produce BITWISE-identical forward values (pinned by
# tests/test_model.py::test_head_order_commutes); the toggle exists for
# the hw A/B probe (scripts/probe_head_order_tpu.py) and as a parity
# oracle.  Read at trace time — flip before jitting, not inside jit.
_UPSAMPLE_BEFORE_HEAD = False


class MuConNet(nn.Module):
    """Full forward graph. Static flags pick the decode mode."""

    num_classes: int
    input_feature_size: int
    max_decoding_steps: int  # S (= max transcript length + 1)
    ft_type: str = "wavenet"
    ft_stages: Sequence[int] = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024)
    ft_hidden: int = 128
    ft_pooling: bool = True
    ft_pooling_type: str = "max"
    ft_pooling_layers: Sequence[int] = (1, 2, 4, 8)
    ft_dropout: float = 0.25
    ft_leaky: bool = False
    ft_last_gn: bool = True
    ft_last_gn_groups: int = 32
    ft_last_relu: bool = True
    ft_last_dropout: bool = True
    ft_last_dropout_rate: float = 0.25
    enc_hidden: int = 128
    enc_bidirectional: bool = True
    dec_hidden: int = 128
    dec_embed_dropout: float = 0.25
    early_exit_decode: bool = True  # free-decode eval: stop the decoder
    # loop once every video has emitted EOS (output-equivalent; the scan
    # always ran all S steps).  Train-time free decoding never early-exits
    # (the transcript loss reads up to N_i+1 steps regardless of EOS).
    dtype: jnp.dtype = jnp.float32
    remat_encoder: bool = False  # jax.checkpoint the conv stack (trade
    # recompute for activation memory on very long videos)
    scan_unroll: object = 1  # unroll factor for the sequential scans
    # (BiLSTM encoder over Tz, teacher-forced decoder over S): both are
    # loop-overhead bound on TPU at small batch (tiny [B x H] recurrence
    # matmuls), so unrolling amortizes per-step loop cost; semantics are
    # unchanged (same per-step math in the same order). An int forces the
    # factor; "auto" resolves PER TRACE from the batch size (see
    # resolve_scan_unroll — unroll only wins while the per-step work is
    # too small to hide the loop overhead).
    use_pallas_lstm: object = False  # tri-state (tpu.use_pallas_lstm):
    # fused Pallas BiLSTM recurrence on eval/inference traces. Routed per
    # trace in MaskedBiLSTM (f32 + bidirectional + VMEM fit required).
    use_pallas_lstm_train: object = False  # tri-state
    # (tpu.use_pallas_lstm_train): the custom-VJP variant on TRAIN traces
    # (fwd stashes the cell trajectory; backward runs the reverse (dh, dc)
    # chain as one program; w_hh grads contract in XLA).

    @nn.compact
    def __call__(
        self,
        feats,  # [B x T x D]
        num_frames,  # [B]
        tf_input,  # [B x S] (SOS + transcript, 0-padded)
        transcript_len,  # [B] true transcript lengths N_i
        train: bool = False,
        teacher_forcing: bool = True,
        z_precomputed=None,  # optional externally computed encoder output
        tz_precomputed=None,  # ... and its lengths (Pallas fused-stack path)
        decoder_fn=None,  # optional external teacher-forced decoder
        # (fused Pallas chain, ops/decoder_pallas.py): called as
        # decoder_fn(decoder_params, enc_out, attn_pre, tz_mask, h0, c0)
        # -> (logprobs [S x B x M+1], lengths [S x B], tokens [S x B]);
        # closes over tf_input/rng at the MuConModel level so the kernel
        # stays gather- and prng-free
    ) -> MuConForwardOut:
        B, T, D = feats.shape
        S = self.max_decoding_steps
        M = self.num_classes
        H = self.enc_hidden
        scan_unroll = resolve_scan_unroll(self.scan_unroll, batch_size=B)

        # ---- temporal modeling (models.py:746-773) ----
        if self.ft_type == "wavenet":
            ft_cls, ft_kwargs = WaveNetBlock, dict(
                in_channels=D,
                stages=tuple(self.ft_stages),
                out_dims=self.ft_hidden,
                pooling=self.ft_pooling,
                pooling_layers=tuple(self.ft_pooling_layers),
                pooling_type=self.ft_pooling_type,
                dropout_rate=self.ft_dropout,
                leaky=self.ft_leaky,
                dtype=self.dtype,
            )
        elif self.ft_type == "mstcnpp":
            ft_cls, ft_kwargs = MSTCNPPFirstStage, dict(
                input_dim=D,
                num_layers=len(self.ft_stages),
                num_f_maps=self.ft_hidden,
                output_dim=self.ft_hidden,
                pooling_layers=tuple(self.ft_pooling_layers),
                dtype=self.dtype,
            )
        elif self.ft_type == "noft":
            ft_cls, ft_kwargs = NoFt, dict(
                in_channels=D, out_dims=self.ft_hidden, dtype=self.dtype
            )
        else:
            raise Exception(f"Invalid ft type ({self.ft_type})")
        if self.remat_encoder:
            # trade recompute for activation memory on very long videos
            # (conv-stack activations dominate; args: (x, lengths, train))
            ft_cls = nn.remat(ft_cls, static_argnums=(3,))
        ft = ft_cls(**ft_kwargs, name="ft")

        if z_precomputed is not None:
            z, tz_len = z_precomputed, tz_precomputed
        else:
            z, tz_len = ft(feats.astype(self.dtype), num_frames, train)
        if self.ft_last_gn:
            z = GroupNormMasked(
                self.ft_last_gn_groups, self.ft_hidden, name="ft_last_gn"
            )(z, tz_len)
        if self.ft_last_relu:
            z = nn.relu(z)
        if self.ft_last_dropout:
            z = nn.Dropout(self.ft_last_dropout_rate, deterministic=not train)(z)
        z = z * time_mask(z.shape[1], tz_len, z.dtype)[:, :, None]

        # ---- sequence generation encoder (models.py:600-631) ----
        enc_out, (h_n, c_n) = MaskedBiLSTM(
            input_size=self.ft_hidden,
            hidden_size=H,
            bidirectional=self.enc_bidirectional,
            unroll=scan_unroll,
            # eval traces: the stashless fwd kernel; train traces: the
            # custom-VJP variant (its own knob — measured separately)
            use_pallas=(
                self.use_pallas_lstm_train if train else self.use_pallas_lstm
            ),
            kernel_differentiable=train,
            name="fs_encoder_lstm",
        )(z, tz_len)
        enc_dim = 2 * H if self.enc_bidirectional else H
        h0 = TorchDense(enc_dim, H, dtype=self.dtype, name="fs_encoder_hidden_out")(h_n)
        c0 = TorchDense(enc_dim, H, dtype=self.dtype, name="fs_encoder_cn_out")(c_n)

        w1 = self.param(
            "fs_decoder_attention_W1", scaled_normal_init(enc_dim), (enc_dim, H)
        )
        attn_pre = enc_out @ w1.astype(enc_out.dtype)  # [B x Tz x H]
        tz_mask = time_mask(enc_out.shape[1], tz_len)

        # defined-but-unused in the reference too (models.py:224-228); kept
        # so the parameter inventory (and decode clip group) matches
        l3_init = torch_linear_init(2 * H)
        self.param("fs_decoder_attention_l3_kernel", l3_init, (2 * H, H))
        self.param("fs_decoder_attention_l3_bias", l3_init, (H,))

        # ---- decoding loop (models.py:641-727) ----
        cell_kwargs = dict(
            hidden=self.dec_hidden,
            enc_out_dim=enc_dim,
            num_classes=M,
            embed_dropout=self.dec_embed_dropout,
            train=train,
            free_decode=not teacher_forcing,
            dtype=self.dtype,
            name="decoder",
        )
        init_carry = (h0.astype(jnp.float32), c0.astype(jnp.float32), tf_input[:, 0])

        if not teacher_forcing and not train and self.early_exit_decode:
            # EOS-terminated while_loop: the reference breaks out of its
            # python loop at EOS (models.py:719-722); the scan version runs
            # all S steps and masks.  This runs only until every video in
            # the batch has emitted EOS — identical outputs on the consumed
            # prefix (everything past a video's first EOS is ignored
            # downstream), ~3x fewer sequential steps for trained models.
            cell = DecoderCell(**cell_kwargs)
            lp_buf = jnp.zeros((S, B, M + 1), jnp.float32)
            len_buf = jnp.zeros((S, B), jnp.float32)
            tok_buf = jnp.zeros((S, B), jnp.int32)
            state0 = (
                init_carry,
                jnp.zeros((), jnp.int32),
                jnp.zeros((B,), bool),
                (lp_buf, len_buf, tok_buf),
            )

            def cond_fn(mdl, state):
                _, step, done, _ = state
                return (step < S) & ~jnp.all(done)

            def body_fn(mdl, state):
                carry, step, done, (lp_b, ln_b, tk_b) = state
                dummy_tf = jnp.zeros((B,), jnp.int32)
                carry, (lp, ln, tok) = mdl(
                    carry, dummy_tf, enc_out, attn_pre, tz_mask
                )
                lp_b = jax.lax.dynamic_update_index_in_dim(lp_b, lp, step, 0)
                ln_b = jax.lax.dynamic_update_index_in_dim(ln_b, ln, step, 0)
                tk_b = jax.lax.dynamic_update_index_in_dim(tk_b, tok, step, 0)
                return (carry, step + 1, done | (tok == M), (lp_b, ln_b, tk_b))

            _, _, _, (logprobs, lengths, tokens) = nn.while_loop(
                cond_fn, body_fn, cell, state0, broadcast_variables=True
            )
        elif decoder_fn is not None and teacher_forcing:
            # fused Pallas decoder chain (ops/decoder_pallas.py): the
            # closure reads the decoder params from the same pytree apply
            # received, so gradients flow identically to the scan path
            logprobs, lengths, tokens = decoder_fn(
                enc_out, attn_pre, tz_mask, init_carry[0], init_carry[1]
            )
        else:
            scan_cell = nn.scan(
                DecoderCell,
                variable_broadcast="params",
                split_rngs={"params": False, "dropout": True},
                in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast),
                out_axes=0,
                unroll=scan_unroll,
            )(**cell_kwargs)
            tokens_tf = jnp.swapaxes(tf_input[:, :S], 0, 1)  # [S x B]
            _, (logprobs, lengths, tokens) = scan_cell(
                init_carry, tokens_tf, enc_out, attn_pre, tz_mask
            )
        logprobs = jnp.swapaxes(logprobs, 0, 1)  # [B x S x (M+1)]
        lengths = jnp.swapaxes(lengths, 0, 1)  # [B x S]
        tokens = jnp.swapaxes(tokens, 0, 1)  # [B x S]

        # ---- framewise classification head (models.py:567-582) ----
        # 1x1 conv FIRST (at Tz = T/16), THEN the nearest upsample: a
        # positionwise conv and an index-selection commute BITWISE
        # (out[t] = W·z[idx[t]] + b either way, same per-element
        # arithmetic), and upsampling M=48 logits instead of C=128
        # features shrinks the data-dependent gather (fwd), its
        # scatter-add transpose (bwd), and the head weight-grad
        # contraction 2.7-16x — the xprof decomposition measured the
        # 128-channel gather+scatter at ~0.25 ms of the ~2.9 ms flagship
        # step (round 5, docs/ROOFLINE.md).  Reference applies conv after
        # upsample (models.py:574-582) at bs=1; values are identical.
        conv_classifier = Conv1x1(
            self.ft_hidden, M, dtype=self.dtype, name="conv_classifier"
        )
        if _UPSAMPLE_BEFORE_HEAD:  # A/B oracle path (trace-time toggle)
            z_up = interpolate_nearest_time(z, tz_len, T, num_frames)
            segmentation = conv_classifier(z_up).astype(jnp.float32)
            seg_z = conv_classifier(z).astype(jnp.float32)
        else:
            seg_z = conv_classifier(z).astype(jnp.float32)
            segmentation = interpolate_nearest_time(
                seg_z, tz_len, T, num_frames
            )

        # steps actually used: teacher-forced/training decode runs N_i + 1
        # steps; free decoding breaks at the first EOS (models.py:635-638,
        # 719-722)
        if teacher_forcing or train:
            n_steps = (transcript_len + 1).astype(jnp.int32)
        else:
            is_eos = tokens == M
            any_eos = jnp.any(is_eos, axis=1)
            first_eos = jnp.argmax(is_eos, axis=1)
            n_steps = jnp.where(any_eos, first_eos + 1, S).astype(jnp.int32)

        return MuConForwardOut(
            transcript=logprobs,
            lengths=lengths,
            segmentation=segmentation,
            tokens=tokens,
            n_steps=n_steps,
            tz_lengths=tz_len,
            segmentation_z=seg_z,
        )


def resolve_scan_unroll(v, batch_size=None) -> int:
    """"auto" -> per-trace policy measured on v5e (interleaved A/Bs with
    scalar-readback sync, scripts/probe_unroll_ab_tpu.py, full train step
    at T=2048, dropout .25): unroll 8 wins where the scans' per-step
    [B x H] work cannot hide the loop overhead — B=8: 3.42 vs 3.72 ms
    (all 5 trials); B=16: tie (6.70 vs 6.76); B=32: loses (11.82 vs
    11.11); B=128: loses (51.6 vs 51.0).  So "auto" unrolls only for
    B <= 16.  1 on CPU (unrolling only inflates compile time there).
    An int forces the factor everywhere."""
    if isinstance(v, str):
        if v != "auto":
            raise ValueError(
                f"Invalid scan_unroll {v!r} (use 'auto' or an int)")
        if jax.default_backend() == "cpu":
            return 1
        if batch_size is None or batch_size <= _AUTO_UNROLL_MAX_B:
            return 8
        return 1
    return max(1, int(v))


_AUTO_UNROLL_MAX_B = 16  # crossover measured on v5e (see docstring)


def _validate_scan_unroll(v):
    """Pass "auto" through raw (resolved per trace); validate/clamp ints."""
    if isinstance(v, str):
        if v != "auto":
            raise ValueError(f"Invalid scan_unroll {v!r} (use 'auto' or an int)")
        return v
    return max(1, int(v))


def build_model(cfg, num_classes: int, max_decoding_steps: int, input_feature_size: int):
    """Factory mirroring `create_model` (models.py:30-46)."""
    if cfg.model.name != "mucon":
        raise Exception("Invalid model name")
    dtype = jnp.bfloat16 if cfg.tpu.compute_dtype == "bfloat16" else jnp.float32
    return MuConNet(
        num_classes=num_classes,
        input_feature_size=input_feature_size,
        max_decoding_steps=max_decoding_steps,
        ft_type=cfg.model.ft.type,
        ft_stages=tuple(cfg.model.ft.stages),
        ft_hidden=cfg.model.ft.hidden_size,
        ft_pooling=cfg.model.ft.pooling,
        ft_pooling_type=cfg.model.ft.pooling_type,
        ft_pooling_layers=tuple(cfg.model.ft.pooling_layers),
        ft_dropout=cfg.model.ft.dropout_rate,
        ft_leaky=cfg.model.ft.leaky_relu,
        ft_last_gn=cfg.model.ft.last_gn,
        ft_last_gn_groups=cfg.model.ft.last_gn_num_groups,
        ft_last_relu=cfg.model.ft.last_relu,
        ft_last_dropout=cfg.model.ft.last_dropout,
        ft_last_dropout_rate=cfg.model.ft.last_dropout_rate,
        enc_hidden=cfg.model.fs.encoder.hidden_size,
        enc_bidirectional=cfg.model.fs.encoder.bidirectional,
        dec_hidden=cfg.model.fs.decoder.hidden_size,
        dec_embed_dropout=cfg.model.fs.decoder.embedding_dropout,
        early_exit_decode=cfg.tpu.early_exit_decode,
        dtype=dtype,
        remat_encoder=cfg.tpu.remat,
        scan_unroll=_validate_scan_unroll(cfg.tpu.scan_unroll),
        use_pallas_lstm=cfg.tpu.use_pallas_lstm,
        use_pallas_lstm_train=cfg.tpu.use_pallas_lstm_train,
    )
