"""High-level model wrapper: init / forward / loss / predict.

This is the fandak-`Model`-equivalent surface (SURVEY.md §2.11): pure
functions over explicit parameter pytrees instead of mutable nn.Modules.
`create_model` / `create_fully_supervised_model` /
`create_mixed_supervision_model` mirror the reference factories
(models.py:30-82).
"""

from __future__ import annotations

import logging
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mucon_tpu.data.batching import PaddedBatch
from mucon_tpu.models.losses import compute_loss, loss_static_config
from mucon_tpu.models.mucon import (
    DECODE_MODULES,
    ENCODE_MODULES,
    MuConNet,
    build_model,
)
from mucon_tpu.models.outputs import MuConForwardOut, MuConPredictOut
from mucon_tpu.models.routing import log_route as _log_route
from mucon_tpu.models.routing import resolve_pallas_flag


logger = logging.getLogger("mucon_tpu.kernel_routing")


def sliced_train_uses_kernel(nb: int, B: int, knob) -> bool:
    """Routing for the SLICED v3 train kernel under tpu.use_pallas_train.

    Measured on v5e (interleaved A/Bs, scalar-readback sync):
      * nb == 1 (unsliced, B=8 T=2048): kernel, 1.93x over XLA.
      * 1 < nb < B (multi-video slices, B=64 t=1024 nb=4): XLA,
        13.10 vs 12.60 ms — launches lose at this size.
      * nb == B (single-video slices, B=8 T=10240): kernel,
        14.81 vs 17.44 ms (1.18x) — scripts/probe_t10k_tpu.py; VMEM-
        resident residual streams beat XLA's long-T HBM traffic.
    Explicit True forces the kernel at any slicing."""
    if knob != "auto":
        return bool(knob)
    return nb == 1 or nb == B


class MuConModel:
    """Owns the flax module + config; stateless apply helpers.

    `teacher_forcing` mirrors the reference's mutable flag
    (models.py:775-778) but is carried explicitly (it selects a static
    trace).
    """

    supervised = False
    mixed = False

    def __init__(self, cfg, num_classes, max_decoding_steps, input_feature_size):
        self.cfg = cfg
        self.num_classes = num_classes
        self.max_decoding_steps = max_decoding_steps
        self.input_feature_size = input_feature_size
        self.net: MuConNet = build_model(
            cfg, num_classes, max_decoding_steps, input_feature_size
        )
        self.loss_cfg = loss_static_config(cfg)
        self.teacher_forcing = True

    # -- parameters ---------------------------------------------------------
    def init_params(self, rng, batch: Optional[PaddedBatch] = None):
        if batch is None:
            feats = jnp.zeros((1, 64, self.input_feature_size))
            frames = jnp.array([64])
            tf_in = jnp.zeros((1, self.max_decoding_steps), jnp.int32)
            n_len = jnp.array([2])
        else:
            feats = jnp.asarray(batch.feats[:1])
            frames = jnp.asarray(batch.num_frames[:1])
            tf_in = jnp.asarray(batch.tf_input[:1])
            n_len = jnp.asarray(batch.transcript_len[:1])
        # jit the init on accelerators: un-jitted, flax init executes
        # EAGERLY op by op — thousands of individual dispatches, each
        # paying the remote-TPU roundtrip (~120 s of the timed run's
        # setup phase measured on the tunnel; jitted: 14.3 s cold /
        # 1.6 s warm with the persistent compilation cache, round 5).
        # On CPU the dispatch is free and the whole-forward compile is
        # NOT (it added ~3 min to the FAST test tier), so eager stays.
        # The two paths differ by ~1e-7 in init values (transcendental
        # fusion under jit) — random-init noise, consistent within each
        # backend. train/teacher_forcing are baked (always False/True).
        def _init(rng, feats, frames, tf_in, n_len):
            return self.net.init(
                {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
                feats,
                frames,
                tf_in,
                n_len,
                train=False,
                teacher_forcing=True,
            )

        init_fn = _init if jax.default_backend() == "cpu" else jax.jit(_init)
        variables = init_fn(rng, feats, frames, tf_in, n_len)
        return variables["params"]

    def param_partition(self, params):
        """'encode' / 'decode' label tree for separate grad clipping
        (reference models.py:284-317, trainers.py:136-138)."""

        def label_for(top_key: str) -> str:
            for m in ENCODE_MODULES:
                if top_key == m or top_key.startswith(m):
                    return "encode"
            for m in DECODE_MODULES:
                if top_key == m or top_key.startswith(m):
                    return "decode"
            raise KeyError(f"Unpartitioned parameter group: {top_key}")

        return {k: jax.tree.map(lambda _: label_for(k), v) for k, v in params.items()}

    def kernels_active(self, train: bool) -> bool:
        """Would `forward()` route to the fused Pallas stacks (before the
        per-shape VMEM gating)?  The mesh layer uses this to pick shard_map
        (per-shard kernel invocation over the "data" axis) vs GSPMD (XLA
        partitioning) — the fused kernels are batch-local single-device
        programs, so under a data-only mesh each shard can run them on its
        local batch unchanged."""
        if self.cfg.model.ft.type == "mstcnpp":
            # eval-only fused stage (ops/mstcnpp_pallas.py); no train kernel
            return (not train) and resolve_pallas_flag(self.cfg.tpu.use_pallas)
        if self.cfg.model.ft.type != "wavenet":
            return False
        if not resolve_pallas_flag(self.cfg.tpu.use_pallas):
            return False
        if not train:
            return True
        ptrain = self.cfg.tpu.use_pallas_train
        if ptrain == "auto":
            ptrain = resolve_pallas_flag("auto")
        return bool(ptrain)

    # -- forward/loss ----------------------------------------------------------
    def forward(
        self,
        params,
        batch_arrays: dict,
        rng=None,
        train: bool = False,
        teacher_forcing: Optional[bool] = None,
        use_pallas: Optional[bool] = None,
    ) -> MuConForwardOut:
        tf = self.teacher_forcing if teacher_forcing is None else teacher_forcing
        rngs = {"dropout": rng} if (train and rng is not None) else None
        batch_arrays = dequantize_feats(batch_arrays)

        z = tz = None
        if use_pallas is None:
            use_pallas = resolve_pallas_flag(self.cfg.tpu.use_pallas)
        ptrain = self.cfg.tpu.use_pallas_train
        if ptrain == "auto":
            # v3 (pool-free programs + XLA glue) compiles within the remote
            # helper's budget with dropout ON, so "auto" no longer requires
            # dropout == 0 (the round-1 v2 limitation)
            ptrain = resolve_pallas_flag("auto")
        if self.cfg.model.ft.type == "wavenet":
            if train and (use_pallas and bool(ptrain)):
                z, tz = self._encode_pallas_train(params, batch_arrays, rng)
            elif not train and use_pallas:
                z, tz = self._encode_pallas(params, batch_arrays)
        elif self.cfg.model.ft.type == "mstcnpp":
            if not train and use_pallas:
                z, tz = self._encode_pallas_mstcnpp(params, batch_arrays)

        decoder_fn = None
        if train and tf:
            decoder_fn = self._decoder_pallas_fn(params, batch_arrays, rng)

        return self.net.apply(
            {"params": params},
            batch_arrays["feats"],
            batch_arrays["num_frames"],
            batch_arrays["tf_input"],
            batch_arrays["transcript_len"],
            train=train,
            teacher_forcing=tf,
            z_precomputed=z,
            tz_precomputed=tz,
            decoder_fn=decoder_fn,
            rngs=rngs,
        )

    def _n_pools(self) -> int:
        """Static pooling count of the temporal encoder (tz = T >> n)."""
        ft = self.cfg.model.ft
        if ft.type == "noft" or (ft.type == "wavenet" and not ft.pooling):
            return 0
        return sum(1 for p in ft.pooling_layers if p < len(ft.stages))

    def _decoder_pallas_fn(self, params, batch_arrays, rng):
        """Fused teacher-forced decoder chain (ops/decoder_pallas.py):
        returns the closure MuConNet calls in place of the nn.scan branch,
        or None when routing keeps the scan.  Embedding lookup + dropout
        happen here (XLA threefry mask, like the v3 encoder kernel), so
        the chain kernels stay gather- and prng-free; gradients flow to
        the flax decoder leaves through the closure's reads of the SAME
        params pytree apply receives."""
        import jax as _jax

        from mucon_tpu.ops.decoder_pallas import (
            decoder_chain_vmem_bytes,
            decoder_teacher_forced,
        )

        if not resolve_pallas_flag(self.cfg.tpu.use_pallas_decoder):
            return None
        mfs = self.cfg.model.fs
        H = int(mfs.decoder.hidden_size)
        if self.cfg.tpu.compute_dtype == "bfloat16":
            _log_route("train decoder: scan (chain kernel is f32-only)")
            return None
        if int(mfs.encoder.hidden_size) != H:
            _log_route(
                "train decoder: scan (chain kernel needs encoder and "
                "decoder hidden sizes equal)"
            )
            return None
        B, T, _ = batch_arrays["feats"].shape
        S = self.max_decoding_steps
        Tz = max(1, T >> self._n_pools())
        E = 2 * H if mfs.encoder.bidirectional else H
        need = decoder_chain_vmem_bytes(S, B, Tz, H, E)
        if need > 64 * 2**20:
            _log_route(
                f"train decoder S={S} B={B} Tz={Tz}: scan (chain kernel "
                f"needs {need / 2**20:.0f} MB VMEM > budget)"
            )
            return None
        _log_route(
            f"train decoder S={S} B={B} Tz={Tz}: fused Pallas chain "
            f"({need / 2**20:.1f} MB VMEM)"
        )

        dp = params["decoder"]
        tf_input = batch_arrays["tf_input"]
        drop = float(mfs.decoder.embedding_dropout)

        def decoder_fn(enc_out, attn_pre, tz_mask, h0, c0):
            table = dp["embedding"]["embedding"]
            tokens_tf = jnp.swapaxes(tf_input[:, :S], 0, 1)  # [S x B]
            emb = jnp.maximum(jnp.take(table, tokens_tf, axis=0), 0.0)
            if drop > 0.0 and rng is not None:
                # whole-trajectory mask (the scan path draws per step;
                # same distribution, different stream — flax Dropout
                # semantics: keep with p=1-rate, scale kept by 1/(1-rate))
                keep = 1.0 - drop
                bern = _jax.random.bernoulli(
                    _jax.random.fold_in(rng, 23), keep, emb.shape
                )
                emb = jnp.where(bern, emb / keep, 0.0)
            return decoder_teacher_forced(
                dp, emb, enc_out, attn_pre,
                tz_mask.astype(jnp.float32), h0, c0,
                use_kernel=True,
                interpret=_jax.default_backend() == "cpu",
            )

        return decoder_fn

    def _encode_pallas_train(self, params, batch_arrays, rng):
        """Differentiable fused stack v3 (ops/wavenet_train_pallas_v3.py:
        pool-free equal-T programs with activation stash; pooling and its
        gradient routing run in XLA between programs) with XLA-threefry
        dropout masks seeded from the step rng."""
        import jax as _jax
        from mucon_tpu.models.layers import mask_time
        from mucon_tpu.ops.wavenet_pallas_v2 import pack_wavenet_params
        from mucon_tpu.ops.wavenet_train_pallas_v3 import (
            plan_batch_slices,
            wavenet_stack_train_v3_auto,
        )

        ft = params["ft"]
        feats = batch_arrays["feats"]
        lengths = batch_arrays["num_frames"]

        # VMEM fit via batch slicing (equal-shape sub-batch programs, one
        # compile); XLA fallback when even single-video slices exceed the
        # budget.  Under "auto", MULTI-video slices route to XLA: measured
        # on v5e, the UNSLICED kernel wins at small batch (B=8, T=2048:
        # 1.93x) but a sliced B=64/t=1024 step (nb=4, 16 videos/slice) ran
        # 13.10 vs XLA's 12.60 ms — large batches amortize XLA better and
        # slices add launches.  SINGLE-video slices (nb == B, i.e. the
        # video is so long only one fits the budget) keep the kernel: at
        # B=8, T=10240 the sliced kernel measured 14.81 vs XLA's 17.44
        # ms/step (1.18x, scripts/probe_t10k_tpu.py) — VMEM-resident
        # residual streams beat XLA's long-T HBM traffic, and the launch
        # overhead amortizes over 10k-row programs.  Explicit
        # use_pallas_train=True forces the sliced path at any size.
        B, T = feats.shape[0], feats.shape[1]
        C = int(self.cfg.model.ft.hidden_size)
        drop = float(self.cfg.model.ft.dropout_rate)
        nb = plan_batch_slices(B, T, C, drop > 0.0)
        if nb is None:
            _log_route(
                f"train encoder B={B} T={T}: XLA (single-video slice "
                "exceeds the kernel VMEM budget)"
            )
            return None, None
        if not sliced_train_uses_kernel(nb, B, self.cfg.tpu.use_pallas_train):
            _log_route(
                f"train encoder B={B} T={T}: XLA (auto: {nb} multi-video "
                "batch slices needed; sliced kernel launches lose to XLA "
                "at this size)"
            )
            return None, None
        _log_route(
            f"train encoder B={B} T={T}: fused Pallas v3 stack "
            f"({nb} slice(s), dropout={drop}, mm_dtype="
            f"{self._kernel_mm_dtype() or 'float32'})"
        )

        x = self._in_projection(
            feats, ft["Conv1x1_0"]["kernel"], ft["Conv1x1_0"]["bias"]
        )
        x = mask_time(x, lengths)
        if rng is None:
            seed = jnp.zeros((), jnp.int32)
        else:
            seed = _jax.random.randint(
                _jax.random.fold_in(rng, 17), (), 0, 2**31 - 1
            ).astype(jnp.int32)
        packed = pack_wavenet_params(ft, len(self.cfg.model.ft.stages))
        n_pools = sum(
            1
            for p in self.cfg.model.ft.pooling_layers
            if p < len(self.cfg.model.ft.stages)
        )
        z = wavenet_stack_train_v3_auto(
            x,
            lengths,
            seed,
            *packed,
            tuple(self.cfg.model.ft.stages),
            tuple(int(p) for p in self.cfg.model.ft.pooling_layers),
            self.cfg.model.ft.pooling_type,
            drop,
            bool(self.cfg.model.ft.leaky_relu),
            _jax.default_backend() == "cpu",
            self._kernel_mm_dtype(),
        )
        if z is None:
            return None, None
        return z, lengths >> n_pools

    def _in_projection(self, feats, w_in, b_in):
        """relu(feats @ W + b), the D->H input conv done by XLA before the
        kernel; under bf16 the [B*T x 2048] matmul (the single biggest in
        the encoder) runs on bf16 MXU operands with f32 accumulation."""
        mm = self._in_proj_mm_dtype()
        if mm is not None:
            B, T, D = feats.shape
            y = jnp.dot(
                feats.reshape(B * T, D).astype(mm),
                w_in.astype(mm),
                preferred_element_type=jnp.float32,
            ).reshape(B, T, -1)
            return jnp.maximum(y + b_in, 0.0)
        return jnp.maximum(feats @ w_in + b_in, 0.0)

    def _in_proj_mm_dtype(self):
        """bf16 MXU operands (f32 accumulation) for the 2048->H input
        projection when the model computes in bf16: a [B*T x 2048] matmul
        with K=2048 is genuinely MXU-bound, unlike the C=128 kernel body.
        tpu.in_proj_mm_dtype overrides per-matmul: explicit "bfloat16"
        targets ONLY this projection (pair with a bf16 feature wire so the
        cached feats are bf16-resident and no upcast pass is paid)."""
        knob = self.cfg.tpu.in_proj_mm_dtype
        if knob == "bfloat16":
            return jnp.bfloat16
        if knob == "float32":
            return None
        if knob != "auto":
            raise ValueError(
                "tpu.in_proj_mm_dtype must be one of 'auto'/'float32'/"
                f"'bfloat16', got {knob!r}"
            )
        if self.cfg.tpu.compute_dtype == "bfloat16":
            return jnp.bfloat16
        return None

    def _kernel_mm_dtype(self):
        """Matmul operand dtype INSIDE the Pallas stack kernels
        (tpu.kernel_mm_dtype tri-state). Measured on v5e at flagship
        shapes (B=8, T=2048, C=128, dropout .25): bf16 operand casts are
        a 1.67x regression (9.89 vs 5.90 ms/step) — each cast streams the
        whole [B,t,C] activation block through the VPU while the MXU
        saving at N=C=128 is negligible. "auto" therefore keeps kernel
        matmuls f32 even when tpu.compute_dtype=bfloat16; explicit
        "bfloat16" forces the operand-cast mode for A/B runs."""
        knob = self.cfg.tpu.kernel_mm_dtype
        if knob == "bfloat16":
            return jnp.bfloat16
        if knob == "float32":
            return None
        if knob != "auto":
            raise ValueError(
                "tpu.kernel_mm_dtype must be one of 'auto'/'float32'/"
                f"'bfloat16', got {knob!r}"
            )
        return None  # "auto": f32 wins at this model's channel width

    def _encode_pallas(self, params, batch_arrays):
        """Fused Pallas WaveNet stack (ops/wavenet_pallas_v2.py — whole
        batch in one program, 1.4x faster than the XLA stack on v5e):
        XLA does the big 2048->H input projection, the kernel runs the
        residual stack entirely in VMEM."""
        import jax as _jax
        from mucon_tpu.models.layers import mask_time
        from mucon_tpu.ops.wavenet_pallas_v2 import pack_wavenet_params
        from mucon_tpu.ops.wavenet_pallas_v2 import (
            plan_eval_slices,
            wavenet_stack_pallas_v2_sliced,
        )

        ft = params["ft"]
        feats = batch_arrays["feats"]
        lengths = batch_arrays["num_frames"]

        # VMEM fit via batch slicing (sliced == unsliced bitwise; one
        # compile reused across slices); XLA fallback only when even
        # single-video slices exceed the program budget
        B, T = feats.shape[0], feats.shape[1]
        C = int(self.cfg.model.ft.hidden_size)
        n_slices = plan_eval_slices(B, T, C)
        if n_slices is None:
            _log_route(
                f"eval encoder B={B} T={T}: XLA (single-video slice "
                "exceeds the kernel VMEM budget)"
            )
            return None, None
        _log_route(
            f"eval encoder B={B} T={T}: fused Pallas v2 stack "
            f"({n_slices} slice(s), mm_dtype="
            f"{self._kernel_mm_dtype() or 'float32'})"
        )
        x = self._in_projection(
            feats, ft["Conv1x1_0"]["kernel"], ft["Conv1x1_0"]["bias"]
        )
        x = mask_time(x, lengths)
        packed = pack_wavenet_params(ft, len(self.cfg.model.ft.stages))
        out = wavenet_stack_pallas_v2_sliced(
            x,
            lengths,
            *packed,
            stages=tuple(self.cfg.model.ft.stages),
            pooling_layers=tuple(self.cfg.model.ft.pooling_layers),
            pooling_type=self.cfg.model.ft.pooling_type,
            leaky=self.cfg.model.ft.leaky_relu,
            interpret=_jax.default_backend() == "cpu",
            mm_dtype=self._kernel_mm_dtype(),
        )
        if out is None:
            return None, None
        return out

    def _encode_pallas_mstcnpp(self, params, batch_arrays):
        """Fused MSTCN++ first stage (ops/mstcnpp_pallas.py — whole batch
        VMEM-resident, dual dilated convs as shift-matmuls, concat-1x1
        decomposed as a split matmul).  Eval/inference only, like the
        WaveNet v2 kernel; training keeps the XLA path (no VJP)."""
        import jax as _jax
        from mucon_tpu.models.layers import mask_time
        from mucon_tpu.ops.mstcnpp_pallas import (
            mstcnpp_stack_pallas_sliced,
            pack_mstcnpp_params,
            plan_mstcnpp_slices,
        )

        ft = params["ft"]
        feats = batch_arrays["feats"]
        lengths = batch_arrays["num_frames"]
        B, T = feats.shape[0], feats.shape[1]
        C = int(self.cfg.model.ft.hidden_size)
        n_slices = plan_mstcnpp_slices(B, T, C)
        if n_slices is None:
            _log_route(
                f"eval mstcnpp encoder B={B} T={T}: XLA (single-video "
                "slice exceeds the kernel VMEM budget)"
            )
            return None, None
        _log_route(
            f"eval mstcnpp encoder B={B} T={T}: fused Pallas stage "
            f"({n_slices} slice(s), mm_dtype="
            f"{self._kernel_mm_dtype() or 'float32'})"
        )
        # in-projection Conv1x1_0 in XLA: plain matmul + bias, NO relu
        # (MSTCNPPFirstStage applies none), masked
        w_in = ft["Conv1x1_0"]["kernel"]
        b_in = ft["Conv1x1_0"]["bias"]
        x = mask_time(feats @ w_in + b_in, lengths)
        L = len(self.cfg.model.ft.stages)
        packed = pack_mstcnpp_params(ft, L)
        out = mstcnpp_stack_pallas_sliced(
            x,
            lengths,
            *packed,
            num_layers=L,
            pooling_layers=tuple(
                int(p) for p in self.cfg.model.ft.pooling_layers
            ),
            interpret=_jax.default_backend() == "cpu",
            mm_dtype=self._kernel_mm_dtype(),
        )
        if out is None:
            return None, None
        return out

    def loss(
        self,
        fwd: MuConForwardOut,
        batch_arrays: dict,
        teacher_forcing: Optional[bool] = None,
    ):
        tf = self.teacher_forcing if teacher_forcing is None else teacher_forcing
        return compute_loss(
            self.loss_cfg,
            fwd,
            tf_target=batch_arrays["tf_target"],
            transcript=batch_arrays["transcript"],
            transcript_len=batch_arrays["transcript_len"],
            num_frames=batch_arrays["num_frames"],
            teacher_forcing=tf,
            gt_label=batch_arrays.get("gt_label"),
            absolute_lengths=batch_arrays.get("absolute_lengths"),
            fully_supervised=batch_arrays.get("fully_supervised")
            if self.mixed
            else None,
            supervised=self.supervised,
        )

    def set_teacher_forcing(self, teacher_forcing: bool = True):
        self.teacher_forcing = teacher_forcing

    # -- prediction (host-side, per video) ------------------------------------
    def predict(
        self, batch: PaddedBatch, fwd: MuConForwardOut
    ) -> List[MuConPredictOut]:
        """Reference models.py:360-374, vectorized then unpadded per video."""
        transcript_lp = np.asarray(fwd.transcript)
        lengths_raw = np.asarray(fwd.lengths)
        seg = np.asarray(fwd.segmentation)
        tokens = np.asarray(fwd.tokens)
        n_steps = np.asarray(fwd.n_steps)

        outs = []
        for i in range(transcript_lp.shape[0]):
            t_i = int(batch.num_frames[i])
            if self.teacher_forcing:
                n_i = int(batch.transcript_len[i])
                transcript = list(batch.tf_target[i, : n_i + 1])
                raw = lengths_raw[i, :n_i]
            else:
                k = int(n_steps[i])
                transcript = list(tokens[i, :k])
                raw = lengths_raw[i, : max(k - 1, 0)]
            lens = _softmax_np(raw)
            seg_lp = _log_softmax_np(seg[i, :t_i])
            outs.append(
                MuConPredictOut(
                    transcript=[int(x) for x in transcript],
                    lengths=lens,
                    segmentation_logits=seg_lp,
                )
            )
        return outs


class MuConFullySupervisedModel(MuConModel):
    supervised = True


class MuConMixedSupervisionModel(MuConFullySupervisedModel):
    mixed = True


def _softmax_np(x: np.ndarray) -> np.ndarray:
    if x.size == 0:
        return x
    e = np.exp(x - x.max())
    return e / e.sum()


def _log_softmax_np(x: np.ndarray) -> np.ndarray:
    m = x.max(axis=-1, keepdims=True)
    s = np.log(np.exp(x - m).sum(axis=-1, keepdims=True))
    return x - m - s


def quantize_feats_int8(feats):
    """Per-frame symmetric int8 quantization of [... x T x D] features:
    scale[..., t] = max|feats[..., t, :]| / 127, q = rint(f / scale).
    Returns (q int8, scale float32[... x T]).  Elementwise error is
    bounded by scale/2 = max|frame| / 254 (~0.2% of the frame's peak) —
    far below the feature noise the model trains through (dropout .25);
    the wire/cache cost is 1/4 of f32, 1/2 of f16 + one tiny scale
    array.  A lossy opt-in knob, like the f16 wires; f32 stays the
    parity default."""
    scale = np.abs(feats).max(axis=-1) / 127.0
    scale = np.maximum(scale, 1e-12).astype(np.float32)
    q = np.rint(feats / scale[..., None])
    q = np.clip(q, -127, 127).astype(np.int8)
    return q, scale


def dequantize_feats(batch_arrays: dict) -> dict:
    """Inverse of the int8 feature wire: rebuild float32 feats from
    (int8 q, per-frame scale) at the top of forward().  XLA fuses the
    cast+multiply into the in-projection matmul's producer, so the
    dequant costs no extra HBM round-trip.  No-op for float wires."""
    if "feats_scale" not in batch_arrays:
        return batch_arrays
    out = dict(batch_arrays)
    scale = out.pop("feats_scale")
    out["feats"] = out["feats"].astype(jnp.float32) * scale[..., None]
    return out


def batch_to_host_arrays(batch: PaddedBatch, feats_dtype=None) -> dict:
    """Host (numpy) dict view of a PaddedBatch — the canonical key set.
    `feats_dtype="int8"` selects the quantized wire (adds a
    `feats_scale` key; see quantize_feats_int8)."""
    scale = None
    if feats_dtype == "int8" or feats_dtype is np.int8:
        feats, scale = quantize_feats_int8(batch.feats)
    elif feats_dtype is None:
        feats = batch.feats
    else:
        feats = batch.feats.astype(feats_dtype)
    if scale is not None:
        return dict(
            feats=feats,
            feats_scale=scale,
            num_frames=batch.num_frames,
            gt_label=batch.gt_label,
            transcript=batch.transcript,
            transcript_len=batch.transcript_len,
            tf_input=batch.tf_input,
            tf_target=batch.tf_target,
            absolute_lengths=batch.absolute_lengths,
            fully_supervised=batch.fully_supervised,
        )
    return dict(
        feats=feats,
        num_frames=batch.num_frames,
        gt_label=batch.gt_label,
        transcript=batch.transcript,
        transcript_len=batch.transcript_len,
        tf_input=batch.tf_input,
        tf_target=batch.tf_target,
        absolute_lengths=batch.absolute_lengths,
        fully_supervised=batch.fully_supervised,
    )


def resolve_eval_feats_dtype(cfg):
    """`tpu.eval_feats_transfer_dtype` -> the `feats_dtype` argument for
    batch_to_arrays/batch_to_host_arrays: None for the exact f32 wire,
    a jnp dtype for the half-width wires, or the 'int8' sentinel for the
    quantized wire.  Shared by the evaluator and cli/predict so the
    serving surface honors the same knob as eval.

    "auto" (the default) resolves to bfloat16 on accelerator backends —
    numerics-IDENTICAL to f32 there (the in-projection truncates dot
    operands to bf16 MXU passes either way; fused-eval output checksums
    verified equal on v5e, scripts/probe_eval_wire_dtype_tpu.py) at half
    the dominant HBM read — and to float32 on CPU, where matmuls run
    true f32 and a bf16 wire WOULD change numerics."""
    t = getattr(cfg.tpu, "eval_feats_transfer_dtype", "auto")
    if t == "auto":
        import jax

        return None if jax.default_backend() == "cpu" else jnp.bfloat16
    if t in (None, "float32"):
        return None
    if t in ("float16", "bfloat16"):
        return jnp.dtype(t)
    if t == "int8":  # quantized wire (quantize_feats_int8)
        return "int8"
    raise ValueError(
        f"Invalid tpu.eval_feats_transfer_dtype {t!r} "
        "(use 'auto'|'float32'|'float16'|'bfloat16'|'int8')"
    )


def batch_to_arrays(batch: PaddedBatch, feats_dtype=None) -> dict:
    """Device-transferable dict view of a PaddedBatch.  `feats_dtype`
    (e.g. bfloat16) casts features before transfer — halves wire + HBM
    bytes on the dominant tensor."""
    return {
        k: jnp.asarray(v)
        for k, v in batch_to_host_arrays(batch, feats_dtype).items()
    }


def create_model(cfg, num_classes, max_decoding_steps, input_feature_size):
    if cfg.model.name != "mucon":
        raise Exception("Invalid model name")
    return MuConModel(cfg, num_classes, max_decoding_steps, input_feature_size)


def create_fully_supervised_model(
    cfg, num_classes, max_decoding_steps, input_feature_size
):
    if cfg.model.name != "mucon":
        raise Exception("Invalid model name")
    return MuConFullySupervisedModel(
        cfg, num_classes, max_decoding_steps, input_feature_size
    )


def create_mixed_supervision_model(
    cfg, num_classes, max_decoding_steps, input_feature_size
):
    if cfg.model.name != "mucon":
        raise Exception("Invalid model name")
    return MuConMixedSupervisionModel(
        cfg, num_classes, max_decoding_steps, input_feature_size
    )
