"""MuCon losses — padding-exact batched versions of the reference objective.

main = mul_transcript * transcript + mul_length * length
     + mul_mucon * mucon + mul_smoothing * smoothing
(+ supervised terms for the fully/mixed-supervision variants),
reference models.py:376-396, 843-911.

Every reduction matches the reference's per-video reductions computed over
UNPADDED extents (SURVEY.md §7 "hard parts"): transcript NLL sums over the
N_i+1 teacher-forcing steps, the mucon NLL averages over N_i segments, the
smoothing MSE averages over (T_i - 1) * M elements, the hinge length loss
sums over N_i steps.  The batch loss is the mean over videos, which matches
the reference's gradient semantics for `accumulate_grad_every = B`
(trainers.py:127-131).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from mucon_tpu.models.masks import create_masks_padded
from mucon_tpu.models.outputs import (
    MuConForwardOut,
    MuConFullySupervisedLoss,
    MuConLoss,
)


def _class_weights(num: int, enabled: bool, index: int, value: float):
    if not enabled:
        return None
    return jnp.ones((num,)).at[index].set(value)


def _nll(logprobs, targets, valid, weights: Optional[jnp.ndarray], average: bool):
    """(weighted) NLL over valid steps; torch nll_loss semantics
    (weighted mean divides by the sum of selected weights)."""
    picked = -jnp.take_along_axis(logprobs, targets[:, None], axis=1)[:, 0]
    w = jnp.ones_like(picked) if weights is None else weights[targets]
    w = w * valid
    total = jnp.sum(picked * w)
    if average:
        return total / jnp.maximum(jnp.sum(w), 1e-12)
    return total


def transcript_loss_video(cfg_static, logprobs, tf_target, n_steps):
    """Reference models.py:539-565 (per video)."""
    S = logprobs.shape[0]
    valid = (jnp.arange(S) < n_steps).astype(jnp.float32)
    weights = _class_weights(
        logprobs.shape[1],
        cfg_static["transcript_weight_background"],
        cfg_static["transcript_weight_background_index"],
        cfg_static["transcript_weight_background_value"],
    )
    return _nll(
        logprobs, tf_target, valid, weights, cfg_static["transcript_average"]
    )


def length_loss_video(width: float, lengths_raw, n_len):
    """Hinge keeping raw length logits in [-width, width]
    (models.py:527-537); applied to the first N_i steps."""
    S = lengths_raw.shape[0]
    valid = (jnp.arange(S) < n_len).astype(jnp.float32)
    y = jax.nn.relu(lengths_raw - width) + jax.nn.relu(-width - lengths_raw)
    return jnp.sum(y * valid)


def smoothing_loss_video(cfg_static, segmentation, t_valid):
    """T-MSE smoothing (models.py:398-412): MSE between consecutive
    log-softmaxed frame logits with the previous frame detached; the MEAN is
    clamped (the reference clamps the scalar, not the elements)."""
    T, M = segmentation.shape
    x = segmentation
    if cfg_static["smoothing_log_softmax_before"]:
        x = jax.nn.log_softmax(x, axis=1)
    d = x[1:, :] - jax.lax.stop_gradient(x[:-1, :])
    pair_valid = (jnp.arange(1, T) < t_valid).astype(jnp.float32)[:, None]
    denom = jnp.maximum((t_valid - 1) * M, 1).astype(jnp.float32)
    mse = jnp.sum(d * d * pair_valid) / denom
    if cfg_static["smoothing_clamp"]:
        mse = jnp.clip(
            mse, cfg_static["smoothing_clamp_min"], cfg_static["smoothing_clamp_max"]
        )
    return mse


def mucon_loss_video(
    cfg_static,
    lengths_raw,  # [S]
    segmentation,  # [T x M]
    target_transcript,  # [N_max]
    n_len,  # []
    t_valid,  # []
):
    """The mutual-consistency loss (models.py:414-523) for one video."""
    T, M = segmentation.shape
    n_max = target_transcript.shape[0]
    seg_valid = jnp.arange(n_max) < n_len

    # absolute lengths: T_i * softmax over the N_i real length logits
    logits = jnp.where(seg_valid, lengths_raw[:n_max], -jnp.inf)
    abs_lengths = t_valid.astype(jnp.float32) * jax.nn.softmax(logits)

    masks = create_masks_padded(
        T,
        t_valid,
        abs_lengths,
        seg_valid,
        overlap=cfg_static["mucon_overlap"],
        template=cfg_static["mucon_template"],
    )  # [N_max x T]

    weights = _class_weights(
        M,
        cfg_static["mucon_weight_background"],
        cfg_static["mucon_weight_background_index"],
        cfg_static["mucon_weight_background_value"],
    )
    tgt = jnp.clip(target_transcript, 0, M - 1)

    if cfg_static["mucon_type"] == "flint":
        # masked mean of frame logits per segment -> log_softmax -> NLL.
        # Reference quirk (masks.py:61-62 + models.py:460-464): create_masks
        # widens L IN PLACE by (1 + 2*overlap), so the window division uses
        # the WIDENED lengths (a no-op at the default overlap=0.0).
        widened = abs_lengths * (1.0 + 2.0 * cfg_static["mucon_overlap"])
        safe_len = jnp.where(seg_valid, jnp.maximum(widened, 1e-12), 1.0)
        window = (masks @ segmentation) / safe_len[:, None]  # [N_max x M] (MXU)
        window_lp = jax.nn.log_softmax(window, axis=1)
        return _nll(
            window_lp, tgt, seg_valid.astype(jnp.float32), weights, average=True
        )
    elif cfg_static["mucon_type"] == "arithmetic":
        # per-frame CE against each segment's word, mask-weighted, / T_i
        lp = jax.nn.log_softmax(segmentation, axis=1)  # [T x M]
        ce = -lp[:, tgt].T  # [N_max x T]
        if weights is not None:
            ce = ce * weights[tgt][:, None]
        ce = ce * seg_valid[:, None]
        return jnp.sum(ce * masks) / jnp.maximum(t_valid.astype(jnp.float32), 1.0)
    raise Exception(f"Invalid mucon type ({cfg_static['mucon_type']})")


def classification_loss_video(segmentation, gt_label, t_valid):
    """Framewise CE, mean over T_i (models.py:808-831; Tf == gt length)."""
    T, M = segmentation.shape
    lp = jax.nn.log_softmax(segmentation, axis=1)
    valid = (jnp.arange(T) < t_valid).astype(jnp.float32)
    picked = -jnp.take_along_axis(lp, jnp.clip(gt_label, 0, M - 1)[:, None], 1)[:, 0]
    return jnp.sum(picked * valid) / jnp.maximum(t_valid.astype(jnp.float32), 1.0)


def supervised_length_loss_video(lengths_raw, absolute_lengths, n_len):
    """MSE(relative GT lengths, softmaxed predictions), mean over N_i
    (models.py:833-841)."""
    n_max = absolute_lengths.shape[0]
    seg_valid = jnp.arange(n_max) < n_len
    rel_gt = absolute_lengths / jnp.maximum(jnp.sum(absolute_lengths), 1e-12)
    logits = jnp.where(seg_valid, lengths_raw[:n_max], -jnp.inf)
    rel_pred = jax.nn.softmax(logits)
    d = (rel_gt - rel_pred) ** 2 * seg_valid
    return jnp.sum(d) / jnp.maximum(n_len.astype(jnp.float32), 1.0)


def loss_static_config(cfg) -> dict:
    """Hashable snapshot of the loss options (jit-static)."""
    L = cfg.model.loss
    return dict(
        mul_mucon=L.mul_mucon,
        mul_transcript=L.mul_transcript,
        mul_smoothing=L.mul_smoothing,
        mul_length=L.mul_length,
        length_width=L.length_width,
        transcript_average=L.transcript_average,
        mucon_weight_background=L.mucon_weight_background,
        mucon_weight_background_value=L.mucon_weight_background_value,
        mucon_weight_background_index=L.mucon_weight_background_index,
        transcript_weight_background=L.transcript_weight_background,
        transcript_weight_background_value=L.transcript_weight_background_value,
        transcript_weight_background_index=L.transcript_weight_background_index,
        mucon_type=L.mucon.type,
        mucon_template=L.mucon.template,
        mucon_overlap=L.mucon.overlap,
        use_pallas_loss=bool(getattr(cfg.tpu, "use_pallas_loss", False)),
        smoothing_log_softmax_before=L.smoothing.log_softmax_before,
        smoothing_clamp=L.smoothing.clamp,
        smoothing_clamp_min=L.smoothing.clamp_min,
        smoothing_clamp_max=L.smoothing.clamp_max,
        mul_classification=L.fully_supervised.mul_classification,
        mul_supervised_length=L.fully_supervised.mul_supervised_length,
    )


def compute_loss(
    cfg_static: dict,
    fwd: MuConForwardOut,
    tf_target,  # [B x S]
    transcript,  # [B x N_max]
    transcript_len,  # [B]
    num_frames,  # [B]
    teacher_forcing: bool,
    gt_label=None,  # [B x T] (supervised variants)
    absolute_lengths=None,  # [B x N_max]
    fully_supervised=None,  # [B] bool (mixed variant)
    supervised: bool = False,
) -> MuConLoss:
    """Batched loss: per-video exact values, mean over the batch."""
    B, S, _ = fwd.transcript.shape
    n_max = transcript.shape[1]

    # target transcript for the mucon loss: GT when teacher forcing, else
    # the decoder's own argmax with out-of-range tokens clamped to 0
    # (models.py:416-427)
    if teacher_forcing:
        mucon_target = transcript
    else:
        toks = fwd.tokens[:, :n_max]
        M = fwd.segmentation.shape[-1]
        mucon_target = jnp.where(toks >= M, 0, toks)

    v_transcript = jax.vmap(partial(transcript_loss_video, cfg_static))(
        fwd.transcript, tf_target, fwd.n_steps
    )
    v_length = jax.vmap(partial(length_loss_video, cfg_static["length_width"]))(
        fwd.lengths, transcript_len
    )
    # VMEM gate mirroring the encoder kernels' 32 MB residency check: the
    # fused kernel runs grid=(1,) with the whole [B,T,M] segmentation block
    # plus per-video [N_max,T] mask temporaries resident in VMEM; past the
    # budget fall back to the vmapped XLA path instead of risking a Mosaic
    # compile blowup at bench-scale shapes (B=128, T~2048).
    _B, _T, _M = fwd.segmentation.shape
    _loss_kernel_fits = (_B * _T * _M + _B * n_max * _T) * 4 <= 32 * 1024 * 1024
    if (
        cfg_static.get("use_pallas_loss")
        and cfg_static["mucon_type"] == "flint"
        and cfg_static["mucon_template"] == "box"
        and _loss_kernel_fits
    ):
        from mucon_tpu.ops.mucon_loss_pallas import mucon_flint_fused

        M = fwd.segmentation.shape[-1]
        use_w = bool(cfg_static["mucon_weight_background"])
        w = _class_weights(
            M, True,
            cfg_static["mucon_weight_background_index"],
            cfg_static["mucon_weight_background_value"],
        ) if use_w else jnp.ones((M,), jnp.float32)
        v_mucon = mucon_flint_fused(
            fwd.lengths[:, :n_max],
            fwd.segmentation,
            mucon_target,
            transcript_len,
            num_frames,
            float(cfg_static["mucon_overlap"]),
            use_w,
            jax.default_backend() == "cpu",
            w,
        )
    else:
        v_mucon = jax.vmap(partial(mucon_loss_video, cfg_static))(
            fwd.lengths, fwd.segmentation, mucon_target, transcript_len, num_frames
        )
    v_smooth = jax.vmap(partial(smoothing_loss_video, cfg_static))(
        fwd.segmentation, num_frames
    )

    t_loss = jnp.mean(v_transcript)
    l_loss = jnp.mean(v_length)
    m_loss = jnp.mean(v_mucon)
    s_loss = jnp.mean(v_smooth)

    main = (
        cfg_static["mul_transcript"] * t_loss
        + cfg_static["mul_length"] * l_loss
        + cfg_static["mul_mucon"] * m_loss
        + cfg_static["mul_smoothing"] * s_loss
    )

    if not supervised:
        return MuConLoss(
            main=main,
            transcript_loss=t_loss,
            mucon_loss=m_loss,
            length_loss=l_loss,
            smoothing_loss=s_loss,
        )

    v_cls = jax.vmap(classification_loss_video)(
        fwd.segmentation, gt_label, num_frames
    )
    v_sup_len = jax.vmap(supervised_length_loss_video)(
        fwd.lengths, absolute_lengths, transcript_len
    )
    if fully_supervised is not None:  # mixed: only supervised videos add terms
        gate = fully_supervised.astype(jnp.float32)
    else:
        gate = jnp.ones((B,), jnp.float32)
    c_loss = jnp.mean(v_cls)
    sl_loss = jnp.mean(v_sup_len)
    main = main + jnp.mean(
        gate
        * (
            cfg_static["mul_classification"] * v_cls
            + cfg_static["mul_supervised_length"] * v_sup_len
        )
    )
    return MuConFullySupervisedLoss(
        main=main,
        transcript_loss=t_loss,
        mucon_loss=m_loss,
        length_loss=l_loss,
        smoothing_loss=s_loss,
        classification_loss=c_loss,
        supervised_length_loss=sl_loss,
    )
