"""Fused mutual-consistency ("flint") loss as one Pallas program.

The XLA path (models/losses.py:mucon_loss_video) materializes the [N x T]
segment masks in HBM for every video, then runs the masked-mean matmul.
This kernel is the SURVEY §2.12(b) native equivalent: for the whole batch it
builds each video's masks closed-form in VMEM (never touching HBM), runs the
[N x T] @ [T x M] window reduction on the MXU, and emits the per-video NLL —
one HBM read of the segmentation logits, one [B] write.

Scope: the README-default configuration — template "box", loss type
"flint" (reference models.py:456-488, masks.py:19-74). Other templates /
"arithmetic" use the XLA path (the template-table bilinear gather does not
vectorize on lanes).

Gradients: `mucon_flint_fused` is a jax.custom_vjp whose backward is the
jax.vjp of the mathematically-identical XLA closed form — exact, and the
backward masks regenerate under XLA fusion rather than being stashed.
Parity: tests/test_pallas_loss.py (kernel vs mucon_loss_video, values and
gradients, padded batches).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mucon_tpu.models.masks import TEMPLATE_WIDTH, create_masks_padded

_NEG = -1e30


def _flint_video_xla(lengths_raw, segmentation, target, n_len, t_valid,
                     overlap: float, weights):
    """Closed-form flint loss for one video (== mucon_loss_video's flint
    branch, models.py:456-488); used as the custom-VJP backward."""
    T, M = segmentation.shape
    n_max = target.shape[0]
    seg_valid = jnp.arange(n_max) < n_len
    logits = jnp.where(seg_valid, lengths_raw[:n_max], -jnp.inf)
    abs_lengths = t_valid.astype(jnp.float32) * jax.nn.softmax(logits)
    masks = create_masks_padded(
        T, t_valid, abs_lengths, seg_valid, overlap=overlap, template="box"
    )
    # reference quirk: the window divides by the (1 + 2*overlap)-widened
    # lengths (create_masks mutates L in place, masks.py:61-62)
    widened = abs_lengths * (1.0 + 2.0 * overlap)
    safe_len = jnp.where(seg_valid, jnp.maximum(widened, 1e-12), 1.0)
    window = (masks @ segmentation) / safe_len[:, None]
    window_lp = jax.nn.log_softmax(window, axis=1)
    tgt = jnp.clip(target, 0, M - 1)
    picked = -jnp.take_along_axis(window_lp, tgt[:, None], axis=1)[:, 0]
    w = jnp.ones_like(picked) if weights is None else weights[tgt]
    w = w * seg_valid.astype(jnp.float32)
    return jnp.sum(picked * w) / jnp.maximum(jnp.sum(w), 1e-12)


def _flint_batch_xla(lengths_raw, segmentation, target, n_len, t_valid,
                     overlap: float, weights):
    return jax.vmap(
        partial(_flint_video_xla, overlap=overlap, weights=weights)
    )(lengths_raw, segmentation, target, n_len, t_valid)


def _flint_kernel(
    n_videos, n_max, use_weights,
    nlen_ref, tval_ref, tgt_ref,  # scalar prefetch
    scale_ref, xloc_ref, sdiv_ref, seg_ref, w_ref,
    out_ref,
):
    """Mask gen + window matmul + NLL. The tiny per-segment vector math
    (lengths softmax, cumsum, scale/offset) runs in XLA outside: Mosaic
    cannot lower lane reductions on [1 x S] row vectors. All in-kernel
    reductions are [S x M] row-wise or full-2D."""
    B = n_videos
    T, M = seg_ref.shape[1], seg_ref.shape[2]
    S = scale_ref.shape[1]

    iota_t = jax.lax.broadcasted_iota(jnp.int32, (S, T), 1)
    iota_m = jax.lax.broadcasted_iota(jnp.int32, (S, M), 1)
    rows_m = jax.lax.broadcasted_iota(jnp.int32, (S, M), 0)
    rows_t = jax.lax.broadcasted_iota(jnp.int32, (S, T), 0)

    losses = []
    for b in range(B):
        nv = nlen_ref[b]
        tvi = tval_ref[b]
        tv = tvi.astype(jnp.float32)

        # masks [S x T], closed-form box template (masks.py:19-74 semantics)
        # scale/xloc/sdiv arrive lane-replicated [S x 8]; [:, :1] gives the
        # column orientation without a 1-D relayout (Mosaic chokes on
        # [1 x S] row-vector reductions/transposes)
        g = -1.0 + 2.0 * iota_t.astype(jnp.float32) / jnp.maximum(tv - 1.0, 1.0)
        scale = scale_ref[b][:, :1]  # [S x 1]
        xloc = xloc_ref[b][:, :1]
        c = (scale * g + xloc + 1.0) * 0.5 * (TEMPLATE_WIDTH - 1)
        m = jnp.clip(jnp.minimum(c + 1.0, TEMPLATE_WIDTH - c), 0.0, 1.0)
        m = jnp.where((c <= -1.0) | (c >= TEMPLATE_WIDTH), 0.0, m)
        ok = (iota_t < tvi) & (rows_t < nv)
        masks = jnp.where(ok, m, 0.0)

        # masked mean window + log_softmax + NLL  (MXU matmul)
        window = jnp.dot(masks, seg_ref[b], preferred_element_type=jnp.float32)
        window = window / sdiv_ref[b][:, :1]
        wz = window - jnp.max(window, axis=1, keepdims=True)
        lsm = wz - jnp.log(jnp.sum(jnp.exp(wz), axis=1, keepdims=True))

        tgt = jnp.stack([tgt_ref[b, i] for i in range(n_max)])  # SMEM reads
        tgt = jnp.clip(tgt, 0, M - 1)
        onehot = (iota_m == tgt[:, None]).astype(jnp.float32)
        valid_rows = (rows_m < nv).astype(jnp.float32)
        wfull = (
            onehot * w_ref[:][None, :] if use_weights else onehot
        ) * valid_rows
        num = jnp.sum(wfull * lsm)  # full-2D reductions -> scalars
        den = jnp.sum(wfull)
        loss_b = -num / jnp.maximum(den, 1e-12)
        losses.append(loss_b * jnp.ones((1, 8), jnp.float32))

    out_ref[:] = jnp.concatenate(losses, axis=0)


def mucon_flint_pallas(
    lengths_raw,  # [B x S] float32 raw length logits
    segmentation,  # [B x T x M] float32 frame logits (padded)
    target,  # [B x N_max] int32 transcript words
    n_len,  # [B] int32 real transcript lengths
    t_valid,  # [B] int32 real frame counts
    overlap: float = 0.0,
    weights: Optional[jnp.ndarray] = None,  # [M] class weights
    interpret: bool = False,
):
    """Per-video flint losses [B] — forward kernel (no VJP). S must equal
    N_max (the caller slices lengths_raw[:, :n_max])."""
    B, S = lengths_raw.shape
    _, T, M = segmentation.shape
    n_max = target.shape[1]
    assert S == n_max, (S, n_max)
    use_weights = weights is not None
    w = weights if use_weights else jnp.ones((M,), jnp.float32)

    # XLA prep: the tiny per-segment vector math (Mosaic cannot lower
    # [1 x S] row reductions; see kernel docstring)
    valid = jnp.arange(S)[None, :] < n_len[:, None]  # [B x S]
    tv = t_valid.astype(jnp.float32)[:, None]
    logits = jnp.where(valid, lengths_raw, -jnp.inf)
    abs_len = tv * jax.nn.softmax(logits, axis=1)
    pis = jnp.cumsum(abs_len, axis=1) - abs_len
    Lw = abs_len * (1.0 + 2.0 * overlap)
    pis = pis - Lw * (overlap / 2.0)
    safe_L = jnp.where(valid, jnp.maximum(Lw, 1e-6), 1.0)
    scale = tv / safe_L
    xloc = -(pis + safe_L / 2.0 - tv / 2.0) / (safe_L / 2.0)
    safe_div = jnp.where(valid, jnp.maximum(Lw, 1e-12), 1.0)

    def rep8(a):  # lane-replicate [B x S] -> [B x S x 8]
        return jnp.broadcast_to(a[:, :, None], (B, S, 8))

    kernel = partial(_flint_kernel, B, n_max, use_weights)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((B, S, 8), lambda g, *_: (0, 0, 0)),
            pl.BlockSpec((B, S, 8), lambda g, *_: (0, 0, 0)),
            pl.BlockSpec((B, S, 8), lambda g, *_: (0, 0, 0)),
            pl.BlockSpec((B, T, M), lambda g, *_: (0, 0, 0)),
            pl.BlockSpec((M,), lambda g, *_: (0,)),
        ],
        out_specs=pl.BlockSpec((B, 8), lambda g, *_: (0, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        n_len.astype(jnp.int32),
        t_valid.astype(jnp.int32),
        target.astype(jnp.int32),
        rep8(scale),
        rep8(xloc),
        rep8(safe_div),
        segmentation,
        w,
    )
    return out[:, 0]


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def mucon_flint_fused(lengths_raw, segmentation, target, n_len, t_valid,
                      overlap, use_weights, interpret, weights):
    """Differentiable fused flint loss [B].

    `weights` must be an all-ones [M] array when use_weights is False (it
    is a diff-able positional arg so the VJP structure stays fixed).
    """
    return mucon_flint_pallas(
        lengths_raw, segmentation, target, n_len, t_valid,
        overlap, weights if use_weights else None, interpret,
    )


def _fused_fwd(lengths_raw, segmentation, target, n_len, t_valid,
               overlap, use_weights, interpret, weights):
    out = mucon_flint_fused(
        lengths_raw, segmentation, target, n_len, t_valid,
        overlap, use_weights, interpret, weights,
    )
    return out, (lengths_raw, segmentation, target, n_len, t_valid, weights)


def _fused_bwd(overlap, use_weights, interpret, res, g):
    lengths_raw, segmentation, target, n_len, t_valid, weights = res

    def fn(lr, seg, w):
        return _flint_batch_xla(
            lr, seg, target, n_len, t_valid, overlap,
            w if use_weights else None,
        )

    _, vjp = jax.vjp(fn, lengths_raw, segmentation, weights)
    d_lr, d_seg, d_w = vjp(g)
    if not use_weights:
        d_w = jnp.zeros_like(weights)
    return (d_lr, d_seg, None, None, None, d_w)


mucon_flint_fused.defvjp(_fused_fwd, _fused_bwd)
