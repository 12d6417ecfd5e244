"""Shared building blocks: torch-default initializers and masked ops.

The reference relies on PyTorch default initializations (Conv1d/Linear:
kaiming-uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)); LSTM: U(+-1/sqrt(H));
Embedding: N(0,1)) and on `rand_p` scaled-normal parameters
(models.py:22-27).  Training dynamics — and therefore metric parity — depend
on these distributions, so we reproduce them exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def torch_linear_init(fan_in: int):
    """U(+-1/sqrt(fan_in)) — torch Linear/Conv default for weight AND bias."""
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_lstm_init(hidden: int):
    """U(+-1/sqrt(hidden)) — torch LSTM default for all weights/biases."""
    return torch_linear_init(hidden)


def scaled_normal_init(scale_dim: int):
    """randn(shape)/sqrt(shape[0]) — the reference's rand_p (models.py:22-27)."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) / np.sqrt(scale_dim)

    return init


def time_mask(t_pad: int, lengths, dtype=jnp.float32):
    """[B x t_pad] validity mask from per-video frame counts."""
    ids = jnp.arange(t_pad)
    return (ids[None, :] < lengths[:, None]).astype(dtype)


def mask_time(x, lengths):
    """Zero a [B x T x C] tensor beyond each video's length."""
    m = time_mask(x.shape[1], lengths, x.dtype)
    return x * m[:, :, None]


def masked_group_norm(x, lengths, num_groups: int, scale, bias, eps: float = 1e-5):
    """GroupNorm over (channels-in-group x valid-time), per video.

    torch GroupNorm on [1 x C x T] normalizes over (C/G * T) elements; with
    padded batches the statistics must cover only the T_i valid frames
    (reference applies it to exact-length tensors, models.py:759-760).
    """
    B, T, C = x.shape
    G = num_groups
    m = time_mask(T, lengths, x.dtype)  # [B x T]
    xg = x.reshape(B, T, G, C // G)
    count = (lengths.astype(x.dtype) * (C // G))[:, None]  # [B x 1]
    mean = jnp.sum(xg * m[:, :, None, None], axis=(1, 3)) / count  # [B x G]
    var = (
        jnp.sum((xg - mean[:, None, :, None]) ** 2 * m[:, :, None, None], axis=(1, 3))
        / count
    )
    xn = (xg - mean[:, None, :, None]) * jax.lax.rsqrt(var[:, None, :, None] + eps)
    xn = xn.reshape(B, T, C)
    return xn * scale[None, None, :] + bias[None, None, :]


def nearest_upsample_indices(src_lengths, dst_len: int, dst_lengths):
    """[B x dst_len] int32 source indices of the per-video nearest
    upsample: idx[b, t] = clip(floor(t * src_len_b / dst_len_b)).
    Monotone non-decreasing in t (consumers rely on this — the fused
    eval's window-sum construction uses searchsorted over it)."""
    t_ids = jnp.arange(dst_len)  # [T]
    scale = src_lengths.astype(jnp.float32) / jnp.maximum(
        dst_lengths.astype(jnp.float32), 1
    )
    idx = jnp.floor(t_ids[None, :] * scale[:, None]).astype(jnp.int32)
    return jnp.clip(idx, 0, jnp.maximum(src_lengths - 1, 0)[:, None])


def interpolate_nearest_time(x, src_lengths, dst_len: int, dst_lengths):
    """Per-video nearest-neighbor upsample along time.

    torch F.interpolate(mode='nearest') semantics: out[i] = in[floor(i *
    src_len / dst_len)], applied per video with its own (src, dst) lengths
    (reference models.py:574-576 with bs=1 exact lengths).
    """
    idx = nearest_upsample_indices(src_lengths, dst_len, dst_lengths)
    return jnp.take_along_axis(x, idx[:, :, None], axis=1)
