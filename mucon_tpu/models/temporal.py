"""Temporal backbones: dilated-conv encoder stacks.

Semantics match the reference modules (src/core/modules/temporal.py):

* `WaveNetBlock` — 1x1 in-projection, K dilated residual layers
  (dilated conv3 -> ReLU -> 1x1 conv -> dropout -> +residual), pool-by-2
  after a configurable subset of layers (16x downsample by default), 1x1
  out-projection (temporal.py:77-147).
* `MSTCNPPFirstStage` — dual-dilation MS-TCN++ stage (temporal.py:150-204).
* `NoFt` — single 1x1 conv (temporal.py:56-74).

TPU design: channel-last [B x T x C] layout; 1x1 convs are plain MXU
matmuls; the k=3 dilated conv is expressed as three shifted matmuls (XLA
fuses the shifts into the convolution epilogue; a fused Pallas residual
stack lives in mucon_tpu/ops/wavenet_pallas_v2.py).  Per-video lengths are
re-masked after every time-mixing op so padded batches compute EXACTLY what
the reference computes on exact-length tensors (zero padding == torch
Conv1d zero padding; verified by tests/test_temporal.py).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mucon_tpu.models.layers import mask_time, torch_linear_init


def shift_time(x, offset: int):
    """x[:, t + offset, :] with zero padding (time-shifted view).

    When |offset| >= T (a dilation wider than the pooled sequence — happens
    for the late 512/1024-dilation layers on short videos) every tap falls
    in the zero padding."""
    if offset == 0:
        return x
    B, T, C = x.shape
    if abs(offset) >= T:
        return jnp.zeros_like(x)
    if offset > 0:
        return jnp.pad(x[:, offset:], ((0, 0), (0, offset), (0, 0)))
    return jnp.pad(x[:, :offset], ((0, 0), (-offset, 0), (0, 0)))


class Conv1x1(nn.Module):
    """Pointwise conv == Dense over channels, torch-default init."""

    in_features: int
    out_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        init = torch_linear_init(self.in_features)
        w = self.param("kernel", init, (self.in_features, self.out_features))
        b = self.param("bias", init, (self.out_features,))
        y = jnp.dot(x.astype(self.dtype), w.astype(self.dtype))
        return y + b.astype(self.dtype)


class DilatedConv3(nn.Module):
    """Kernel-3 dilated conv with SAME zero padding (torch padding=dilation).

    Expressed as three shifted pointwise matmuls — each maps onto the MXU,
    and XLA fuses the shifts; keeps a single weight layout shared with the
    Pallas kernel.
    """

    channels_in: int
    channels_out: int
    dilation: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        init = torch_linear_init(self.channels_in * 3)
        w = self.param("kernel", init, (3, self.channels_in, self.channels_out))
        b = self.param("bias", init, (self.channels_out,))
        d = self.dilation
        w = w.astype(self.dtype)
        x = x.astype(self.dtype)
        y = (
            shift_time(x, -d) @ w[0]
            + x @ w[1]
            + shift_time(x, d) @ w[2]
        )
        return y + b.astype(self.dtype)


class WaveNetLayer(nn.Module):
    """Dilated conv3 -> nonlin -> 1x1 -> dropout -> residual
    (temporal.py:9-53)."""

    channels: int
    dilation: int
    dropout_rate: float = 0.25
    leaky: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lengths, train: bool):
        y = DilatedConv3(
            self.channels, self.channels, self.dilation, dtype=self.dtype
        )(x)
        y = nn.leaky_relu(y) if self.leaky else nn.relu(y)
        y = Conv1x1(self.channels, self.channels, dtype=self.dtype)(y)
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        y = y + x
        # padded positions pick up conv bias; re-zero so later dilated taps
        # read exactly the zeros torch's exact-length tensors imply
        return mask_time(y, lengths)


def pool2_time(x, pooling_type: str):
    """Downsample time by 2 (torch max_pool1d/avg_pool1d(k=2) semantics:
    output length floor(T/2), odd trailing frame dropped)."""
    B, T, C = x.shape
    t2 = (T // 2) * 2
    pairs = x[:, :t2].reshape(B, T // 2, 2, C)
    if pooling_type == "max":
        return jnp.max(pairs, axis=2)
    # "sum": avg_pool * 2 (temporal.py:140-142)
    return jnp.mean(pairs, axis=2) * 2.0


class WaveNetBlock(nn.Module):
    """See module docstring. Returns (features [B x T' x C], lengths')."""

    in_channels: int
    stages: Sequence[int] = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024)
    out_dims: int = 64
    pooling: bool = True
    pooling_layers: Sequence[int] = (1, 2, 4, 8)
    pooling_type: str = "max"
    dropout_rate: float = 0.25
    leaky: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lengths, train: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
        nonlin = nn.leaky_relu if self.leaky else nn.relu
        x = nonlin(Conv1x1(self.in_channels, self.out_dims, dtype=self.dtype)(x))
        x = mask_time(x, lengths)

        for i, dilation in enumerate(self.stages):
            x = WaveNetLayer(
                self.out_dims,
                dilation,
                dropout_rate=self.dropout_rate,
                leaky=self.leaky,
                dtype=self.dtype,
            )(x, lengths, train)
            if self.pooling and i in self.pooling_layers:
                x = pool2_time(x, self.pooling_type)
                lengths = lengths // 2
                x = mask_time(x, lengths)

        x = nonlin(x)
        x = Conv1x1(self.out_dims, self.out_dims, dtype=self.dtype)(x)
        return mask_time(x, lengths), lengths


class MSTCNPPFirstStage(nn.Module):
    """Dual-dilation MS-TCN++ first stage (temporal.py:150-204)."""

    input_dim: int
    num_layers: int
    num_f_maps: int
    output_dim: int
    pooling_layers: Sequence[int] = (1, 2, 4, 8)
    dropout_rate: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lengths, train: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
        f = Conv1x1(self.input_dim, self.num_f_maps, dtype=self.dtype)(x)
        f = mask_time(f, lengths)
        for i in range(self.num_layers):
            d1 = 2 ** (self.num_layers - 1 - i)
            d2 = 2 ** i
            y1 = DilatedConv3(self.num_f_maps, self.num_f_maps, d1, dtype=self.dtype)(f)
            y2 = DilatedConv3(self.num_f_maps, self.num_f_maps, d2, dtype=self.dtype)(f)
            y = Conv1x1(2 * self.num_f_maps, self.num_f_maps, dtype=self.dtype)(
                jnp.concatenate([y1, y2], axis=-1)
            )
            y = nn.relu(y)
            y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
            f = mask_time(y + f, lengths)
            if i in self.pooling_layers:
                f = pool2_time(f, "max")
                lengths = lengths // 2
                f = mask_time(f, lengths)
        out = Conv1x1(self.num_f_maps, self.output_dim, dtype=self.dtype)(f)
        return mask_time(out, lengths), lengths


class NoFt(nn.Module):
    """Single 1x1 conv (temporal.py:56-74)."""

    in_channels: int
    out_dims: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lengths, train: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
        out = Conv1x1(self.in_channels, self.out_dims, dtype=self.dtype)(x)
        return mask_time(out, lengths), lengths
