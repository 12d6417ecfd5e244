"""Fused WaveNet residual stack as a single Pallas TPU kernel.

The encoder's hot loop is 11 dilated residual conv layers with interleaved
2x max-pools (mucon_tpu/models/temporal.py, reference temporal.py:77-147).
Compiled layer-by-layer, each layer round-trips its [T x C] activations
through HBM twice (two matmuls per layer).  This kernel keeps the entire
video resident in VMEM: one [T x C] read, one [T/16 x C] write, with all
2 x 11 matmuls hitting the MXU back-to-back and the shifts/pools/masks in
registers.  (~20x HBM traffic reduction on the stack; the 2048->C input
projection stays outside as one large XLA matmul.)

Layout notes (pallas_guide.md):
* C = 128 = one MXU/VPU lane dim; tiles are (8k, 128)-aligned f32;
* grid = (B,): one program per video, weights broadcast to every program;
* per-video valid lengths ride in as scalar-prefetch (SMEM) so masking and
  pooling track each video's true frame count — results match the masked
  XLA path exactly (tests/test_pallas.py);
* forward-only: used on the inference/eval path; training uses the XLA
  path (a custom-VJP backward kernel is the planned follow-up).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_rows(x, offset: int):
    """rows[t] = x[t + offset] with zero fill (kernel-internal, static)."""
    T = x.shape[0]
    if offset == 0:
        return x
    if abs(offset) >= T:
        return jnp.zeros_like(x)
    pad = jnp.zeros((abs(offset), x.shape[1]), x.dtype)
    if offset > 0:
        return jnp.concatenate([x[offset:], pad], axis=0)
    return jnp.concatenate([pad, x[:offset]], axis=0)


def _row_mask(t: int, length):
    ids = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
    return (ids < length).astype(jnp.float32)


def _stack_kernel(
    stages: Tuple[int, ...],
    pooling_layers: Tuple[int, ...],
    pooling_type: str,
    leaky: bool,
    t_in: int,
    len_ref,  # scalar-prefetch: [B] int32
    x_ref,  # [1 x T x C] VMEM
    w3_ref,  # [L x 3 x C x C]
    b3_ref,  # [L x C]
    w1_ref,  # [L x C x C]
    b1_ref,  # [L x C]
    wl_ref,  # [C x C]  (block out-projection)
    bl_ref,  # [C]
    out_ref,  # [1 x T_out x C]
):
    b = pl.program_id(0)
    length = len_ref[b]
    nonlin = (lambda v: jnp.where(v > 0, v, 0.01 * v)) if leaky else (
        lambda v: jnp.maximum(v, 0.0)
    )

    x = x_ref[0]  # [T x C]
    t = t_in
    x = x * _row_mask(t, length)

    for i, d in enumerate(stages):
        w_l = w3_ref[i, 0]
        w_c = w3_ref[i, 1]
        w_r = w3_ref[i, 2]
        y = (
            jnp.dot(_shift_rows(x, -d), w_l, preferred_element_type=jnp.float32)
            + jnp.dot(x, w_c, preferred_element_type=jnp.float32)
            + jnp.dot(_shift_rows(x, d), w_r, preferred_element_type=jnp.float32)
            + b3_ref[i][None, :]
        )
        y = nonlin(y)
        y = jnp.dot(y, w1_ref[i], preferred_element_type=jnp.float32)
        y = y + b1_ref[i][None, :]
        x = y + x
        x = x * _row_mask(t, length)
        if i in pooling_layers:
            pairs = x[: (t // 2) * 2].reshape(t // 2, 2, x.shape[1])
            if pooling_type == "max":
                x = jnp.max(pairs, axis=1)
            else:
                x = jnp.mean(pairs, axis=1) * 2.0
            t = t // 2
            length = length // 2
            x = x * _row_mask(t, length)

    x = nonlin(x)
    x = jnp.dot(x, wl_ref[:], preferred_element_type=jnp.float32)
    x = x + bl_ref[:][None, :]
    out_ref[0] = x * _row_mask(t, length)


def wavenet_stack_pallas(
    x,  # [B x T x C] float32 (already input-projected + relu'd + masked)
    lengths,  # [B] int32
    w3,  # [L x 3 x C x C]
    b3,  # [L x C]
    w1,  # [L x C x C]
    b1,  # [L x C]
    w_last,  # [C x C]
    b_last,  # [C]
    stages: Sequence[int],
    pooling_layers: Sequence[int],
    pooling_type: str = "max",
    leaky: bool = False,
    interpret: bool = False,
):
    """Returns (z [B x T_out x C], out_lengths [B]).

    Semantics identical to the masked XLA path in
    mucon_tpu/models/temporal.py (WaveNetBlock minus its first conv):
    layers -> pools -> final nonlin -> out-projection, with per-video
    masking after every step.
    """
    B, T, C = x.shape
    L = len(stages)
    n_pools = sum(1 for i in pooling_layers if i < L)
    t_out = T >> n_pools
    assert T % (1 << n_pools) == 0, (T, n_pools)

    kernel = partial(
        _stack_kernel,
        tuple(stages),
        tuple(int(p) for p in pooling_layers),
        pooling_type,
        leaky,
        T,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, C), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((L, 3, C, C), lambda b, *_: (0, 0, 0, 0)),
            pl.BlockSpec((L, C), lambda b, *_: (0, 0)),
            pl.BlockSpec((L, C, C), lambda b, *_: (0, 0, 0)),
            pl.BlockSpec((L, C), lambda b, *_: (0, 0)),
            pl.BlockSpec((C, C), lambda b, *_: (0, 0)),
            pl.BlockSpec((C,), lambda b, *_: (0,)),
        ],
        out_specs=pl.BlockSpec((1, t_out, C), lambda b, *_: (b, 0, 0)),
    )
    flops = 2 * B * sum(
        (T >> sum(1 for p in pooling_layers if p < i)) * C * C * 4
        for i in range(L)
    )
    z = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, t_out, C), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=4 * B * (T + t_out) * C, transcendentals=0
        ),
    )(lengths.astype(jnp.int32), x, w3, b3, w1, b1, w_last, b_last)
    out_lengths = lengths >> n_pools
    return z, out_lengths


def pack_wavenet_params(params: dict, n_layers: int):
    """Stack per-layer flax params (mucon_tpu WaveNetBlock tree) into the
    kernel's packed [L, ...] arrays.

    Layout: params['WaveNetLayer_{i}']['DilatedConv3_0' | 'Conv1x1_0'],
    plus 'Conv1x1_0' (in-proj, not packed) and 'Conv1x1_1' (out-proj).
    """
    w3 = jnp.stack(
        [params[f"WaveNetLayer_{i}"]["DilatedConv3_0"]["kernel"] for i in range(n_layers)]
    )
    b3 = jnp.stack(
        [params[f"WaveNetLayer_{i}"]["DilatedConv3_0"]["bias"] for i in range(n_layers)]
    )
    w1 = jnp.stack(
        [params[f"WaveNetLayer_{i}"]["Conv1x1_0"]["kernel"] for i in range(n_layers)]
    )
    b1 = jnp.stack(
        [params[f"WaveNetLayer_{i}"]["Conv1x1_0"]["bias"] for i in range(n_layers)]
    )
    w_last = params["Conv1x1_1"]["kernel"]
    b_last = params["Conv1x1_1"]["bias"]
    return w3, b3, w1, b1, w_last, b_last
