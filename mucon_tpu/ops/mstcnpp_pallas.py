"""Fused MSTCN++ first-stage, whole batch in one Pallas program.

The dual-dilation stage (models/temporal.py:166-197, reference
temporal.py:150-204) has the same shift-matmul structure as the WaveNet
stack, so it gets the same treatment as ops/wavenet_pallas_v2.py: the
full [B x T x C] residual stream stays VMEM-resident, (B, T) flattens
into the MXU M-dimension, shifts/pools/masks run in the 3-D view.  Per
layer: two dilated conv3s (d1 = 2^(L-1-i) falling, d2 = 2^i rising),
their concat-then-1x1 decomposed as y1 @ W_top + y2 @ W_bot (no concat
materialized), relu, residual, optional max-pool.

Eval/inference only (no VJP) — mirrors the WaveNet v2 kernel's role;
training keeps the XLA path.  Dropout is eval-deterministic (off).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mucon_tpu.ops.wavenet_pallas_v2 import _bt_mask, _matmul_bt, _shift_batch


def pack_mstcnpp_params(ft_params, num_layers: int):
    """Stack per-layer params of MSTCNPPFirstStage (flax names: Conv1x1_0
    in-proj; per layer i DilatedConv3_{2i} / DilatedConv3_{2i+1} /
    Conv1x1_{i+1}; final Conv1x1_{num_layers+1}).  Returns
    (w3a, b3a, w3b, b3b, w1t, w1b, b1, w_out, b_out); the 2C->C concat
    conv splits into top/bottom halves along its input dim."""
    w3a = jnp.stack(
        [ft_params[f"DilatedConv3_{2 * i}"]["kernel"] for i in range(num_layers)]
    )
    b3a = jnp.stack(
        [ft_params[f"DilatedConv3_{2 * i}"]["bias"] for i in range(num_layers)]
    )
    w3b = jnp.stack(
        [ft_params[f"DilatedConv3_{2 * i + 1}"]["kernel"] for i in range(num_layers)]
    )
    b3b = jnp.stack(
        [ft_params[f"DilatedConv3_{2 * i + 1}"]["bias"] for i in range(num_layers)]
    )
    w1 = jnp.stack(
        [ft_params[f"Conv1x1_{i + 1}"]["kernel"] for i in range(num_layers)]
    )  # [L, 2C, C]
    b1 = jnp.stack(
        [ft_params[f"Conv1x1_{i + 1}"]["bias"] for i in range(num_layers)]
    )
    C = w3a.shape[-1]
    w1t, w1b = w1[:, :C, :], w1[:, C:, :]
    w_out = ft_params[f"Conv1x1_{num_layers + 1}"]["kernel"]
    b_out = ft_params[f"Conv1x1_{num_layers + 1}"]["bias"]
    return w3a, b3a, w3b, b3b, w1t, w1b, b1, w_out, b_out


def _conv3(x, d, w, b, mm_dtype):
    """Dilated conv3 as three shifted flattened matmuls (same tap order
    as models.temporal.DilatedConv3: shift(-d) @ w[0] + x @ w[1] +
    shift(+d) @ w[2] + b)."""
    return (
        _matmul_bt(_shift_batch(x, -d), w[0], mm_dtype)
        + _matmul_bt(x, w[1], mm_dtype)
        + _matmul_bt(_shift_batch(x, d), w[2], mm_dtype)
        + b[None, None, :]
    )


def _mstcnpp_kernel(
    num_layers, pooling_layers, t_in, n_videos, mm_dtype,
    len_ref,  # scalar prefetch [B]
    x_ref, w3a_ref, b3a_ref, w3b_ref, b3b_ref, w1t_ref, w1b_ref, b1_ref,
    wo_ref, bo_ref,
    out_ref,
):
    B = n_videos
    L = num_layers
    lengths = jnp.stack([len_ref[b] for b in range(B)])
    t = t_in
    f = x_ref[:] * _bt_mask(B, t, lengths)

    def cast(v):
        return v if mm_dtype is None else v.astype(mm_dtype)

    for i in range(L):
        d1 = 2 ** (L - 1 - i)
        d2 = 2 ** i
        fb = cast(f)
        y1 = _conv3(fb, d1, w3a_ref[i], b3a_ref[i], mm_dtype)
        y2 = _conv3(fb, d2, w3b_ref[i], b3b_ref[i], mm_dtype)
        y = (
            _matmul_bt(cast(y1), w1t_ref[i], mm_dtype)
            + _matmul_bt(cast(y2), w1b_ref[i], mm_dtype)
            + b1_ref[i][None, None, :]
        )
        f = (jnp.maximum(y, 0.0) + f) * _bt_mask(B, t, lengths)
        if i in pooling_layers:
            pairs = f[:, : (t // 2) * 2].reshape(B, t // 2, 2, f.shape[2])
            f = jnp.max(pairs, axis=2)
            t, lengths = t // 2, lengths // 2
            f = f * _bt_mask(B, t, lengths)

    out = _matmul_bt(cast(f), wo_ref[:], mm_dtype) + bo_ref[:][None, None, :]
    out_ref[:] = out * _bt_mask(B, t, lengths)


def mstcnpp_stack_pallas(
    x,  # [B x T x C] float32 (post in-projection Conv1x1_0, masked — NO relu)
    lengths,  # [B] int32
    w3a, b3a, w3b, b3b, w1t, w1b, b1, w_out, b_out,
    num_layers: int,
    pooling_layers: Sequence[int],
    interpret: bool = False,
    mm_dtype=None,
):
    B, T, C = x.shape
    Co = w_out.shape[-1]
    n_pools = sum(1 for i in pooling_layers if i < num_layers)
    t_out = T >> n_pools
    assert T % (1 << n_pools) == 0, (T, n_pools)

    kernel = partial(
        _mstcnpp_kernel,
        num_layers,
        tuple(int(p) for p in pooling_layers),
        T,
        B,
        mm_dtype,
    )
    L = num_layers
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((B, T, C), lambda g, *_: (0, 0, 0)),
            pl.BlockSpec((L, 3, C, C), lambda g, *_: (0, 0, 0, 0)),
            pl.BlockSpec((L, C), lambda g, *_: (0, 0)),
            pl.BlockSpec((L, 3, C, C), lambda g, *_: (0, 0, 0, 0)),
            pl.BlockSpec((L, C), lambda g, *_: (0, 0)),
            pl.BlockSpec((L, C, C), lambda g, *_: (0, 0, 0)),
            pl.BlockSpec((L, C, C), lambda g, *_: (0, 0, 0)),
            pl.BlockSpec((L, C), lambda g, *_: (0, 0)),
            pl.BlockSpec((C, Co), lambda g, *_: (0, 0)),
            pl.BlockSpec((Co,), lambda g, *_: (0,)),
        ],
        out_specs=pl.BlockSpec((B, t_out, Co), lambda g, *_: (0, 0, 0)),
    )
    z = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, t_out, Co), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), x, w3a, b3a, w3b, b3b, w1t, w1b, b1,
      w_out, b_out)
    return z, lengths >> n_pools


# resident tensors per slice: residual f, shifted operand, y1, y2 — one
# more live [B, T, C] block than the WaveNet kernel (dual conv), so the
# per-video estimate uses 4 blocks against the same validated-magnitude
# budget
_EVAL_SLICE_BYTES_BUDGET = 32 * 1024 * 1024


def plan_mstcnpp_slices(B, T, C, budget=_EVAL_SLICE_BYTES_BUDGET):
    per_video = T * C * 4 * 4
    for nb in range(1, B + 1):
        if B % nb == 0 and (B // nb) * per_video <= budget:
            return nb
    return None


def mstcnpp_stack_pallas_sliced(
    x, lengths, *packed,
    num_layers, pooling_layers, interpret=False, mm_dtype=None,
    slice_budget=_EVAL_SLICE_BYTES_BUDGET,
):
    """Batch-sliced wrapper (videos are row-independent: sliced ==
    unsliced bitwise).  Returns None when nothing fits (XLA fallback)."""
    B, T, C = x.shape
    nb = plan_mstcnpp_slices(B, T, C, budget=slice_budget)
    if nb is None:
        return None
    bs = B // nb
    zs, tzs = [], []
    for i in range(nb):
        z_i, tz_i = mstcnpp_stack_pallas(
            x[i * bs : (i + 1) * bs], lengths[i * bs : (i + 1) * bs],
            *packed, num_layers=num_layers, pooling_layers=pooling_layers,
            interpret=interpret, mm_dtype=mm_dtype,
        )
        zs.append(z_i)
        tzs.append(tz_i)
    if nb == 1:
        return zs[0], tzs[0]
    return jnp.concatenate(zs, axis=0), jnp.concatenate(tzs, axis=0)
