"""Fused WaveNet stack, v2: whole batch in one Pallas program.

The retired v1 kernel ran one grid program per video, so each matmul saw
only T rows and the B programs serialized on the core (1.58 ms vs XLA's
1.51 at B=8/T=2048).  v2 keeps the full [B x T x C] batch resident in VMEM
and flattens (B, T) into the matmul M-dimension — every MXU op processes
B*T rows, shifts/pools/masks stay in the 3-D view, and there is no grid at
all (grid=(1,)).  HBM traffic is one batch read + one [B x T/16 x C] write
for the whole 11-layer stack (measured 1.08 ms: 1.4x faster than XLA).

Needs vmem_limit_bytes raised above the Mosaic default (the batch plus two
temporaries is ~3 x B*T*C*4 bytes; v5e has headroom).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_batch(x, offset: int):
    """x[:, t + offset, :] with zero fill, per video (3-D view)."""
    B, T, C = x.shape
    if offset == 0:
        return x
    if abs(offset) >= T:
        return jnp.zeros_like(x)
    pad = jnp.zeros((B, abs(offset), C), x.dtype)
    if offset > 0:
        return jnp.concatenate([x[:, offset:], pad], axis=1)
    return jnp.concatenate([pad, x[:, :offset]], axis=1)


def _bt_mask(b, t, lengths):
    ids = jax.lax.broadcasted_iota(jnp.int32, (b, t), 1)
    return (ids < lengths[:, None]).astype(jnp.float32)[:, :, None]


def _matmul_bt(x, w, mm_dtype=None):
    """[B x T x C] @ [C x C'] through a flattened (B*T, C) MXU matmul.

    Precision note (measured, scripts/probe_mosaic_precision_tpu.py on
    v5e): Mosaic lowers this f32 dot exactly like XLA's DEFAULT matmul
    precision — ONE bf16 MXU pass per operand pair, f32 accumulation
    (max rel err equals the bf16-truncated-operand floor, 2.4e-3 on
    uniform operands; precision=HIGHEST restores true f32 at ~2e-7).
    So `mm_dtype=bfloat16` saves only operand VMEM traffic, NOT MXU
    passes — which is why the in-kernel bf16 cast mode measured as a
    1.67x regression (the VPU cast cost has no MXU saving to repay;
    see docs/ROOFLINE.md).  Accumulation and the residual state stay
    f32 in every kernel either way."""
    B, T, C = x.shape
    a = x.reshape(B * T, C)
    if mm_dtype is not None and a.dtype != mm_dtype:
        a = a.astype(mm_dtype)
    if mm_dtype is not None and w.dtype != mm_dtype:
        w = w.astype(mm_dtype)
    y = jnp.dot(a, w, preferred_element_type=jnp.float32)
    return y.reshape(B, T, w.shape[1])


def _stack_kernel_v2(
    stages, pooling_layers, pooling_type, leaky, t_in, n_videos, mm_dtype,
    len_ref,  # scalar prefetch [B]
    x_ref, w3_ref, b3_ref, w1_ref, b1_ref, wl_ref, bl_ref,
    out_ref,
):
    B = n_videos
    lengths = jnp.stack([len_ref[b] for b in range(B)])  # [B] (unrolled SMEM reads)
    nonlin = (lambda v: jnp.where(v > 0, v, 0.01 * v)) if leaky else (
        lambda v: jnp.maximum(v, 0.0)
    )
    t = t_in
    x = x_ref[:] * _bt_mask(B, t, lengths)

    def cast(v):  # one cast per layer feeds all three shifted matmuls
        return v if mm_dtype is None else v.astype(mm_dtype)

    for i, d in enumerate(stages):
        xb = cast(x)
        z = (
            _matmul_bt(_shift_batch(xb, -d), w3_ref[i, 0], mm_dtype)
            + _matmul_bt(xb, w3_ref[i, 1], mm_dtype)
            + _matmul_bt(_shift_batch(xb, d), w3_ref[i, 2], mm_dtype)
            + b3_ref[i][None, None, :]
        )
        y = _matmul_bt(cast(nonlin(z)), w1_ref[i], mm_dtype) + b1_ref[i][None, None, :]
        x = (y + x) * _bt_mask(B, t, lengths)
        if i in pooling_layers:
            pairs = x[:, : (t // 2) * 2].reshape(B, t // 2, 2, x.shape[2])
            if pooling_type == "max":
                x = jnp.max(pairs, axis=2)
            else:
                x = jnp.mean(pairs, axis=2) * 2.0
            t, lengths = t // 2, lengths // 2
            x = x * _bt_mask(B, t, lengths)

    x = _matmul_bt(cast(nonlin(x)), wl_ref[:], mm_dtype) + bl_ref[:][None, None, :]
    out_ref[:] = x * _bt_mask(B, t, lengths)


def wavenet_stack_pallas_v2(
    x,  # [B x T x C] float32 (post in-projection, relu'd, masked)
    lengths,  # [B] int32
    w3, b3, w1, b1, w_last, b_last,
    stages: Sequence[int],
    pooling_layers: Sequence[int],
    pooling_type: str = "max",
    leaky: bool = False,
    interpret: bool = False,
    mm_dtype=None,
):
    """Fused eval stack entry point.  `mm_dtype=jnp.bfloat16`
    runs the matmuls on bf16 MXU operands with f32 accumulation (residual
    state stays f32)."""
    B, T, C = x.shape
    L = len(stages)
    n_pools = sum(1 for i in pooling_layers if i < L)
    t_out = T >> n_pools
    assert T % (1 << n_pools) == 0, (T, n_pools)

    kernel = partial(
        _stack_kernel_v2,
        tuple(stages),
        tuple(int(p) for p in pooling_layers),
        pooling_type,
        leaky,
        T,
        B,
        mm_dtype,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((B, T, C), lambda g, *_: (0, 0, 0)),
            pl.BlockSpec((L, 3, C, C), lambda g, *_: (0, 0, 0, 0)),
            pl.BlockSpec((L, C), lambda g, *_: (0, 0)),
            pl.BlockSpec((L, C, C), lambda g, *_: (0, 0, 0)),
            pl.BlockSpec((L, C), lambda g, *_: (0, 0)),
            pl.BlockSpec((C, C), lambda g, *_: (0, 0)),
            pl.BlockSpec((C,), lambda g, *_: (0,)),
        ],
        out_specs=pl.BlockSpec((B, t_out, C), lambda g, *_: (0, 0, 0)),
    )
    z = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, t_out, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), x, w3, b3, w1, b1, w_last, b_last)
    return z, lengths >> n_pools


# the eval program keeps ~3 whole-slice [Bs, T, C] tensors resident
# (residual state, shifted conv operand, nonlinearity output).  Budget
# chosen so the hw-validated whole-batch shape (B=8, T=2048: 25 MB
# resident, 16k flattened matmul rows, 1.08 ms) stays UNSLICED and
# larger batches slice down to programs of that same validated
# magnitude (oversized Mosaic programs have killed the remote compile
# helper — see wavenet_train_pallas_v3._SLICE_BYTES_BUDGET)
_EVAL_SLICE_BYTES_BUDGET = 32 * 1024 * 1024


def plan_eval_slices(B, T, C, budget=_EVAL_SLICE_BYTES_BUDGET):
    """Smallest number of equal batch slices whose resident bytes fit the
    eval program's VMEM budget; None if nothing fits (XLA fallback)."""
    per_video = T * C * 4 * 3
    for nb in range(1, B + 1):
        if B % nb == 0 and (B // nb) * per_video <= budget:
            return nb
    return None


def wavenet_stack_pallas_v2_sliced(
    x, lengths, w3, b3, w1, b1, w_last, b_last,
    stages, pooling_layers, pooling_type="max", leaky=False,
    interpret=False, mm_dtype=None, slice_budget=_EVAL_SLICE_BYTES_BUDGET,
):
    """wavenet_stack_pallas_v2 with automatic batch slicing: large-B eval
    configs (bench B=128) keep the fused kernel instead of falling back
    to XLA at the old whole-batch 32 MB gate.  Videos are row-independent,
    so sliced == unsliced bitwise.  Returns None when even single-video
    slices exceed VMEM."""
    B, T, C = x.shape
    nb = plan_eval_slices(B, T, C, budget=slice_budget)
    if nb is None:
        return None
    if nb == 1:
        return wavenet_stack_pallas_v2(
            x, lengths, w3, b3, w1, b1, w_last, b_last,
            stages=stages, pooling_layers=pooling_layers,
            pooling_type=pooling_type, leaky=leaky, interpret=interpret,
            mm_dtype=mm_dtype,
        )
    bs = B // nb
    zs, tzs = [], []
    for i in range(nb):
        z_i, tz_i = wavenet_stack_pallas_v2(
            x[i * bs : (i + 1) * bs], lengths[i * bs : (i + 1) * bs],
            w3, b3, w1, b1, w_last, b_last,
            stages=stages, pooling_layers=pooling_layers,
            pooling_type=pooling_type, leaky=leaky, interpret=interpret,
            mm_dtype=mm_dtype,
        )
        zs.append(z_i)
        tzs.append(tz_i)
    return jnp.concatenate(zs, axis=0), jnp.concatenate(tzs, axis=0)


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
