"""Trainable fused WaveNet stack: Pallas forward + backward kernels.

The eval kernel (ops/wavenet_pallas_v2.py) is forward-only; this module
makes the fused stack differentiable for the TRAINING path via
jax.custom_vjp, using the same whole-batch-in-one-program layout (every
matmul runs with B*T rows on the MXU — the per-video-grid variant lost to
grid serialization):

* forward kernel: fused residual stack with in-kernel dropout (pltpu PRNG
  seeded per layer from `seeds[0]` — deterministic, replayable);
* backward kernel: replays the forward from the saved stack INPUT, holding
  every layer input in VMEM scratch (~31 MB at B=8, T=2048; needs
  vmem_limit_bytes above the 16 MB Mosaic default), regenerating dropout
  masks from the same seeds, then sweeps gradients back through 1x1 /
  dilated convs (transposed-tap matmuls), ReLUs, dropout, max-pool argmax
  routing, and residuals.  Weight grads accumulate across the batch inside
  the single program.

Gradients match jax.grad of the XLA path exactly with dropout off
(tests/test_pallas_train.py); with dropout on the masks differ from flax's
(different PRNG), which is immaterial.  Max-pool gradient ties route to the
FIRST element (torch semantics) where XLA splits evenly — ties only occur
on masked zeros.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mucon_tpu.ops.wavenet_pallas_v2 import _bt_mask, _matmul_bt, _shift_batch


def _dropout_mask(shape, rate: float):
    """Keep-mask/(1-rate) from the already-seeded per-core PRNG."""
    if rate <= 0.0:
        return None
    bits = pltpu.prng_random_bits(shape)
    u = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
    return (u >= rate).astype(jnp.float32) / (1.0 - rate)


def _plan(stages, pooling_layers, t_in):
    """Static per-layer input lengths, pool flags, final length."""
    t = t_in
    t_ins, pooled = [], []
    for i in range(len(stages)):
        t_ins.append(t)
        p = i in pooling_layers
        pooled.append(p)
        if p:
            t = t // 2
    return t_ins, pooled, t


def _nonlin(leaky):
    if leaky:
        return lambda v: jnp.where(v > 0, v, 0.01 * v)
    return lambda v: jnp.maximum(v, 0.0)


def _layer_fwd(x, w3, b3, w1, b1, d, drop_rate, nonlin):
    """One residual layer on [B x T x C]; returns (u, z, h, mask)."""
    z = (
        _matmul_bt(_shift_batch(x, -d), w3[0])
        + _matmul_bt(x, w3[1])
        + _matmul_bt(_shift_batch(x, d), w3[2])
        + b3[None, None, :]
    )
    h = nonlin(z)
    y = _matmul_bt(h, w1) + b1[None, None, :]
    m = _dropout_mask(y.shape, drop_rate)
    if m is not None:
        y = y * m
    return y + x, z, h, m


def _pool_pairs(u, t):
    B, _, C = u.shape
    pairs = u[:, : (t // 2) * 2].reshape(B, t // 2, 2, C)
    return jnp.max(pairs, axis=2), pairs


def _read_lengths(len_ref, n):
    return jnp.stack([len_ref[b] for b in range(n)])


def _fwd_kernel(
    stages, pooling_layers, drop_rate, t_in, leaky, n_videos,
    len_ref, seed_ref,
    x_ref, w3_ref, b3_ref, w1_ref, b1_ref, wl_ref, bl_ref,
    out_ref,
):
    B = n_videos
    lengths = _read_lengths(len_ref, B)
    nonlin = _nonlin(leaky)
    t = t_in
    x = x_ref[:] * _bt_mask(B, t, lengths)
    for i, d in enumerate(stages):
        if drop_rate > 0.0:
            pltpu.prng_seed(seed_ref[0] + i)
        u, _, _, _ = _layer_fwd(
            x, w3_ref[i], b3_ref[i], w1_ref[i], b1_ref[i], d, drop_rate, nonlin
        )
        u = u * _bt_mask(B, t, lengths)
        if i in pooling_layers:
            u, _ = _pool_pairs(u, t)
            t, lengths = t // 2, lengths // 2
            u = u * _bt_mask(B, t, lengths)
        x = u
    x = _matmul_bt(nonlin(x), wl_ref[:]) + bl_ref[:][None, None, :]
    out_ref[:] = x * _bt_mask(B, t, lengths)


def _bwd_kernel(
    stages, pooling_layers, drop_rate, t_in, leaky, n_videos,
    len_ref, seed_ref,
    x_ref, w3_ref, b3_ref, w1_ref, b1_ref, wl_ref, bl_ref, g_ref,
    dx_ref, dw3_ref, db3_ref, dw1_ref, db1_ref, dwl_ref, dbl_ref,
    *acts,
):
    B = n_videos
    lengths0 = _read_lengths(len_ref, B)
    nonlin = _nonlin(leaky)
    L = len(stages)
    t_ins, pooled, t_fin = _plan(stages, pooling_layers, t_in)

    def flat(a):
        return a.reshape(a.shape[0] * a.shape[1], a.shape[2])

    # ---- replay forward, storing each layer's input ----
    x = x_ref[:] * _bt_mask(B, t_in, lengths0)
    t, lengths = t_in, lengths0
    lengths_per_layer = []
    for i, d in enumerate(stages):
        acts[i][:] = x
        lengths_per_layer.append(lengths)
        if drop_rate > 0.0:
            pltpu.prng_seed(seed_ref[0] + i)
        u, _, _, _ = _layer_fwd(
            x, w3_ref[i], b3_ref[i], w1_ref[i], b1_ref[i], d, drop_rate, nonlin
        )
        u = u * _bt_mask(B, t, lengths)
        if pooled[i]:
            u, _ = _pool_pairs(u, t)
            t, lengths = t // 2, lengths // 2
            u = u * _bt_mask(B, t, lengths)
        x = u
    acts[L][:] = x
    final_len = lengths

    # ---- backward through the out-projection ----
    g = g_ref[:] * _bt_mask(B, t_fin, final_len)
    x_fin = acts[L][:]
    h_fin = nonlin(x_fin)
    dwl_ref[:] = jnp.dot(
        flat(h_fin).T, flat(g), preferred_element_type=jnp.float32
    )
    dbl_ref[:] = jnp.broadcast_to(
        jnp.sum(flat(g), axis=0)[None, :], dbl_ref.shape
    )
    g = _matmul_bt(g, wl_ref[:].T)
    if leaky:
        g = g * jnp.where(x_fin > 0, 1.0, 0.01)
    else:
        g = g * (x_fin > 0).astype(jnp.float32)

    # ---- backward sweep over layers ----
    for i in reversed(range(L)):
        d = stages[i]
        t_i = t_ins[i]
        length_i = lengths_per_layer[i]
        x_i = acts[i][:]
        if drop_rate > 0.0:
            pltpu.prng_seed(seed_ref[0] + i)
        u, z, h, m = _layer_fwd(
            x_i, w3_ref[i], b3_ref[i], w1_ref[i], b1_ref[i], d, drop_rate, nonlin
        )
        u = u * _bt_mask(B, t_i, length_i)

        if pooled[i]:
            _, pairs = _pool_pairs(u, t_i)
            is_max = (pairs == jnp.max(pairs, axis=2, keepdims=True)).astype(
                jnp.float32
            )
            # ties route to the FIRST max element (torch semantics)
            first = jnp.concatenate(
                [jnp.ones_like(is_max[:, :, :1]), 1.0 - is_max[:, :, :1]], axis=2
            )
            route = is_max * first
            g_pairs = route * g[:, :, None, :]
            g_full = g_pairs.reshape(B, (t_i // 2) * 2, -1)
            if t_i % 2:  # odd trailing frame was dropped by the pool
                g_full = jnp.concatenate(
                    [g_full, jnp.zeros((B, 1, g_full.shape[2]), jnp.float32)], 1
                )
            g = g_full
        g = g * _bt_mask(B, t_i, length_i)

        dy = g * m if m is not None else g
        dw1_ref[i] = jnp.dot(
            flat(h).T, flat(dy), preferred_element_type=jnp.float32
        )
        db1_ref[i] = jnp.sum(flat(dy), axis=0)
        dh = _matmul_bt(dy, w1_ref[i].T)
        if leaky:
            dz = dh * jnp.where(z > 0, 1.0, 0.01)
        else:
            dz = dh * (z > 0).astype(jnp.float32)
        for k, off in enumerate((-d, 0, d)):
            dw3_ref[i, k] = jnp.dot(
                flat(_shift_batch(x_i, off)).T,
                flat(dz),
                preferred_element_type=jnp.float32,
            )
        db3_ref[i] = jnp.sum(flat(dz), axis=0)
        dx = (
            _matmul_bt(_shift_batch(dz, d), w3_ref[i, 0].T)
            + _matmul_bt(dz, w3_ref[i, 1].T)
            + _matmul_bt(_shift_batch(dz, -d), w3_ref[i, 2].T)
        )
        g = (dx + g) * _bt_mask(B, t_i, length_i)

    dx_ref[:] = g


def _specs_common(L, C, T, B):
    return [
        pl.BlockSpec((B, T, C), lambda g, *_: (0, 0, 0)),
        pl.BlockSpec((L, 3, C, C), lambda g, *_: (0, 0, 0, 0)),
        pl.BlockSpec((L, C), lambda g, *_: (0, 0)),
        pl.BlockSpec((L, C, C), lambda g, *_: (0, 0, 0)),
        pl.BlockSpec((L, C), lambda g, *_: (0, 0)),
        pl.BlockSpec((C, C), lambda g, *_: (0, 0)),
        pl.BlockSpec((C,), lambda g, *_: (0,)),
    ]


_VMEM_LIMIT = 100 * 1024 * 1024


@partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13))
def wavenet_stack_train(
    x, lengths, seeds, w3, b3, w1, b1, w_last, b_last,
    stages: tuple, pooling_layers: tuple, drop_rate: float, leaky: bool,
    interpret: bool,
):
    """Differentiable fused stack. Returns z [B x T_out x C].

    `seeds` [B] int32; `seeds[0]` drives the in-kernel dropout for the whole
    batch (fold the step rng in per step)."""
    z, _ = _fwd(
        x, lengths, seeds, w3, b3, w1, b1, w_last, b_last,
        stages, pooling_layers, drop_rate, leaky, interpret,
    )
    return z


def _fwd(x, lengths, seeds, w3, b3, w1, b1, w_last, b_last,
         stages, pooling_layers, drop_rate, leaky, interpret):
    B, T, C = x.shape
    L = len(stages)
    _, _, t_fin = _plan(stages, pooling_layers, T)
    kernel = partial(
        _fwd_kernel, tuple(stages), tuple(pooling_layers), drop_rate, T,
        leaky, B,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=_specs_common(L, C, T, B),
        out_specs=pl.BlockSpec((B, t_fin, C), lambda g, *_: (0, 0, 0)),
    )
    z = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, t_fin, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(lengths.astype(jnp.int32), seeds.astype(jnp.int32),
      x, w3, b3, w1, b1, w_last, b_last)
    return z, (x, lengths, seeds, w3, b3, w1, b1, w_last, b_last)


def _fwd_rule(x, lengths, seeds, w3, b3, w1, b1, w_last, b_last,
              stages, pooling_layers, drop_rate, leaky, interpret):
    return _fwd(x, lengths, seeds, w3, b3, w1, b1, w_last, b_last,
                stages, pooling_layers, drop_rate, leaky, interpret)


def _bwd_rule(stages, pooling_layers, drop_rate, leaky, interpret,
              residuals, g):
    import numpy as np

    x, lengths, seeds, w3, b3, w1, b1, w_last, b_last = residuals
    B, T, C = x.shape
    L = len(stages)
    t_ins, _, t_fin = _plan(stages, pooling_layers, T)

    kernel = partial(
        _bwd_kernel, tuple(stages), tuple(pooling_layers), drop_rate, T,
        leaky, B,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=_specs_common(L, C, T, B)
        + [pl.BlockSpec((B, t_fin, C), lambda g_, *_: (0, 0, 0))],
        out_specs=[
            pl.BlockSpec((B, T, C), lambda g_, *_: (0, 0, 0)),
            pl.BlockSpec((L, 3, C, C), lambda g_, *_: (0, 0, 0, 0)),
            pl.BlockSpec((L, C), lambda g_, *_: (0, 0)),
            pl.BlockSpec((L, C, C), lambda g_, *_: (0, 0, 0)),
            pl.BlockSpec((L, C), lambda g_, *_: (0, 0)),
            pl.BlockSpec((C, C), lambda g_, *_: (0, 0)),
            pl.BlockSpec((8, C), lambda g_, *_: (0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((B, t, C), jnp.float32) for t in t_ins]
        + [pltpu.VMEM((B, t_fin, C), jnp.float32)],
    )
    dx, dw3, db3, dw1, db1, dwl, dbl = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        out_shape=[
            jax.ShapeDtypeStruct((B, T, C), jnp.float32),
            jax.ShapeDtypeStruct((L, 3, C, C), jnp.float32),
            jax.ShapeDtypeStruct((L, C), jnp.float32),
            jax.ShapeDtypeStruct((L, C, C), jnp.float32),
            jax.ShapeDtypeStruct((L, C), jnp.float32),
            jax.ShapeDtypeStruct((C, C), jnp.float32),
            jax.ShapeDtypeStruct((8, C), jnp.float32),
        ],
        interpret=interpret,
    )(lengths.astype(jnp.int32), seeds.astype(jnp.int32),
      x, w3, b3, w1, b1, w_last, b_last, g)

    # integer inputs take symbolic-zero (float0) tangents
    return (
        dx,
        np.zeros(lengths.shape, dtype=jax.dtypes.float0),
        np.zeros(seeds.shape, dtype=jax.dtypes.float0),
        dw3,
        db3,
        dw1,
        db1,
        dwl,
        dbl[0, :],
    )


wavenet_stack_train.defvjp(_fwd_rule, _bwd_rule)
