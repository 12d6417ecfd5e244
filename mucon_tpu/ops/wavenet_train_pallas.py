"""Trainable fused WaveNet stack: Pallas forward + backward kernels.

The eval kernel (ops/wavenet_pallas.py) is forward-only; this module makes
the fused stack differentiable for the TRAINING path via jax.custom_vjp:

* forward kernel: the same fused residual stack but with in-kernel dropout
  (pltpu PRNG seeded per (video, layer) — deterministic, replayable);
* backward kernel: replays the forward from the saved stack INPUT, holding
  every layer input in VMEM scratch (~4 MB at T=2048), regenerating the
  dropout masks from the same seeds, then sweeps gradients back through
  1x1 / dilated convs (transposed-tap matmuls), ReLUs, dropout, max-pool
  argmax routing, and residuals.  Weight gradients stream out per video
  and are summed outside (keeps VMEM under budget).

HBM traffic per step: read x + write z (fwd), read x + g, write dx + dW
(bwd) — versus ~2 reads + 2 writes of [T x C] per layer per direction for
the layer-by-layer XLA path.  Gradients match jax.grad of the XLA path
exactly with dropout off (tests/test_pallas_train.py); with dropout on the
masks differ from flax's (different PRNG), which is immaterial.

Layout note: this uses the per-video grid (one program per video).  The
whole-batch single-program layout that makes the EVAL kernel 1.4x faster
than XLA (ops/wavenet_pallas_v2.py) blows past the remote Mosaic
compiler's memory on the replay-backward (~80 flattened matmuls in one
program, compile subprocess OOM-killed) — splitting the backward into
replay and sweep programs is the round-2 path to a faster training kernel.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mucon_tpu.ops.wavenet_pallas import _row_mask, _shift_rows


def _dropout_mask(shape, rate: float):
    """Keep-mask/(1-rate) from the already-seeded per-core PRNG."""
    if rate <= 0.0:
        return None
    bits = pltpu.prng_random_bits(shape)
    # uniform in [0, 1) from the high 24 bits
    u = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
    return (u >= rate).astype(jnp.float32) / (1.0 - rate)


def _plan(stages, pooling_layers, t_in):
    """Static per-layer input lengths and pool flags."""
    t = t_in
    t_ins, pooled = [], []
    for i in range(len(stages)):
        t_ins.append(t)
        p = i in pooling_layers
        pooled.append(p)
        if p:
            t = t // 2
    return t_ins, pooled, t  # t = final length


def _layer_fwd(x, w3, b3, w1, b1, d, drop_rate, nonlin):
    """One residual layer; returns (pre-pool output u, z, h, mask)."""
    z = (
        jnp.dot(_shift_rows(x, -d), w3[0], preferred_element_type=jnp.float32)
        + jnp.dot(x, w3[1], preferred_element_type=jnp.float32)
        + jnp.dot(_shift_rows(x, d), w3[2], preferred_element_type=jnp.float32)
        + b3[None, :]
    )
    h = nonlin(z)
    y = jnp.dot(h, w1, preferred_element_type=jnp.float32) + b1[None, :]
    m = _dropout_mask(y.shape, drop_rate)
    if m is not None:
        y = y * m
    return y + x, z, h, m


def _pool_pairs(u, t):
    pairs = u[: (t // 2) * 2].reshape(t // 2, 2, u.shape[1])
    return jnp.max(pairs, axis=1), pairs


def _fwd_kernel(
    stages, pooling_layers, drop_rate, t_in, leaky,
    len_ref, seed_ref,  # scalar prefetch: [B] lengths, [B] seeds
    x_ref, w3_ref, b3_ref, w1_ref, b1_ref, wl_ref, bl_ref,
    out_ref,
):
    b = pl.program_id(0)
    length = len_ref[b]
    nonlin = (lambda v: jnp.where(v > 0, v, 0.01 * v)) if leaky else (
        lambda v: jnp.maximum(v, 0.0)
    )
    x = x_ref[0] * _row_mask(t_in, length)
    t = t_in
    for i, d in enumerate(stages):
        if drop_rate > 0.0:
            pltpu.prng_seed(seed_ref[b] + i)
        u, _, _, _ = _layer_fwd(
            x, w3_ref[i], b3_ref[i], w1_ref[i], b1_ref[i], d, drop_rate, nonlin
        )
        u = u * _row_mask(t, length)
        if i in pooling_layers:
            u, _ = _pool_pairs(u, t)
            t, length = t // 2, length // 2
            u = u * _row_mask(t, length)
        x = u
    x = nonlin(x)
    x = jnp.dot(x, wl_ref[:], preferred_element_type=jnp.float32) + bl_ref[:][None, :]
    out_ref[0] = x * _row_mask(t, length)


def _bwd_kernel(
    stages, pooling_layers, drop_rate, t_in, leaky,
    len_ref, seed_ref,
    x_ref, w3_ref, b3_ref, w1_ref, b1_ref, wl_ref, bl_ref, g_ref,
    dx_ref, dw3_ref, db3_ref, dw1_ref, db1_ref, dwl_ref, dbl_ref,
    *acts,  # per-layer VMEM scratch for layer inputs (+ final input)
):
    b = pl.program_id(0)
    length0 = len_ref[b]
    nonlin = (lambda v: jnp.where(v > 0, v, 0.01 * v)) if leaky else (
        lambda v: jnp.maximum(v, 0.0)
    )
    L = len(stages)
    t_ins, pooled, t_fin = _plan(stages, pooling_layers, t_in)

    # ---- replay forward, storing each layer's input ----
    x = x_ref[0] * _row_mask(t_in, length0)
    t, length = t_in, length0
    lengths_per_layer = []
    for i, d in enumerate(stages):
        acts[i][:] = x
        lengths_per_layer.append(length)
        if drop_rate > 0.0:
            pltpu.prng_seed(seed_ref[b] + i)
        u, _, _, _ = _layer_fwd(
            x, w3_ref[i], b3_ref[i], w1_ref[i], b1_ref[i], d, drop_rate, nonlin
        )
        u = u * _row_mask(t, length)
        if pooled[i]:
            u, _ = _pool_pairs(u, t)
            t, length = t // 2, length // 2
            u = u * _row_mask(t, length)
        x = u
    acts[L][:] = x  # input of the final projection
    final_len = length

    # ---- backward through the out-projection ----
    g = g_ref[0] * _row_mask(t_fin, final_len)
    x_fin = acts[L][:]
    h_fin = nonlin(x_fin)
    dwl_ref[0] = jnp.dot(h_fin.T, g, preferred_element_type=jnp.float32)
    # bias grad broadcast into a tile-aligned (8 x C) block; row 0 is real
    dbl_ref[0] = jnp.broadcast_to(jnp.sum(g, axis=0)[None, :], (8, g.shape[1]))
    g = jnp.dot(g, wl_ref[:].T, preferred_element_type=jnp.float32)
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
            pltpu.prng_seed(seed_ref[b] + i)
        u, z, h, m = _layer_fwd(
            x_i, w3_ref[i], b3_ref[i], w1_ref[i], b1_ref[i], d, drop_rate, nonlin
        )
        u = u * _row_mask(t_i, length_i)

        if pooled[i]:
            # route g through the max-pool argmax
            _, pairs = _pool_pairs(u, t_i)
            is_max = (pairs == jnp.max(pairs, axis=1, keepdims=True)).astype(
                jnp.float32
            )
            # ties: torch routes to the FIRST max element
            first = jnp.concatenate(
                [jnp.ones_like(is_max[:, :1]), 1.0 - is_max[:, :1]], axis=1
            )
            route = is_max * first
            g_pairs = route * g[:, None, :]
            g_full = g_pairs.reshape((t_i // 2) * 2, -1)
            if t_i % 2:  # odd trailing frame was dropped by the pool
                g_full = jnp.concatenate(
                    [g_full, jnp.zeros((1, g_full.shape[1]), jnp.float32)], 0
                )
            g = g_full
        g = g * _row_mask(t_i, length_i)

        dy = g * m if m is not None else g
        # y = h @ w1 + b1
        dw1_ref[0, i] = jnp.dot(h.T, dy, preferred_element_type=jnp.float32)
        db1_ref[0, i] = jnp.sum(dy, axis=0)
        dh = jnp.dot(dy, w1_ref[i].T, preferred_element_type=jnp.float32)
        if leaky:
            dz = dh * jnp.where(z > 0, 1.0, 0.01)
        else:
            dz = dh * (z > 0).astype(jnp.float32)
        # z = sum_k shift(x, (k-1)d) @ w3[k] + b3
        for k, off in enumerate((-d, 0, d)):
            dw3_ref[0, i, k] = jnp.dot(
                _shift_rows(x_i, off).T, dz, preferred_element_type=jnp.float32
            )
        db3_ref[0, i] = jnp.sum(dz, axis=0)
        dx = (
            jnp.dot(
                _shift_rows(dz, d), w3_ref[i, 0].T,
                preferred_element_type=jnp.float32,
            )
            + jnp.dot(dz, w3_ref[i, 1].T, preferred_element_type=jnp.float32)
            + jnp.dot(
                _shift_rows(dz, -d), w3_ref[i, 2].T,
                preferred_element_type=jnp.float32,
            )
        )
        g = (dx + g) * _row_mask(t_i, length_i)

    dx_ref[0] = g


def _specs_common(L, C, T):
    return [
        pl.BlockSpec((1, T, C), lambda b, *_: (b, 0, 0)),
        pl.BlockSpec((L, 3, C, C), lambda b, *_: (0, 0, 0, 0)),
        pl.BlockSpec((L, C), lambda b, *_: (0, 0)),
        pl.BlockSpec((L, C, C), lambda b, *_: (0, 0, 0)),
        pl.BlockSpec((L, C), lambda b, *_: (0, 0)),
        pl.BlockSpec((C, C), lambda b, *_: (0, 0)),
        pl.BlockSpec((C,), lambda b, *_: (0,)),
    ]


@partial(
    jax.custom_vjp,
    nondiff_argnums=(9, 10, 11, 12, 13),
)
def wavenet_stack_train(
    x, lengths, seeds, w3, b3, w1, b1, w_last, b_last,
    stages: tuple, pooling_layers: tuple, drop_rate: float, leaky: bool,
    interpret: bool,
):
    """Differentiable fused stack. Returns z [B x T_out x C].

    `seeds` [B] int32 drive the in-kernel dropout (fold in the step rng).
    """
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
        _fwd_kernel, tuple(stages), tuple(pooling_layers), drop_rate, T, leaky
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=_specs_common(L, C, T),
        out_specs=pl.BlockSpec((1, t_fin, C), lambda b, *_: (b, 0, 0)),
    )
    z = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, t_fin, C), jnp.float32),
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
    x, lengths, seeds, w3, b3, w1, b1, w_last, b_last = residuals
    B, T, C = x.shape
    L = len(stages)
    t_ins, _, t_fin = _plan(stages, pooling_layers, T)

    kernel = partial(
        _bwd_kernel, tuple(stages), tuple(pooling_layers), drop_rate, T, leaky
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=_specs_common(L, C, T)
        + [pl.BlockSpec((1, t_fin, C), lambda b, *_: (b, 0, 0))],
        out_specs=[
            pl.BlockSpec((1, T, C), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, L, 3, C, C), lambda b, *_: (b, 0, 0, 0, 0)),
            pl.BlockSpec((1, L, C), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, L, C, C), lambda b, *_: (b, 0, 0, 0)),
            pl.BlockSpec((1, L, C), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, C, C), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, 8, C), lambda b, *_: (b, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((t, C), jnp.float32) for t in t_ins]
        + [pltpu.VMEM((t_fin, C), jnp.float32)],
    )
    dx, dw3, db3, dw1, db1, dwl, dbl = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            # the replay-backward holds all layer inputs (~4 MB at T=2048)
            # plus weights and per-layer temporaries; the Mosaic default
            # 16 MB scoped-vmem cap is conservative for v5e
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, T, C), jnp.float32),
            jax.ShapeDtypeStruct((B, L, 3, C, C), jnp.float32),
            jax.ShapeDtypeStruct((B, L, C), jnp.float32),
            jax.ShapeDtypeStruct((B, L, C, C), jnp.float32),
            jax.ShapeDtypeStruct((B, L, C), jnp.float32),
            jax.ShapeDtypeStruct((B, C, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 8, C), jnp.float32),
        ],
        interpret=interpret,
    )(lengths.astype(jnp.int32), seeds.astype(jnp.int32),
      x, w3, b3, w1, b1, w_last, b_last, g)

    import numpy as np

    # per-video weight grads summed on device (one reduction per tensor);
    # integer inputs take symbolic-zero (float0) tangents
    return (
        dx,
        np.zeros(lengths.shape, dtype=jax.dtypes.float0),
        np.zeros(seeds.shape, dtype=jax.dtypes.float0),
        jnp.sum(dw3, axis=0),
        jnp.sum(db3, axis=0),
        jnp.sum(dw1, axis=0),
        jnp.sum(db1, axis=0),
        jnp.sum(dwl, axis=0),
        jnp.sum(dbl[:, 0, :], axis=0),
    )


wavenet_stack_train.defvjp(_fwd_rule, _bwd_rule)
