"""Trainable fused WaveNet stack, v2: whole-batch layout, chunked backward.

v1 (ops/wavenet_train_pallas.py) runs one program per video, which
serializes the batch on the core and loses to XLA (~3.6ms vs 2.3ms
fwd+bwd at B=8, T=2048).  The whole-batch flattened layout that makes the
EVAL kernel 1.4x faster than XLA (ops/wavenet_pallas_v2.py) could not be
applied to a monolithic replay-backward: ~120 flattened matmuls in one
program OOM-kill the remote Mosaic compile subprocess.  This module splits
the work instead:

* forward program (one pallas_call, whole batch): the v2 fused stack with
  in-kernel dropout, which ADDITIONALLY stashes each layer's input x_i and
  pre-dropout activation h_i to HBM.  ~4 matmuls/layer — the same program
  size as the eval kernel that compiles fine and beats XLA.
* backward = K chunked sweep programs (one pallas_call per chunk, last
  layers first), each handling ceil(L/K) layers: regenerate the dropout
  mask from the layer seed, route max-pool grads (torch first-max
  tie-break), and compute dW/db/dx via flattened (B*T, C) matmuls.  Weight
  grads accumulate over the flattened rows directly — no per-video grad
  tensors, no postprocessing sum.  The g tensor chains the chunks.

Stashing (vs v1's in-kernel replay) trades ~3.4*B*T*C*8 bytes of HBM
(~56 MB at B=8, T=2048, C=128 — microseconds of bandwidth) for removing
the entire replay from the backward: the sweep reads activations instead
of recomputing them.

Gradient parity vs jax.grad of the XLA stack is exact with dropout off
(tests/test_pallas_train.py); the in-kernel dropout masks differ from
flax's PRNG stream, which is immaterial (both are valid dropout).
Reference behavior reproduced: temporal.py:9-53 (layer), 77-147 (stack),
including max-pool grad routing that ties to the first element (torch
semantics).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mucon_tpu.ops.wavenet_pallas_v2 import _bt_mask, _matmul_bt, _shift_batch


def _plan(stages, pooling_layers, t_in):
    """Static per-layer (input length, pooled flag, pools-before count)."""
    t = t_in
    t_ins, pooled, shifts = [], [], []
    shift = 0
    for i in range(len(stages)):
        t_ins.append(t)
        shifts.append(shift)
        p = i in pooling_layers
        pooled.append(p)
        if p:
            t = t // 2
            shift += 1
    return t_ins, pooled, shifts, t


def _dropout_mask_bt(shape, rate: float):
    bits = pltpu.prng_random_bits(shape)
    u = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
    return (u >= rate).astype(jnp.float32) / (1.0 - rate)


def _nonlin_fn(leaky: bool):
    if leaky:
        return lambda v: jnp.where(v > 0, v, 0.01 * v)
    return lambda v: jnp.maximum(v, 0.0)


def _nonlin_grad_from_h(h, leaky: bool):
    """relu'(z) recovered from h = relu(z): both relu and leaky-relu
    preserve sign, so (h > 0) <=> (z > 0)."""
    if leaky:
        return jnp.where(h > 0, 1.0, 0.01)
    return (h > 0).astype(jnp.float32)


def _matmul_flat_T(a, b):
    """[B x T x C].T-contraction: (B*T, Ca).T @ (B*T, Cb) -> [Ca x Cb]."""
    B, T, Ca = a.shape
    return jnp.dot(
        a.reshape(B * T, Ca).T,
        b.reshape(B * T, b.shape[2]),
        preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------------------
# forward program: fused stack + activation stash
# ---------------------------------------------------------------------------


def _fwd_kernel_v2(
    stages, pooling_layers, drop_rate, leaky, t_in, n_videos,
    len_ref, seed_ref,  # scalar prefetch: [B] lengths, [1] step seed
    x_ref, w3_ref, b3_ref, w1_ref, b1_ref, wl_ref, bl_ref,
    out_ref, *stash_refs,  # xs[0..L] then hs[0..L-1]
):
    B = n_videos
    L = len(stages)
    xs_refs, hs_refs = stash_refs[: L + 1], stash_refs[L + 1 :]
    lengths = jnp.stack([len_ref[b] for b in range(B)])
    nonlin = _nonlin_fn(leaky)
    t = t_in
    x = x_ref[:] * _bt_mask(B, t, lengths)

    for i, d in enumerate(stages):
        xs_refs[i][:] = x
        z = (
            _matmul_bt(_shift_batch(x, -d), w3_ref[i, 0])
            + _matmul_bt(x, w3_ref[i, 1])
            + _matmul_bt(_shift_batch(x, d), w3_ref[i, 2])
            + b3_ref[i][None, None, :]
        )
        h = nonlin(z)
        hs_refs[i][:] = h
        y = _matmul_bt(h, w1_ref[i]) + b1_ref[i][None, None, :]
        if drop_rate > 0.0:
            pltpu.prng_seed(seed_ref[0] + i)
            y = y * _dropout_mask_bt(y.shape, drop_rate)
        x = (y + x) * _bt_mask(B, t, lengths)
        if i in pooling_layers:
            pairs = x[:, : (t // 2) * 2].reshape(B, t // 2, 2, x.shape[2])
            x = jnp.max(pairs, axis=2)
            t, lengths = t // 2, lengths // 2
            x = x * _bt_mask(B, t, lengths)

    xs_refs[L][:] = x
    x = _matmul_bt(nonlin(x), wl_ref[:]) + bl_ref[:][None, None, :]
    out_ref[:] = x * _bt_mask(B, t, lengths)


# ---------------------------------------------------------------------------
# backward sweep chunk: layers [lo, hi) in reverse, optional out-projection
# ---------------------------------------------------------------------------


def _sweep_kernel(
    stages, pooling_layers, drop_rate, leaky, t_in, n_videos,
    lo, hi, with_proj,
    len_ref, seed_ref,
    *refs,
):
    """One backward chunk over layers [lo, hi).

    refs layout: inputs xs[lo..hi-1], (x_fin if with_proj), hs[lo..hi-1],
    w3 [n,3,C,C], w1 [n,C,C], b1 [n,C], (wl [C,C] if with_proj), g_in;
    outputs dw3, db3, dw1, db1 (chunk slices), (dwl, dbl), g_out.
    """
    B = n_videos
    n = hi - lo
    L = len(stages)
    t_ins, pooled, shifts, t_fin = _plan(stages, pooling_layers, t_in)
    n_pools_total = sum(1 for p in pooled if p)
    nonlin = _nonlin_fn(leaky)

    pos = 0
    xs = refs[pos : pos + n]; pos += n
    x_fin_ref = None
    if with_proj:
        x_fin_ref = refs[pos]; pos += 1
    hs = refs[pos : pos + n]; pos += n
    w3_ref = refs[pos]; pos += 1
    w1_ref = refs[pos]; pos += 1
    b1_ref = refs[pos]; pos += 1
    wl_ref = None
    if with_proj:
        wl_ref = refs[pos]; pos += 1
    g_ref = refs[pos]; pos += 1
    dw3_ref = refs[pos]; pos += 1
    db3_ref = refs[pos]; pos += 1
    dw1_ref = refs[pos]; pos += 1
    db1_ref = refs[pos]; pos += 1
    if with_proj:
        dwl_ref = refs[pos]; pos += 1
        dbl_ref = refs[pos]; pos += 1
    gout_ref = refs[pos]; pos += 1

    lengths0 = jnp.stack([len_ref[b] for b in range(B)])

    if with_proj:
        lengths_fin = lengths0 >> n_pools_total
        g = g_ref[:] * _bt_mask(B, t_fin, lengths_fin)
        x_fin = x_fin_ref[:]
        h_fin = nonlin(x_fin)
        C = x_fin.shape[2]
        dwl_ref[:] = _matmul_flat_T(h_fin, g)
        gsum = jnp.sum(g.reshape(B * t_fin, C), axis=0)
        # bias grad in a tile-aligned (8 x C) block; row 0 is real
        dbl_ref[:] = jnp.broadcast_to(gsum[None, :], (8, C))
        g = _matmul_bt(g, wl_ref[:].T) * _nonlin_grad_from_h(h_fin, leaky)
    else:
        # g arrives at the input of layer hi
        t_next = t_ins[hi]
        g = g_ref[:] * _bt_mask(B, t_next, lengths0 >> shifts[hi])

    for j in reversed(range(n)):
        i = lo + j
        d = stages[i]
        t_i = t_ins[i]
        lengths_i = lengths0 >> shifts[i]
        mask_i = _bt_mask(B, t_i, lengths_i)
        x_i = xs[j][:]
        h = hs[j][:]

        # dropout mask: regenerated from the same (seed, layer) as forward
        m = None
        if drop_rate > 0.0:
            pltpu.prng_seed(seed_ref[0] + i)
            m = _dropout_mask_bt((B, t_i, h.shape[2]), drop_rate)

        if pooled[i]:
            # reconstruct pre-pool u to route the max-pool gradient
            y = _matmul_bt(h, w1_ref[j]) + b1_ref[j][None, None, :]
            if m is not None:
                y = y * m
            u = (y + x_i) * mask_i
            t_half = t_i // 2
            pairs = u[:, : t_half * 2].reshape(B, t_half, 2, u.shape[2])
            is_max = (pairs == jnp.max(pairs, axis=2, keepdims=True)).astype(
                jnp.float32
            )
            # ties route to the FIRST max element (torch max_pool semantics)
            first = jnp.concatenate(
                [jnp.ones_like(is_max[:, :, :1]), 1.0 - is_max[:, :, :1]],
                axis=2,
            )
            route = is_max * first
            g_pairs = route * g[:, :, None, :]
            g = g_pairs.reshape(B, t_half * 2, -1)
            if t_i % 2:  # odd trailing frame was dropped by the pool
                g = jnp.concatenate(
                    [g, jnp.zeros((B, 1, g.shape[2]), jnp.float32)], axis=1
                )
        g = g * mask_i

        dy = g * m if m is not None else g
        dw1_ref[j] = _matmul_flat_T(h, dy)
        db1_ref[j] = jnp.sum(dy.reshape(B * t_i, -1), axis=0)
        dh = _matmul_bt(dy, w1_ref[j].T)
        dz = dh * _nonlin_grad_from_h(h, leaky)
        for k, off in enumerate((-d, 0, d)):
            dw3_ref[j, k] = _matmul_flat_T(_shift_batch(x_i, off), dz)
        db3_ref[j] = jnp.sum(dz.reshape(B * t_i, -1), axis=0)
        dx = (
            _matmul_bt(_shift_batch(dz, d), w3_ref[j, 0].T)
            + _matmul_bt(dz, w3_ref[j, 1].T)
            + _matmul_bt(_shift_batch(dz, -d), w3_ref[j, 2].T)
        )
        g = (dx + g) * mask_i

    gout_ref[:] = g


# ---------------------------------------------------------------------------
# custom-vjp wrapper
# ---------------------------------------------------------------------------


def _chunk_bounds(L: int, n_chunks: int):
    """Split layers 0..L-1 into n_chunks contiguous [lo, hi) spans."""
    n_chunks = max(1, min(n_chunks, L))
    size = -(-L // n_chunks)
    return [(lo, min(lo + size, L)) for lo in range(0, L, size)]


_VMEM_LIMIT = 110 * 1024 * 1024


def _fwd_call(x, lengths, seed, w3, b3, w1, b1, w_last, b_last,
              stages, pooling_layers, drop_rate, leaky, interpret):
    B, T, C = x.shape
    L = len(stages)
    t_ins, _, _, t_fin = _plan(stages, pooling_layers, T)
    stash_ts = t_ins + [t_fin]  # xs lengths; hs lengths == t_ins

    kernel = partial(
        _fwd_kernel_v2, tuple(stages), tuple(pooling_layers), drop_rate,
        leaky, T, B,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
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
        out_specs=[pl.BlockSpec((B, t_fin, C), lambda g, *_: (0, 0, 0))]
        + [pl.BlockSpec((B, t, C), lambda g, *_: (0, 0, 0)) for t in stash_ts]
        + [pl.BlockSpec((B, t, C), lambda g, *_: (0, 0, 0)) for t in t_ins],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, t_fin, C), jnp.float32)]
        + [jax.ShapeDtypeStruct((B, t, C), jnp.float32) for t in stash_ts]
        + [jax.ShapeDtypeStruct((B, t, C), jnp.float32) for t in t_ins],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(lengths.astype(jnp.int32), seed.astype(jnp.int32).reshape(1),
      x, w3, b3, w1, b1, w_last, b_last)
    z = outs[0]
    xs = tuple(outs[1 : L + 2])
    hs = tuple(outs[L + 2 :])
    return z, xs, hs


@partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13, 14))
def wavenet_stack_train_v2(
    x, lengths, seed, w3, b3, w1, b1, w_last, b_last,
    stages: tuple, pooling_layers: tuple, drop_rate: float, leaky: bool,
    interpret: bool, sweep_chunks: int = 3,
):
    """Differentiable fused stack (whole-batch layout). Returns z.

    `seed` is a scalar int32 (fold the step rng in); dropout at layer i is
    seeded with seed + i, identically in forward and backward.
    """
    z, _, _ = _fwd_call(
        x, lengths, seed, w3, b3, w1, b1, w_last, b_last,
        stages, pooling_layers, drop_rate, leaky, interpret,
    )
    return z


def _fwd_rule(x, lengths, seed, w3, b3, w1, b1, w_last, b_last,
              stages, pooling_layers, drop_rate, leaky, interpret,
              sweep_chunks):
    z, xs, hs = _fwd_call(
        x, lengths, seed, w3, b3, w1, b1, w_last, b_last,
        stages, pooling_layers, drop_rate, leaky, interpret,
    )
    return z, (xs, hs, lengths, seed, w3, w1, b1, w_last)


def _sweep_call(xs, hs, lengths, seed, w3, w1, b1, w_last, g,
                stages, pooling_layers, drop_rate, leaky, interpret,
                lo, hi, with_proj):
    """One chunk pallas_call; returns (dw3, db3, dw1, db1, [dwl, dbl], g)."""
    B, _, C = xs[0].shape
    L = len(stages)
    n = hi - lo
    t_ins, _, _, t_fin = _plan(stages, pooling_layers, xs[0].shape[1])
    T = xs[0].shape[1]
    t_g_in = t_fin if with_proj else t_ins[hi]
    t_g_out = t_ins[lo]

    kernel = partial(
        _sweep_kernel, tuple(stages), tuple(pooling_layers), drop_rate,
        leaky, T, B, lo, hi, with_proj,
    )

    def bspec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda g_, *_, _nd=nd: (0,) * _nd)

    in_arrays = list(xs[lo:hi])
    in_specs = [bspec((B, t_ins[i], C)) for i in range(lo, hi)]
    if with_proj:
        in_arrays.append(xs[L])
        in_specs.append(bspec((B, t_fin, C)))
    in_arrays += list(hs[lo:hi])
    in_specs += [bspec((B, t_ins[i], C)) for i in range(lo, hi)]
    in_arrays += [w3[lo:hi], w1[lo:hi], b1[lo:hi]]
    in_specs += [bspec((n, 3, C, C)), bspec((n, C, C)), bspec((n, C))]
    if with_proj:
        in_arrays.append(w_last)
        in_specs.append(bspec((C, C)))
    in_arrays.append(g)
    in_specs.append(bspec((B, t_g_in, C)))

    out_shapes = [
        jax.ShapeDtypeStruct((n, 3, C, C), jnp.float32),
        jax.ShapeDtypeStruct((n, C), jnp.float32),
        jax.ShapeDtypeStruct((n, C, C), jnp.float32),
        jax.ShapeDtypeStruct((n, C), jnp.float32),
    ]
    out_specs = [bspec((n, 3, C, C)), bspec((n, C)), bspec((n, C, C)),
                 bspec((n, C))]
    if with_proj:
        out_shapes += [
            jax.ShapeDtypeStruct((C, C), jnp.float32),
            jax.ShapeDtypeStruct((8, C), jnp.float32),
        ]
        out_specs += [bspec((C, C)), bspec((8, C))]
    out_shapes.append(jax.ShapeDtypeStruct((B, t_g_out, C), jnp.float32))
    out_specs.append(bspec((B, t_g_out, C)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(lengths.astype(jnp.int32), seed.astype(jnp.int32).reshape(1),
      *in_arrays)


def _bwd_rule(stages, pooling_layers, drop_rate, leaky, interpret,
              sweep_chunks, residuals, g):
    xs, hs, lengths, seed, w3, w1, b1, w_last = residuals
    L = len(stages)
    bounds = _chunk_bounds(L, sweep_chunks)

    dw3_parts, db3_parts, dw1_parts, db1_parts = [], [], [], []
    dwl = dbl = None
    for ci, (lo, hi) in enumerate(reversed(bounds)):
        with_proj = ci == 0  # the last-layers chunk owns the out-projection
        outs = _sweep_call(
            xs, hs, lengths, seed, w3, w1, b1, w_last, g,
            stages, pooling_layers, drop_rate, leaky, interpret,
            lo, hi, with_proj,
        )
        if with_proj:
            dw3c, db3c, dw1c, db1c, dwl, dbl, g = outs
        else:
            dw3c, db3c, dw1c, db1c, g = outs
        dw3_parts.append(dw3c)
        db3_parts.append(db3c)
        dw1_parts.append(dw1c)
        db1_parts.append(db1c)

    # chunks were processed high->low; concatenate back in layer order
    dw3 = jnp.concatenate(dw3_parts[::-1], axis=0)
    db3 = jnp.concatenate(db3_parts[::-1], axis=0)
    dw1 = jnp.concatenate(dw1_parts[::-1], axis=0)
    db1 = jnp.concatenate(db1_parts[::-1], axis=0)

    import numpy as np

    return (
        g,  # dx (now at the stack input length)
        np.zeros(lengths.shape, dtype=jax.dtypes.float0),
        np.zeros(seed.shape, dtype=jax.dtypes.float0),
        dw3,
        db3,
        dw1,
        db1,
        dwl,
        dbl[0],
    )


wavenet_stack_train_v2.defvjp(_fwd_rule, _bwd_rule)
