"""Trainable fused WaveNet stack, v3: pool-free programs + XLA glue.

Why v3: probe_sweep_compile_tpu.py localized the remote-Mosaic compile
blowup to the max-pool gradient ROUTING inside the v2 sweep programs —
the rank-4 `reshape(B, t/2, 2, C)` construct compiles in time roughly
linear in T (the T=2048 pooled sweep alone exceeds the compile helper's
~600 s request budget; the T=2048 un-pooled sweep compiles in 25 s).
Dropout never fit the budget because its mask inputs enlarge exactly
those programs.

v3 therefore keeps EVERY pallas program pool-free:

* layers are grouped by equal T (pools are exactly the T boundaries);
  each group is one forward program (layers, stash) and one backward
  program (conv backward only) — all matmuls in a program share one T;
* the 2x max-pool forward and its first-max gradient routing run in XLA
  BETWEEN programs (rank-4 reshapes are trivial for XLA), using the
  pre-pool activation `u` which the forward emits as a chunk output —
  the v2 sweep's in-kernel `u` reconstruction matmul disappears;
* dropout masks stay XLA-generated inputs (threefry), as in v2;
* groups are still subdivided by the VMEM byte budget (subdivision
  boundaries inside a group need no routing, just g/x pass-through);
* `mm_dtype=bfloat16` runs matmuls on bf16 MXU operands, f32 accumulation.

Both pooling types are supported ("max" routes to the torch first-max
element, temporal.py:135-141 semantics; "sum" = avg*2 sends the gradient
to both elements).

Gradient parity: bit-identical to v2 with the same masks (same math,
same mask stream) — pinned by tests/test_pallas_train.py.
Reference behavior reproduced: temporal.py:9-53 (layer), 77-147 (stack).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mucon_tpu.ops.wavenet_pallas_v2 import _bt_mask, _matmul_bt, _shift_batch
from mucon_tpu.ops.wavenet_train_pallas_v2 import (
    _CHUNK_BYTES_BUDGET,
    _VMEM_LIMIT,
    _matmul_flat_T,
    _nonlin_fn,
    _nonlin_grad_from_h,
    _plan,
)


def _group_bounds(stages, pooling_layers, t_ins, B, C, per_layer_arrays):
    """[lo, hi) spans of equal-T layers (split after every pooled layer),
    each further subdivided so the resident per-layer stash stays under
    the VMEM byte budget."""
    L = len(stages)
    groups = []
    lo = 0
    for i in range(L):
        if i in pooling_layers or i == L - 1:
            groups.append((lo, i + 1))
            lo = i + 1
    if lo < L:
        groups.append((lo, L))

    def layer_bytes(i):
        return per_layer_arrays * B * t_ins[i] * C * 4

    out = []
    for g_lo, g_hi in groups:
        start, acc = g_lo, 0
        for i in range(g_lo, g_hi):
            b = layer_bytes(i)
            if i > start and acc + b > _CHUNK_BYTES_BUDGET:
                out.append((start, i))
                start, acc = i, b
            else:
                acc += b
        out.append((start, g_hi))
    return out


# ---------------------------------------------------------------------------
# XLA glue: pool forward + pool backward routing (identical math to the
# reference's torch max_pool1d / avg_pool1d*2, temporal.py:135-141)
# ---------------------------------------------------------------------------


def _pool2_fwd_xla(u, t, lengths, pooling_type):
    """[B x t x C] -> [B x t//2 x C]; u must already be length-masked."""
    B, _, C = u.shape
    pairs = u[:, : (t // 2) * 2].reshape(B, t // 2, 2, C)
    if pooling_type == "max":
        x = jnp.max(pairs, axis=2)
    else:
        x = jnp.mean(pairs, axis=2) * 2.0
    lengths = lengths // 2
    return x * _bt_mask(B, t // 2, lengths), lengths


def _pool2_bwd_xla(g_half, u, t_i, lengths_i, pooling_type):
    """Expand g [B x t_i//2 x C] to [B x t_i x C] through the pool.

    max: ties route to the FIRST max element (torch semantics, matching
    the v2 in-kernel routing and tests/test_temporal.py).
    sum (avg*2): d/du = 1 for both pair elements."""
    B, _, C = g_half.shape
    t_half = t_i // 2
    if pooling_type == "max":
        pairs = u[:, : t_half * 2].reshape(B, t_half, 2, C)
        is_max = (pairs == jnp.max(pairs, axis=2, keepdims=True)).astype(
            jnp.float32
        )
        first = jnp.concatenate(
            [jnp.ones_like(is_max[:, :, :1]), 1.0 - is_max[:, :, :1]], axis=2
        )
        route = is_max * first
    else:
        route = jnp.ones((B, t_half, 2, C), jnp.float32)
    g_pairs = route * g_half[:, :, None, :]
    g = g_pairs.reshape(B, t_half * 2, C)
    if t_i % 2:  # odd trailing frame was dropped by the pool
        g = jnp.concatenate([g, jnp.zeros((B, 1, C), jnp.float32)], axis=1)
    return g * _bt_mask(B, t_i, lengths_i)


# ---------------------------------------------------------------------------
# pool-free forward chunk: layers [lo, hi), ALL at the same T
# ---------------------------------------------------------------------------


def _fwd_kernel_v3(
    stages, drop_on, leaky, t, n_videos, shift_r, lo, hi, with_proj, mm_dtype,
    len_ref, seed_ref,
    *refs,
):
    """Stash (xs/hs) and masks travel as ONE stacked [n x B x t x C] block
    each, not n separate refs: Mosaic's compile time grows superlinearly in
    the windowed-ref count (f32 fwd with per-layer mask refs took 790 s to
    compile; the drop=0 twin with 4 fewer refs took 4 s)."""
    B = n_videos
    n = hi - lo
    nonlin = _nonlin_fn(leaky)

    pos = 0
    x_ref = refs[pos]; pos += 1
    w3_ref = refs[pos]; pos += 1
    b3_ref = refs[pos]; pos += 1
    w1_ref = refs[pos]; pos += 1
    b1_ref = refs[pos]; pos += 1
    wl_ref = bl_ref = None
    if with_proj:
        wl_ref = refs[pos]; pos += 1
        bl_ref = refs[pos]; pos += 1
    ms_ref = None
    if drop_on:
        ms_ref = refs[pos]; pos += 1
    xout_ref = refs[pos]; pos += 1
    xs_ref = refs[pos]; pos += 1
    hs_ref = refs[pos]; pos += 1
    z_ref = refs[pos] if with_proj else None

    lengths = jnp.stack([len_ref[b] for b in range(B)]) >> shift_r
    mask = _bt_mask(B, t, lengths)
    x = x_ref[:] * mask

    def cast(v):
        return v if mm_dtype is None else v.astype(mm_dtype)

    for j in range(n):
        d = stages[lo + j]
        xs_ref[j] = x
        xb = cast(x)
        z = (
            _matmul_bt(_shift_batch(xb, -d), w3_ref[j, 0], mm_dtype)
            + _matmul_bt(xb, w3_ref[j, 1], mm_dtype)
            + _matmul_bt(_shift_batch(xb, d), w3_ref[j, 2], mm_dtype)
            + b3_ref[j][None, None, :]
        )
        h = nonlin(z)
        hs_ref[j] = h
        y = _matmul_bt(cast(h), w1_ref[j], mm_dtype) + b1_ref[j][None, None, :]
        if drop_on:
            y = y * ms_ref[j]
        x = (y + x) * mask

    xout_ref[:] = x
    if with_proj:
        z = _matmul_bt(cast(nonlin(x)), wl_ref[:], mm_dtype) + bl_ref[:][None, None, :]
        z_ref[:] = z * mask


# ---------------------------------------------------------------------------
# pool-free backward chunk: layers [hi) -> [lo), ALL at the same T
# ---------------------------------------------------------------------------


def _sweep_kernel_v3(
    stages, drop_on, leaky, t, n_videos, shift_r, lo, hi, with_proj, mm_dtype,
    len_ref, seed_ref,
    *refs,
):
    B = n_videos
    n = hi - lo
    nonlin = _nonlin_fn(leaky)

    pos = 0
    xs_ref = refs[pos]; pos += 1  # stacked [n x B x t x C]
    x_fin_ref = None
    if with_proj:
        x_fin_ref = refs[pos]; pos += 1
    hs_ref = refs[pos]; pos += 1
    ms_ref = None
    if drop_on:
        ms_ref = refs[pos]; pos += 1
    w3_ref = refs[pos]; pos += 1
    w1_ref = refs[pos]; pos += 1
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

    lengths = jnp.stack([len_ref[b] for b in range(B)]) >> shift_r
    mask = _bt_mask(B, t, lengths)

    if with_proj:
        g = g_ref[:] * mask
        x_fin = x_fin_ref[:]
        h_fin = nonlin(x_fin)
        C = x_fin.shape[2]
        dwl_ref[:] = _matmul_flat_T(h_fin, g, mm_dtype)
        gsum = jnp.sum(g.reshape(B * t, C), axis=0)
        # bias grad in a tile-aligned (8 x C) block; row 0 is real
        dbl_ref[:] = jnp.broadcast_to(gsum[None, :], (8, C))
        g = _matmul_bt(g, wl_ref[:].T, mm_dtype) * _nonlin_grad_from_h(
            h_fin, leaky)
        g = g * mask
    else:
        g = g_ref[:] * mask

    for j in reversed(range(n)):
        d = stages[lo + j]
        x_i = xs_ref[j]
        h = hs_ref[j]
        m = ms_ref[j] if drop_on else None

        dy = g * m if m is not None else g
        dw1_ref[j] = _matmul_flat_T(h, dy, mm_dtype)
        db1_ref[j] = jnp.sum(dy.reshape(B * t, -1), axis=0)
        dh = _matmul_bt(dy, w1_ref[j].T, mm_dtype)
        dz = dh * _nonlin_grad_from_h(h, leaky)
        dzb = dz if mm_dtype is None else dz.astype(mm_dtype)
        x_ib = x_i if mm_dtype is None else x_i.astype(mm_dtype)
        for k, off in enumerate((-d, 0, d)):
            dw3_ref[j, k] = _matmul_flat_T(_shift_batch(x_ib, off), dzb, mm_dtype)
        db3_ref[j] = jnp.sum(dz.reshape(B * t, -1), axis=0)
        dx = (
            _matmul_bt(_shift_batch(dzb, d), w3_ref[j, 0].T, mm_dtype)
            + _matmul_bt(dzb, w3_ref[j, 1].T, mm_dtype)
            + _matmul_bt(_shift_batch(dzb, -d), w3_ref[j, 2].T, mm_dtype)
        )
        g = (dx + g) * mask

    gout_ref[:] = g


# ---------------------------------------------------------------------------
# host-side orchestration
# ---------------------------------------------------------------------------


def _bspec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda g, *_, _nd=nd: (0,) * _nd)


def _make_masks(seed, drop_rate, t_ins, B, C):
    """XLA-threefry dropout masks, one per layer — same stream as v2."""
    if drop_rate <= 0.0:
        return ()
    key = jax.random.PRNGKey(seed.astype(jnp.uint32))
    return tuple(
        (jax.random.uniform(jax.random.fold_in(key, i), (B, t, C))
         >= drop_rate).astype(jnp.float32) / (1.0 - drop_rate)
        for i, t in enumerate(t_ins)
    )


def _fwd_call_v3(x, lengths, seed, w3, b3, w1, b1, w_last, b_last,
                 stages, pooling_layers, pooling_type, drop_rate, leaky,
                 interpret, mm_dtype):
    B, T, C = x.shape
    L = len(stages)
    t_ins, pooled, shifts, t_fin = _plan(stages, pooling_layers, T)
    drop_on = drop_rate > 0.0
    bounds = _group_bounds(stages, pooling_layers, t_ins, B, C,
                           3 if drop_on else 2)
    ms = _make_masks(seed, drop_rate, t_ins, B, C)
    lengths = lengths.astype(jnp.int32)
    seed_arr = seed.astype(jnp.int32).reshape(1)

    xs_all, hs_all, ms_stacks, us = [], [], [], {}
    x_cur = x
    z = None
    # if the LAST layer pools, the out-projection runs after that pool —
    # outside every program — so no chunk owns it (XLA does the single
    # [B*t_fin x C] matmul below)
    proj_in_kernel = not pooled[L - 1]
    for lo, hi in bounds:
        n = hi - lo
        with_proj = hi == L and proj_in_kernel
        t = t_ins[lo]
        kernel = partial(
            _fwd_kernel_v3, tuple(stages), drop_on, leaky, t, B,
            shifts[lo], lo, hi, with_proj, mm_dtype,
        )
        in_arrays = [x_cur, w3[lo:hi], b3[lo:hi], w1[lo:hi], b1[lo:hi]]
        in_specs = [
            _bspec((B, t, C)), _bspec((n, 3, C, C)), _bspec((n, C)),
            _bspec((n, C, C)), _bspec((n, C)),
        ]
        if with_proj:
            in_arrays += [w_last, b_last]
            in_specs += [_bspec((C, C)), _bspec((C,))]
        if drop_on:
            ms_stack = jnp.stack(ms[lo:hi])  # ONE [n,B,t,C] block
            ms_stacks.append(ms_stack)
            in_arrays.append(ms_stack)
            in_specs.append(_bspec((n, B, t, C)))

        out_shapes = [
            jax.ShapeDtypeStruct((B, t, C), jnp.float32),
            jax.ShapeDtypeStruct((n, B, t, C), jnp.float32),  # xs stack
            jax.ShapeDtypeStruct((n, B, t, C), jnp.float32),  # hs stack
        ]
        out_specs = [_bspec((B, t, C)), _bspec((n, B, t, C)),
                     _bspec((n, B, t, C))]
        if with_proj:
            out_shapes.append(jax.ShapeDtypeStruct((B, t_fin, C), jnp.float32))
            out_specs.append(_bspec((B, t_fin, C)))

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1,),
            in_specs=in_specs,
            out_specs=out_specs,
        )
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shapes,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            interpret=interpret,
        )(lengths, seed_arr, *in_arrays)
        x_cur = outs[0]
        xs_all.append(outs[1])  # per-chunk [n,B,t,C] stack
        hs_all.append(outs[2])
        if with_proj:
            z = outs[3]
        if pooled[hi - 1]:
            # XLA glue: stash the pre-pool activation, pool, re-mask
            us[hi - 1] = x_cur
            x_cur, _ = _pool2_fwd_xla(
                x_cur, t_ins[hi - 1], lengths >> shifts[hi - 1], pooling_type
            )

    x_fin = x_cur  # input to the out-projection
    if not proj_in_kernel:
        nonlin = _nonlin_fn(leaky)
        lengths_fin = lengths >> sum(1 for p in pooled if p)
        h_fin = nonlin(x_fin)
        if mm_dtype is not None:
            z = jnp.dot(
                h_fin.reshape(-1, C).astype(mm_dtype),
                w_last.astype(mm_dtype),
                preferred_element_type=jnp.float32,
            ).reshape(B, t_fin, C) + b_last[None, None, :]
        else:
            z = h_fin @ w_last + b_last[None, None, :]
        z = z * _bt_mask(B, t_fin, lengths_fin)
    return z, tuple(xs_all), tuple(hs_all), tuple(ms_stacks), x_fin, us


def _sweep_call_v3(xs_stack, hs_stack, ms_stack, x_fin, lengths, seed,
                   w3, w1, w_last, g,
                   stages, pooling_layers, pooling_type, drop_rate, leaky,
                   interpret, lo, hi, with_proj, mm_dtype, t_ins, t_fin, T):
    n, B, t, C = xs_stack.shape
    drop_on = drop_rate > 0.0
    _, _, shifts, _ = _plan(stages, pooling_layers, T)
    assert t == t_ins[lo], (t, t_ins[lo])

    kernel = partial(
        _sweep_kernel_v3, tuple(stages), drop_on, leaky, t, B,
        shifts[lo], lo, hi, with_proj, mm_dtype,
    )
    in_arrays = [xs_stack]
    in_specs = [_bspec((n, B, t, C))]
    if with_proj:
        in_arrays.append(x_fin)
        in_specs.append(_bspec((B, t_fin, C)))
    in_arrays.append(hs_stack)
    in_specs.append(_bspec((n, B, t, C)))
    if drop_on:
        in_arrays.append(ms_stack)
        in_specs.append(_bspec((n, B, t, C)))
    in_arrays += [w3[lo:hi], w1[lo:hi]]
    in_specs += [_bspec((n, 3, C, C)), _bspec((n, C, C))]
    if with_proj:
        in_arrays.append(w_last)
        in_specs.append(_bspec((C, C)))
    in_arrays.append(g)
    in_specs.append(_bspec((B, t, C)))

    out_shapes = [
        jax.ShapeDtypeStruct((n, 3, C, C), jnp.float32),
        jax.ShapeDtypeStruct((n, C), jnp.float32),
        jax.ShapeDtypeStruct((n, C, C), jnp.float32),
        jax.ShapeDtypeStruct((n, C), jnp.float32),
    ]
    out_specs = [_bspec((n, 3, C, C)), _bspec((n, C)), _bspec((n, C, C)),
                 _bspec((n, C))]
    if with_proj:
        out_shapes += [
            jax.ShapeDtypeStruct((C, C), jnp.float32),
            jax.ShapeDtypeStruct((8, C), jnp.float32),
        ]
        out_specs += [_bspec((C, C)), _bspec((8, C))]
    out_shapes.append(jax.ShapeDtypeStruct((B, t, C), jnp.float32))
    out_specs.append(_bspec((B, t, C)))

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


@partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13, 14, 15))
def wavenet_stack_train_v3(
    x, lengths, seed, w3, b3, w1, b1, w_last, b_last,
    stages: tuple, pooling_layers: tuple, pooling_type: str,
    drop_rate: float, leaky: bool, interpret: bool, mm_dtype=None,
):
    """Differentiable fused stack, pool-free programs + XLA glue.

    Same contract as wavenet_stack_train_v2 (seed -> threefry masks, grads
    for all weights, f32 state) but compiles within the remote helper's
    budget with dropout ON at T=2048, because no program contains the
    max-pool routing construct.  Supports both pooling types.
    """
    z, _, _, _, _, _ = _fwd_call_v3(
        x, lengths, seed, w3, b3, w1, b1, w_last, b_last,
        stages, pooling_layers, pooling_type, drop_rate, leaky, interpret,
        mm_dtype,
    )
    return z


def _fwd_rule_v3(x, lengths, seed, w3, b3, w1, b1, w_last, b_last,
                 stages, pooling_layers, pooling_type, drop_rate, leaky,
                 interpret, mm_dtype):
    z, xs, hs, ms, x_fin, us = _fwd_call_v3(
        x, lengths, seed, w3, b3, w1, b1, w_last, b_last,
        stages, pooling_layers, pooling_type, drop_rate, leaky, interpret,
        mm_dtype,
    )
    us_keys = tuple(sorted(us.keys()))  # static: the pooled layer indices
    us_vals = tuple(us[k] for k in us_keys)
    return z, (xs, hs, ms, x_fin, us_vals, lengths,
               seed, w3, w1, w_last)


def _bwd_rule_v3(stages, pooling_layers, pooling_type, drop_rate, leaky,
                 interpret, mm_dtype, residuals, g):
    (xs, hs, ms, x_fin, us_vals, lengths, seed, w3, w1,
     w_last) = residuals
    L = len(stages)
    # the first chunk always starts at the stack input: t_ins[0] == T
    _, B, T, C = xs[0].shape
    t_ins, pooled, shifts, t_fin = _plan(stages, pooling_layers, T)
    us_keys = tuple(sorted(i for i in range(L) if pooled[i]))
    us = dict(zip(us_keys, us_vals))
    drop_on = drop_rate > 0.0
    bounds = _group_bounds(stages, pooling_layers, t_ins, B, C,
                           3 if drop_on else 2)
    lengths = lengths.astype(jnp.int32)

    dw3_parts, db3_parts, dw1_parts, db1_parts = [], [], [], []
    dwl = dbl = None
    dbl_vec = None
    proj_in_kernel = not pooled[L - 1]
    if not proj_in_kernel:
        # XLA projection backward (mirrors the XLA projection in fwd)
        nonlin = _nonlin_fn(leaky)
        n_pools = sum(1 for p in pooled if p)
        lengths_fin = lengths >> n_pools
        mask_fin = _bt_mask(B, t_fin, lengths_fin)
        g = g * mask_fin
        h_fin = nonlin(x_fin)
        dwl = jnp.einsum("btc,btd->cd", h_fin, g)
        dbl_vec = jnp.sum(g, axis=(0, 1))
        g = (g @ w_last.T) * _nonlin_grad_from_h(h_fin, leaky) * mask_fin
    for ci, (lo, hi) in enumerate(reversed(bounds)):
        chunk_idx = len(bounds) - 1 - ci
        with_proj = ci == 0 and proj_in_kernel
        if pooled[hi - 1]:
            # XLA glue: expand g through this group's trailing pool
            g = _pool2_bwd_xla(
                g, us[hi - 1], t_ins[hi - 1],
                lengths >> shifts[hi - 1], pooling_type,
            )
        outs = _sweep_call_v3(
            xs[chunk_idx], hs[chunk_idx],
            ms[chunk_idx] if drop_on else None, x_fin,
            lengths, seed, w3, w1, w_last, g,
            stages, pooling_layers, pooling_type, drop_rate, leaky,
            interpret, lo, hi, with_proj, mm_dtype, t_ins, t_fin, T,
        )
        if with_proj:
            dw3c, db3c, dw1c, db1c, dwl, dbl, g = outs
        else:
            dw3c, db3c, dw1c, db1c, g = outs
        dw3_parts.append(dw3c)
        db3_parts.append(db3c)
        dw1_parts.append(dw1c)
        db1_parts.append(db1c)

    dw3 = jnp.concatenate(dw3_parts[::-1], axis=0)
    db3 = jnp.concatenate(db3_parts[::-1], axis=0)
    dw1 = jnp.concatenate(dw1_parts[::-1], axis=0)
    db1 = jnp.concatenate(db1_parts[::-1], axis=0)

    import numpy as np

    return (
        g,
        np.zeros(lengths.shape, dtype=jax.dtypes.float0),
        np.zeros(seed.shape, dtype=jax.dtypes.float0),
        dw3,
        db3,
        dw1,
        db1,
        dwl,
        dbl[0] if dbl_vec is None else dbl_vec,
    )


wavenet_stack_train_v3.defvjp(_fwd_rule_v3, _bwd_rule_v3)


# ---------------------------------------------------------------------------
# batch slicing: VMEM-fit for large-B configs (timed full-scale run, B=64)
# ---------------------------------------------------------------------------

# a v3 program keeps up to 5 whole-slice [.., Bs, t, C] blocks resident
# (fwd: x_in, mask stack, xs stash, hs stash, x_out; sweep: xs, hs, ms,
# g, g_out) — a B=64, t=1024 run measured 166.3 MB (5x32 MB blocks +
# 6.3 MB spills) against the 128 MB v5e VMEM.  The budget is set so the
# hw-validated flagship program (B=8, T=2048: 41.9 MB resident, 16k
# flattened matmul rows) stays UNSLICED while larger batches slice down
# to programs of the same magnitude (Bs=16 at t=1024 = the same 16k
# rows); a Bs=32/t=1024 slice (83.9 MB, 32k rows) killed the remote
# Mosaic compile helper
_SLICE_BYTES_BUDGET = 48 * 1024 * 1024


def plan_batch_slices(B, T, C, drop_on, budget=_SLICE_BYTES_BUDGET):
    """Smallest number of equal batch slices whose per-program resident
    bytes fit the VMEM budget; None if even single-video slices do not
    fit (caller falls back to XLA)."""
    blocks = 5 if drop_on else 4
    per_video = T * C * 4 * blocks
    for nb in range(1, B + 1):
        if B % nb == 0 and (B // nb) * per_video <= budget:
            return nb
    return None


def wavenet_stack_train_v3_auto(
    x, lengths, seed, w3, b3, w1, b1, w_last, b_last,
    stages: tuple, pooling_layers: tuple, pooling_type: str,
    drop_rate: float, leaky: bool, interpret: bool, mm_dtype=None,
    slice_budget: int = _SLICE_BYTES_BUDGET,
):
    """wavenet_stack_train_v3 with automatic batch slicing.

    Each slice is an independent kernel invocation at the SAME shapes
    (one compile, nb launches); videos are row-independent through the
    whole stack, so the no-dropout sliced forward/backward is
    bit-identical to the unsliced call.  With dropout each slice draws
    its own threefry stream from a per-slice seed
    (randint(fold_in(PRNGKey(seed), i))) — reconstructable by tests.
    Returns None when no slicing fits VMEM (caller falls back to XLA).
    """
    B, T, C = x.shape
    nb = plan_batch_slices(B, T, C, drop_rate > 0.0, budget=slice_budget)
    if nb is None:
        return None
    statics = (
        tuple(stages), tuple(pooling_layers), pooling_type,
        drop_rate, leaky, interpret, mm_dtype,
    )

    def call(x_s, len_s, seed_s):
        # positional call: custom_vjp nondiff_argnums resolve by position
        return wavenet_stack_train_v3(
            x_s, len_s, seed_s, w3, b3, w1, b1, w_last, b_last, *statics
        )

    if nb == 1:
        return call(x, lengths, seed)
    bs = B // nb
    key = jax.random.PRNGKey(seed.astype(jnp.uint32))
    parts = []
    for i in range(nb):
        seed_i = jax.random.randint(
            jax.random.fold_in(key, i), (), 0, 2**31 - 1
        ).astype(jnp.int32)
        parts.append(
            call(x[i * bs : (i + 1) * bs], lengths[i * bs : (i + 1) * bs],
                 seed_i)
        )
    return jnp.concatenate(parts, axis=0)
