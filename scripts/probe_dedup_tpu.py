"""Probe: are IDENTICAL pallas programs deduped by the Mosaic compile path?

The dropout-on trainable stack at T=2048 exceeds the remote compile
helper's per-request budget because every layer's program is a distinct
Mosaic module (static dilation).  If programs that share shapes can take
the dilation as a RUNTIME scalar (pltpu.roll with dynamic shift), layers
with the same T reuse ONE compiled program — IF the compiler dedups
identical custom calls inside a request.  This probe measures that:

  arm static : one jit with K pallas_calls, each a distinct static-shift
               program (what we have today)
  arm dynamic: one jit with K pallas_calls of ONE program taking the
               shift from scalar prefetch (what the redesign needs)

If dedup works, dynamic's compile time is ~1/K of static's.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_dedup_tpu.py
"""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, T, C = 8, 2048, 128
K = 8
SHIFTS = [1, 2, 4, 8, 16, 32, 64, 128]


def _body(x, w1, w2, shift):
    # ~6 flattened matmuls + a roll: heavy enough that Mosaic compile time
    # per program is measurable (the real layer program is ~4 matmuls)
    ids = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
    for w in (w1, w2, w1, w2, w1, w2):
        m = (ids < (T - shift)).astype(jnp.float32)[:, :, None]
        # left-shift by s == roll right by T-s (pltpu.roll needs shift >= 0)
        xr = pltpu.roll(x, T - shift, axis=1) * m
        y = jnp.dot(
            xr.reshape(B * T, C), w, preferred_element_type=jnp.float32
        ).reshape(B, T, C)
        x = jnp.maximum(y + x, 0.0)
    return x


def _kernel_static(shift, x_ref, w1_ref, w2_ref, o_ref):
    o_ref[:] = _body(x_ref[:], w1_ref[:], w2_ref[:], shift)


def _kernel_dynamic(s_ref, x_ref, w1_ref, w2_ref, o_ref):
    o_ref[:] = _body(x_ref[:], w1_ref[:], w2_ref[:], s_ref[0])


def bspec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda g, *_, _nd=nd: (0,) * _nd)


def call_static(shift, x, w1, w2):
    return pl.pallas_call(
        partial(_kernel_static, shift),
        grid=(1,),
        in_specs=[bspec((B, T, C)), bspec((C, C)), bspec((C, C))],
        out_specs=bspec((B, T, C)),
        out_shape=jax.ShapeDtypeStruct((B, T, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(x, w1, w2)


def call_dynamic(shift_arr, x, w1, w2):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[bspec((B, T, C)), bspec((C, C)), bspec((C, C))],
        out_specs=bspec((B, T, C)),
    )
    return pl.pallas_call(
        _kernel_dynamic,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(shift_arr, x, w1, w2)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32)) * 0.1
    ws = [
        (jnp.asarray(rng.randn(C, C).astype(np.float32)) * 0.05,
         jnp.asarray(rng.randn(C, C).astype(np.float32)) * 0.05)
        for _ in range(K)
    ]

    @jax.jit
    def f_dynamic(x, ws):
        for k in range(K):
            x = call_dynamic(
                jnp.asarray([SHIFTS[k]], jnp.int32), x, ws[k][0], ws[k][1])
        return x

    @jax.jit
    def f_static(x, ws):
        for k in range(K):
            x = call_static(SHIFTS[k], x, ws[k][0], ws[k][1])
        return x

    t0 = time.time()
    rd = jax.block_until_ready(f_dynamic(x, ws))
    t_dyn = time.time() - t0
    print(f"dynamic-shift (1 program x{K}): compile+run {t_dyn:.1f}s",
          flush=True)

    t0 = time.time()
    rs = jax.block_until_ready(f_static(x, ws))
    t_sta = time.time() - t0
    print(f"static-shift ({K} programs):   compile+run {t_sta:.1f}s",
          flush=True)

    d = float(jnp.max(jnp.abs(rd - rs)))
    print(f"outputs max|diff| {d:.2e} (must be 0: same math)", flush=True)
    print(f"dedup speedup: {t_sta / max(t_dyn, 1e-9):.2f}x", flush=True)


if __name__ == "__main__":
    main()
