"""Compile each v3 fwd chunk program SEPARATELY (f32, dropout on) to find
which chunk owns the ~700 s compile.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_fwd_chunks_tpu.py
"""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mucon_tpu.ops.wavenet_train_pallas_v2 import _VMEM_LIMIT, _plan
from mucon_tpu.ops.wavenet_train_pallas_v3 import (
    _bspec,
    _fwd_kernel_v3,
    _group_bounds,
)

STAGES = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024)
POOLS = (1, 2, 4, 8)
B, T, C = 8, 2048, 128
DROP = 0.25


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    ln = jnp.asarray(rng.randint(T // 2, T + 1, size=B).astype(np.int32))
    seed_arr = jnp.asarray([3], jnp.int32)
    L = len(STAGES)
    t_ins, pooled, shifts, t_fin = _plan(STAGES, POOLS, T)
    bounds = _group_bounds(STAGES, POOLS, t_ins, B, C, 3)
    print("bounds:", bounds, flush=True)

    for lo, hi in bounds:
        n = hi - lo
        t = t_ins[lo]
        with_proj = hi == L and not pooled[L - 1]
        kernel = partial(
            _fwd_kernel_v3, STAGES, True, False, t, B,
            shifts[lo], lo, hi, with_proj, None,
        )
        x = jnp.asarray(rng.randn(B, t, C).astype(np.float32))
        w3 = jnp.asarray(rng.randn(n, 3, C, C).astype(np.float32)) * 0.05
        b3 = jnp.asarray(rng.randn(n, C).astype(np.float32))
        w1 = jnp.asarray(rng.randn(n, C, C).astype(np.float32)) * 0.05
        b1 = jnp.asarray(rng.randn(n, C).astype(np.float32))
        ms = jnp.asarray((rng.rand(n, B, t, C) > DROP).astype(np.float32))
        in_arrays = [x, w3, b3, w1, b1]
        in_specs = [_bspec((B, t, C)), _bspec((n, 3, C, C)), _bspec((n, C)),
                    _bspec((n, C, C)), _bspec((n, C))]
        if with_proj:
            wl = jnp.asarray(rng.randn(C, C).astype(np.float32)) * 0.05
            bl = jnp.asarray(rng.randn(C).astype(np.float32))
            in_arrays += [wl, bl]
            in_specs += [_bspec((C, C)), _bspec((C,))]
        in_arrays.append(ms)
        in_specs.append(_bspec((n, B, t, C)))
        out_shapes = [
            jax.ShapeDtypeStruct((B, t, C), jnp.float32),
            jax.ShapeDtypeStruct((n, B, t, C), jnp.float32),
            jax.ShapeDtypeStruct((n, B, t, C), jnp.float32),
        ]
        out_specs = [_bspec((B, t, C)), _bspec((n, B, t, C)),
                     _bspec((n, B, t, C))]
        if with_proj:
            out_shapes.append(jax.ShapeDtypeStruct((B, t_fin, C), jnp.float32))
            out_specs.append(_bspec((B, t_fin, C)))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(1,),
            in_specs=in_specs, out_specs=out_specs,
        )
        f = jax.jit(lambda *a, k=kernel, gs=grid_spec, os=out_shapes:
                    pl.pallas_call(
                        k, grid_spec=gs, out_shape=os,
                        compiler_params=pltpu.CompilerParams(
                            vmem_limit_bytes=_VMEM_LIMIT),
                    )(ln, seed_arr, *a))
        t0 = time.time()
        try:
            jax.block_until_ready(f(*in_arrays))
            print(f"fwd chunk [{lo},{hi}) t={t}: {time.time()-t0:.1f}s",
                  flush=True)
        except Exception as e:
            print(f"fwd chunk [{lo},{hi}) t={t}: FAILED {type(e).__name__} "
                  f"{str(e)[:120]} ({time.time()-t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
