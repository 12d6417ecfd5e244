"""Per-program compile-time profile of the trainable-stack pallas programs.

The dropout-on T=2048 grad compile exceeds the remote helper's per-request
budget, yet probe_dedup_tpu.py shows a 6-matmul whole-batch program
compiles in <1s — so some construct in the REAL programs is
pathologically expensive to compile.  This probe times each fwd chunk and
each sweep chunk as its OWN jit (drop=0 and drop=0.25), printing a
per-program breakdown that localizes the hotspot.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_sweep_compile_tpu.py [drop]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from mucon_tpu.models.layers import mask_time
from mucon_tpu.models.temporal import WaveNetBlock
from mucon_tpu.ops.wavenet_pallas_v2 import pack_wavenet_params
from mucon_tpu.ops import wavenet_train_pallas_v2 as tv2

STAGES = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024)
POOLS = (1, 2, 4, 8)
B, T, C = 8, 2048, 128


def main():
    drop = float(sys.argv[1]) if len(sys.argv) > 1 else 0.25
    print("devices:", jax.devices(), "drop:", drop, flush=True)
    rng = np.random.RandomState(0)
    ln = jnp.asarray(rng.randint(T // 2, T + 1, size=B).astype(np.int32))
    x = mask_time(jnp.asarray(rng.randn(B, T, C).astype(np.float32)), ln)
    block = WaveNetBlock(in_channels=C, stages=STAGES, out_dims=C,
                         pooling_layers=POOLS, dropout_rate=0.0)
    v = block.init(jax.random.PRNGKey(0), x, ln, False)
    w3, b3, w1, b1, wl, bl = pack_wavenet_params(v["params"], len(STAGES))
    seed = jnp.asarray(3, jnp.int32)

    L = len(STAGES)
    t_ins, pooled, shifts, t_fin = tv2._plan(STAGES, POOLS, T)
    per_layer = 3 if drop > 0.0 else 2
    bounds = tv2._chunk_bounds_budget(L, 3, t_ins, B, C, per_layer)
    print("bounds:", bounds, flush=True)

    # masks + stash (built on device once, outside the timed compiles)
    if drop > 0.0:
        key = jax.random.PRNGKey(0)
        ms = tuple(
            (jax.random.uniform(jax.random.fold_in(key, i), (B, t, C))
             >= drop).astype(jnp.float32) / (1.0 - drop)
            for i, t in enumerate(t_ins)
        )
    else:
        ms = ()
    xs = tuple(
        jnp.asarray(rng.randn(B, t, C).astype(np.float32)) for t in t_ins
    ) + (jnp.asarray(rng.randn(B, t_fin, C).astype(np.float32)),)
    hs = tuple(
        jnp.asarray(np.abs(rng.randn(B, t, C)).astype(np.float32))
        for t in t_ins
    )
    g = jnp.asarray(rng.randn(B, t_fin, C).astype(np.float32))

    def timed(label, fn, *args):
        t0 = time.time()
        try:
            out = jax.block_until_ready(jax.jit(fn)(*args))
            print(f"  {label}: {time.time()-t0:.1f}s", flush=True)
            return out
        except Exception as e:
            print(f"  {label}: FAILED {type(e).__name__} "
                  f"{str(e)[:120]} ({time.time()-t0:.1f}s)", flush=True)
            return None

    print("fwd chunks:", flush=True)
    for lo, hi in bounds:
        def fwd_one(x_, lo=lo, hi=hi):
            z, xs_, hs_, ms_ = tv2._fwd_call(
                x_, ln, seed, w3, b3, w1, b1, wl, bl,
                STAGES, POOLS, drop, False, False, 1)
            return z
        # time the chunk alone by calling _fwd_call restricted: simplest is
        # whole fwd at fc equal to this chunking; instead time per-chunk via
        # monkeypatched bounds
        break
    # simpler: time the WHOLE fwd at fc=len(bounds) (known fine), then each
    # sweep chunk individually
    def fwd_all(x_):
        return tv2._fwd_call(
            x_, ln, seed, w3, b3, w1, b1, wl, bl,
            STAGES, POOLS, drop, False, False, len(bounds))[0]

    timed(f"fwd all ({len(bounds)} programs)", fwd_all, x)

    print("sweep chunks (each as its own jit):", flush=True)
    rev = list(reversed(bounds))
    for ci, (lo, hi) in enumerate(rev):
        with_proj = ci == 0
        g_in = g if with_proj else jnp.asarray(
            rng.randn(B, t_ins[hi], C).astype(np.float32))

        def sweep_one(g_, lo=lo, hi=hi, with_proj=with_proj):
            return tv2._sweep_call(
                xs, hs, ms, ln, seed, w3, w1, b1, wl, g_,
                STAGES, POOLS, drop, False, False,
                lo, hi, with_proj)[-1]

        timed(f"sweep [{lo},{hi}) proj={with_proj}", sweep_one, g_in)


if __name__ == "__main__":
    main()
