"""Bisect the f32+dropout v3 slowness: fwd-only vs grad, per-arm timing
with repeated trials to control run-to-run tunnel noise.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_v3_bisect_tpu.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from mucon_tpu.models.layers import mask_time
from mucon_tpu.models.temporal import WaveNetBlock
from mucon_tpu.ops.wavenet_pallas_v2 import pack_wavenet_params
from mucon_tpu.ops.wavenet_train_pallas_v3 import wavenet_stack_train_v3

STAGES = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024)
POOLS = (1, 2, 4, 8)
B, T, C = 8, 2048, 128


def bench(label, f, *args, K=30, trials=3):
    t0 = time.time()
    out = jax.block_until_ready(f(*args))
    print(f"  {label}: compile {time.time()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(trials):
        t0 = time.time()
        for _ in range(K):
            out = f(*args)
        jax.block_until_ready(out)
        best = min(best, (time.time() - t0) / K * 1e3)
    print(f"  {label}: {best:.2f} ms/iter (best of {trials}x{K})", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    ln = jnp.asarray(rng.randint(T // 2, T + 1, size=B).astype(np.int32))
    x = mask_time(jnp.asarray(rng.randn(B, T, C).astype(np.float32)), ln)
    block = WaveNetBlock(in_channels=C, stages=STAGES, out_dims=C,
                         pooling_layers=POOLS, dropout_rate=0.0)
    v = block.init(jax.random.PRNGKey(0), x, ln, False)
    pk = pack_wavenet_params(v["params"], len(STAGES))
    seed = jnp.asarray(3, jnp.int32)
    g = jnp.asarray(rng.randn(B, T // 16, C).astype(np.float32))

    def masks_only(s):
        # the XLA threefry mask generation alone
        t_ins = []
        t = T
        for i in range(len(STAGES)):
            t_ins.append(t)
            if i in POOLS:
                t = t // 2
        key = jax.random.PRNGKey(s.astype(jnp.uint32))
        ms = [
            (jax.random.uniform(jax.random.fold_in(key, i), (B, t, C))
             >= 0.25).astype(jnp.float32) / 0.75
            for i, t in enumerate(t_ins)
        ]
        return sum(jnp.sum(m) for m in ms)

    bench("threefry masks alone", jax.jit(masks_only), seed)

    for drop in (0.25, 0.0):
        def fwd(xp, p, drop=drop):
            return wavenet_stack_train_v3(
                xp, ln, seed, *p, STAGES, POOLS, "max", drop, False,
                False, None)

        bench(f"f32 fwd-only drop={drop}", jax.jit(fwd), x, pk)

    def loss(xp, p):
        z = wavenet_stack_train_v3(
            xp, ln, seed, *p, STAGES, POOLS, "max", 0.25, False, False, None)
        return jnp.sum(z * g)

    bench("f32 grad drop=0.25", jax.jit(jax.grad(loss, argnums=(0, 1))), x, pk)


if __name__ == "__main__":
    main()
