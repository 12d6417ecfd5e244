"""Controlled timing of the f32+dropout v3 grad: one compile, then both
timing methodologies (independent repeated calls vs chained dependency),
to explain the 2 ms vs 45 ms discrepancy between earlier probes.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_v3_timing_tpu.py [drop]
"""

import sys
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


def main():
    drop = float(sys.argv[1]) if len(sys.argv) > 1 else 0.25
    print("devices:", jax.devices(), "drop:", drop, flush=True)
    rng = np.random.RandomState(0)
    ln = jnp.asarray(rng.randint(T // 2, T + 1, size=B).astype(np.int32))
    x = mask_time(jnp.asarray(rng.randn(B, T, C).astype(np.float32)), ln)
    block = WaveNetBlock(in_channels=C, stages=STAGES, out_dims=C,
                         pooling_layers=POOLS, dropout_rate=0.0)
    v = block.init(jax.random.PRNGKey(0), x, ln, False)
    pk = pack_wavenet_params(v["params"], len(STAGES))
    seed = jnp.asarray(3, jnp.int32)
    g = jnp.asarray(rng.randn(B, T // 16, C).astype(np.float32))

    def loss(xp, p):
        z = wavenet_stack_train_v3(
            xp, ln, seed, *p, STAGES, POOLS, "max", drop, False, False, None)
        return jnp.sum(z * g)

    fwd = jax.jit(lambda xp, p: wavenet_stack_train_v3(
        xp, ln, seed, *p, STAGES, POOLS, "max", drop, False, False, None))
    t0 = time.time()
    jax.block_until_ready(fwd(x, pk))
    print(f"fwd compile {time.time()-t0:.1f}s", flush=True)

    gradf = jax.jit(jax.grad(loss, argnums=(0, 1)))
    t0 = time.time()
    jax.block_until_ready(gradf(x, pk))
    print(f"grad compile {time.time()-t0:.1f}s", flush=True)

    for K in (30,):
        # methodology A: independent repeated calls (device may overlap)
        for trial in range(3):
            t0 = time.time()
            for _ in range(K):
                out = gradf(x, pk)
            jax.block_until_ready(out)
            print(f"A independent: {(time.time()-t0)/K*1e3:.2f} ms/iter",
                  flush=True)
        # methodology B: chained (strict serial dependency)
        xs_ = x
        for trial in range(3):
            t0 = time.time()
            for _ in range(K):
                dx, dp = gradf(xs_, pk)
                xs_ = x + 0.0 * dx
            jax.block_until_ready(xs_)
            print(f"B chained:    {(time.time()-t0)/K*1e3:.2f} ms/iter",
                  flush=True)
        # methodology C: fwd only, independent
        for trial in range(2):
            t0 = time.time()
            for _ in range(K):
                out = fwd(x, pk)
            jax.block_until_ready(out)
            print(f"C fwd indep:  {(time.time()-t0)/K*1e3:.2f} ms/iter",
                  flush=True)


if __name__ == "__main__":
    main()
