"""Test: does a TINY first Mosaic compile absorb the session cold-start,
making the full f32+dropout v3 grad compile fast?

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_warmup_tpu.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mucon_tpu.models.layers import mask_time
from mucon_tpu.models.temporal import WaveNetBlock
from mucon_tpu.ops.wavenet_pallas_v2 import pack_wavenet_params
from mucon_tpu.ops.wavenet_train_pallas_v3 import wavenet_stack_train_v3

STAGES = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024)
POOLS = (1, 2, 4, 8)
B, T, C = 8, 2048, 128


def warmup():
    def k(x_ref, o_ref):
        o_ref[:] = jnp.dot(x_ref[:], x_ref[:],
                           preferred_element_type=jnp.float32)

    x = jnp.ones((128, 128), jnp.float32)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32)
    )(x)


def main():
    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    jax.block_until_ready(jax.jit(warmup)())
    print(f"tiny warmup compile: {time.time()-t0:.1f}s", flush=True)

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
            xp, ln, seed, *p, STAGES, POOLS, "max", 0.25, False, False, None)
        return jnp.sum(z * g)

    gradf = jax.jit(jax.grad(loss, argnums=(0, 1)))
    t0 = time.time()
    jax.block_until_ready(gradf(x, pk))
    print(f"f32 drop=0.25 grad compile after warmup: {time.time()-t0:.1f}s",
          flush=True)

    K = 30
    for _ in range(2):
        t0 = time.time()
        for _ in range(K):
            out = gradf(x, pk)
        jax.block_until_ready(out)
        print(f"grad: {(time.time()-t0)/K*1e3:.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
