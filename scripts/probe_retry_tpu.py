"""Does the remote compiler cache partial work across requests? Try the
same dropout grad three times; progress = caching works (each request gets
further), making a retry loop a viable workaround for the per-request
compile budget."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from mucon_tpu.models.layers import mask_time
from mucon_tpu.models.temporal import WaveNetBlock
from mucon_tpu.ops.wavenet_pallas_v2 import pack_wavenet_params
from mucon_tpu.ops.wavenet_train_pallas_v2 import wavenet_stack_train_v2

STAGES = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024)
POOLS = (1, 2, 4, 8)
B, T, C = 8, 2048, 128


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

    def loss(xp, p):
        z = wavenet_stack_train_v2(
            xp, ln, seed, *p, STAGES, POOLS, 0.25, False, False, 6, 6)
        return jnp.sum(z * g)

    for attempt in range(3):
        t0 = time.time()
        try:
            out = jax.jit(jax.grad(loss, argnums=(0, 1)))(x, pk)
            jax.block_until_ready(out)
            print(f"attempt {attempt}: OK ({time.time()-t0:.1f}s)",
                  flush=True)
            break
        except Exception as e:
            print(f"attempt {attempt}: FAILED ({time.time()-t0:.1f}s) "
                  f"{str(e)[:120]}", flush=True)
            jax.clear_caches()


if __name__ == "__main__":
    main()
