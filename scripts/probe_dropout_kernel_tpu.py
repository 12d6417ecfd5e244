"""Isolate the dropout-on v2 kernel compile failure: fwd-only, then grad
with each chunk count. Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_dropout_kernel_tpu.py [chunks...]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from mucon_tpu.models.temporal import WaveNetBlock
from mucon_tpu.models.layers import mask_time
from mucon_tpu.ops.wavenet_pallas_v2 import pack_wavenet_params
from mucon_tpu.ops.wavenet_train_pallas_v2 import wavenet_stack_train_v2

STAGES = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024)
POOLS = (1, 2, 4, 8)
B, T, C = 8, 2048, 128
DROP = 0.25


def main():
    chunk_list = [int(a) for a in sys.argv[1:]] or [4, 6]
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    lengths = jnp.asarray(rng.randint(T // 2, T + 1, size=B).astype(np.int32))
    x = mask_time(jnp.asarray(rng.randn(B, T, C).astype(np.float32)), lengths)
    block = WaveNetBlock(in_channels=C, stages=STAGES, out_dims=C,
                         pooling_layers=POOLS, dropout_rate=0.0)
    variables = block.init(jax.random.PRNGKey(0), x, lengths, False)
    packed = pack_wavenet_params(variables["params"], len(STAGES))
    t_out = T // (2 ** len(POOLS))
    g_target = jnp.asarray(rng.randn(B, t_out, C).astype(np.float32))
    seed = jnp.zeros((), jnp.int32)

    def stage(label, fn):
        t0 = time.time()
        try:
            v = fn()
            jax.block_until_ready(v)
            print(f"{label}: OK ({time.time()-t0:.1f}s)", flush=True)
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    stage("fwd drop=.25", jax.jit(lambda: wavenet_stack_train_v2(
        x, lengths, seed, *packed, STAGES, POOLS, DROP, False, False, 3)))

    for chunks in chunk_list:
        def loss(xp, pk, c=chunks):
            z = wavenet_stack_train_v2(
                xp, lengths, seed, *pk, STAGES, POOLS, DROP, False, False, c)
            return jnp.sum(z * g_target)

        stage(f"grad drop=.25 chunks={chunks}",
              lambda c=chunks: jax.jit(
                  jax.grad(lambda xp, pk: loss(xp, pk, c), argnums=(0, 1))
              )(x, packed))


if __name__ == "__main__":
    main()
