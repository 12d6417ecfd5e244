"""Isolate: does the mask-stash FORWARD compile at T=2048 with dropout?
And does a single 2-layer sweep at T=2048 compile when invoked via a
truncated stack (L=2, no pools) so only one T=2048 sweep program exists?"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from mucon_tpu.models.temporal import WaveNetBlock
from mucon_tpu.models.layers import mask_time
from mucon_tpu.ops.wavenet_pallas_v2 import pack_wavenet_params
from mucon_tpu.ops.wavenet_train_pallas_v2 import _fwd_call, wavenet_stack_train_v2


def stage(label, fn):
    t0 = time.time()
    try:
        v = fn()
        jax.block_until_ready(v)
        print(f"{label}: OK ({time.time()-t0:.1f}s)", flush=True)
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)


def setup(stages, pools, B, T, C):
    rng = np.random.RandomState(0)
    lengths = jnp.asarray(rng.randint(T // 2, T + 1, size=B).astype(np.int32))
    x = mask_time(jnp.asarray(rng.randn(B, T, C).astype(np.float32)), lengths)
    block = WaveNetBlock(in_channels=C, stages=stages, out_dims=C,
                         pooling_layers=pools, dropout_rate=0.0)
    variables = block.init(jax.random.PRNGKey(0), x, lengths, False)
    packed = pack_wavenet_params(variables["params"], len(stages))
    return x, lengths, packed


def main():
    print("devices:", jax.devices(), flush=True)
    B, T, C = 8, 2048, 128
    FULL = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024)
    POOLS = (1, 2, 4, 8)
    seed = jnp.asarray(7, jnp.int32)

    x, lengths, packed = setup(FULL, POOLS, B, T, C)
    stage("fwd-stash T=2048 drop=.25", jax.jit(
        lambda: _fwd_call(x, lengths, seed, *packed, FULL, POOLS,
                          0.25, False, False)[0]))

    # two-layer stack, no pools -> backward = ONE sweep program at T=2048
    L2 = (1, 2)
    x2, lengths2, packed2 = setup(L2, (), B, T, C)
    g2 = jnp.asarray(np.random.RandomState(2).randn(B, T, C).astype(np.float32))

    def loss2(xp, pk, drop):
        z = wavenet_stack_train_v2(
            xp, lengths2, seed, *pk, L2, (), drop, False, False, 1)
        return jnp.sum(z * g2)

    stage("L2 sweep T=2048 drop=0", lambda: jax.jit(
        jax.grad(lambda a, b: loss2(a, b, 0.0), argnums=(0, 1)))(x2, packed2))
    stage("L2 sweep T=2048 drop=.25", lambda: jax.jit(
        jax.grad(lambda a, b: loss2(a, b, 0.25), argnums=(0, 1)))(x2, packed2))


if __name__ == "__main__":
    main()
