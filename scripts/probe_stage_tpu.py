"""Staged isolation of the dropout-on T=2048 compile failure.

Each stage is one jit; stages print as they complete so a killed run still
shows how far it got.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from mucon_tpu.models.layers import mask_time
from mucon_tpu.models.temporal import WaveNetBlock
from mucon_tpu.ops.wavenet_pallas_v2 import pack_wavenet_params
from mucon_tpu.ops.wavenet_train_pallas_v2 import (
    _fwd_call,
    wavenet_stack_train_v2,
)

STAGES = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024)
POOLS = (1, 2, 4, 8)
B, T, C = 8, 2048, 128
DROP = 0.25


def stage(label, fn):
    t0 = time.time()
    try:
        v = fn()
        jax.block_until_ready(v)
        print(f"{label}: OK ({time.time()-t0:.1f}s)", flush=True)
        return True
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:160]} "
              f"({time.time()-t0:.1f}s)", flush=True)
        return False


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
    t_out = T // 16
    g = jnp.asarray(rng.randn(B, t_out, C).astype(np.float32))

    for fc, sc in ((3, 3),):
        def loss(xp, p, fc=fc, sc=sc):
            z = wavenet_stack_train_v2(
                xp, ln, seed, *p, STAGES, POOLS, DROP, False, False, sc, fc)
            return jnp.sum(z * g)

        stage(f"grad drop fc={fc} sc={sc}", lambda loss=loss: jax.jit(
            jax.grad(loss, argnums=(0, 1)))(x, pk))


if __name__ == "__main__":
    main()
