"""v3 trainable stack on real TPU: compile feasibility + fwd/bwd timing.

Full-scale (B=8, T=2048, C=128, 11 stages) grad compile of the v3
pool-free-program stack, dropout 0 and 0.25 — the exact configuration
whose v2 compile exceeded the remote helper's budget.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_v3_tpu.py [drop ...]
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
    drops = [float(a) for a in sys.argv[1:]] or [0.25, 0.0]
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

    for drop in drops:
        for mm in (None, jnp.bfloat16):
            tag = f"drop={drop} mm={'bf16' if mm is not None else 'f32'}"

            def loss(xp, p):
                z = wavenet_stack_train_v3(
                    xp, ln, seed, *p, STAGES, POOLS, "max", drop, False,
                    False, mm)
                return jnp.sum(z * g)

            gradf = jax.jit(jax.grad(loss, argnums=(0, 1)))
            t0 = time.time()
            try:
                out = jax.block_until_ready(gradf(x, pk))
                print(f"{tag}: grad compile+run {time.time()-t0:.1f}s",
                      flush=True)
            except Exception as e:
                print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:160]} "
                      f"({time.time()-t0:.1f}s)", flush=True)
                continue
            # steady-state timing: chain K calls, one readback
            K = 20
            xs_ = x
            t0 = time.time()
            for _ in range(K):
                dx, dp = gradf(xs_, pk)
                xs_ = x + 0.0 * dx  # chain dependency
            float(jnp.sum(dp[0]))
            print(f"{tag}: fwd+bwd {1e3*(time.time()-t0)/K:.2f} ms/iter",
                  flush=True)


if __name__ == "__main__":
    main()
