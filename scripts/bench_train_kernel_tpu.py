"""TPU validation + timing of the v2 trainable fused WaveNet stack.

Compares, at the flagship size (C=128, 11 dilated layers, pools {1,2,4,8},
B=8, T=2048, dropout OFF for exact grad comparison):

  * XLA: jax.grad through the flax stack (minus in-projection)
  * pallas v2: wavenet_stack_train_v2 custom VJP (sweep_chunks from argv)

Prints fwd+bwd wall time for each and max grad deltas. Run ON TPU (keep the
axon env intact):  python scripts/bench_train_kernel_tpu.py [chunks...]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from mucon_tpu.models.temporal import WaveNetBlock, WaveNetLayer, pool2_time
from mucon_tpu.models.layers import mask_time
from mucon_tpu.ops.wavenet_pallas_v2 import pack_wavenet_params
from mucon_tpu.ops.wavenet_train_pallas_v2 import wavenet_stack_train_v2

STAGES = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024)
POOLS = (1, 2, 4, 8)
B, T, C = 8, 2048, 128


def main():
    chunk_list = [int(a) for a in sys.argv[1:]] or [3]
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    lengths = jnp.asarray(
        rng.randint(T // 2, T + 1, size=B).astype(np.int32)
    )
    x_proj = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    x_proj = mask_time(x_proj, lengths)

    block = WaveNetBlock(
        in_channels=C, stages=STAGES, out_dims=C,
        pooling_layers=POOLS, dropout_rate=0.0,
    )
    variables = block.init(jax.random.PRNGKey(0), x_proj, lengths, False)
    packed = pack_wavenet_params(variables["params"], len(STAGES))
    # drop the in-projection params: kernel consumes x_proj directly
    w3, b3, w1, b1, wl, bl = packed
    t_out = T // (2 ** len(POOLS))
    g_target = jnp.asarray(rng.randn(B, t_out, C).astype(np.float32))

    p = variables["params"]

    def xla_loss(x_in, pk):
        w3_, b3_, w1_, b1_, wl_, bl_ = pk
        x = x_in
        ln = lengths
        for i, d in enumerate(STAGES):
            layer = WaveNetLayer(C, d, dropout_rate=0.0)
            prms = {
                "DilatedConv3_0": {"kernel": w3_[i], "bias": b3_[i]},
                "Conv1x1_0": {"kernel": w1_[i], "bias": b1_[i]},
            }
            x = layer.apply({"params": prms}, x, ln, False)
            if i in POOLS:
                x = pool2_time(x, "max")
                ln = ln // 2
                x = mask_time(x, ln)
        x = jax.nn.relu(x)
        x = x @ wl_ + bl_
        x = mask_time(x, ln)
        return jnp.sum(x * g_target)

    def kernel_loss(x_in, pk, chunks):
        z = wavenet_stack_train_v2(
            x_in, lengths, jnp.zeros((), jnp.int32), *pk,
            STAGES, POOLS, 0.0, False, False, chunks,
        )
        return jnp.sum(z * g_target)

    def bench(fn, label, *args):
        f = jax.jit(jax.grad(fn, argnums=(0, 1)))
        t0 = time.time()
        out = f(*args)
        jax.block_until_ready(out)
        print(f"{label}: compile+first {time.time()-t0:.1f}s", flush=True)
        # sync via scalar readback (donated-output block_until_ready lies
        # over the axon tunnel -- CLAUDE.md)
        n = 20
        t0 = time.time()
        for _ in range(n):
            out = f(*args)
            float(jnp.sum(out[0][0]))
        dt = (time.time() - t0) / n * 1e3
        print(f"{label}: fwd+bwd {dt:.2f} ms/iter", flush=True)
        return out, dt

    ref, xla_ms = bench(xla_loss, "XLA", x_proj, packed)

    for chunks in chunk_list:
        try:
            ker, ker_ms = bench(
                lambda xi, pk, c=chunks: kernel_loss(xi, pk, c),
                f"pallas-v2[chunks={chunks}]", x_proj, packed,
            )
        except Exception as e:  # compile OOM / mosaic failure: report, go on
            print(f"pallas-v2[chunks={chunks}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:400]}", flush=True)
            continue
        dx = float(jnp.max(jnp.abs(ker[0] - ref[0])))
        sc = float(jnp.max(jnp.abs(ref[0])))
        print(f"  dx max abs diff {dx:.3e} (ref scale {sc:.2f})")
        names = ["w3", "b3", "w1", "b1", "wl", "bl"]
        for nm, a, b_ in zip(names, ker[1], ref[1]):
            d = float(jnp.max(jnp.abs(a - b_)))
            s = float(jnp.max(jnp.abs(b_))) + 1e-9
            print(f"  d{nm}: max abs {d:.3e} rel {d/s:.2e}")
        print(f"  speed vs XLA: {xla_ms/ker_ms:.2f}x", flush=True)


if __name__ == "__main__":
    main()
