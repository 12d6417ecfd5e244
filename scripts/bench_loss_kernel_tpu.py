"""TPU timing of the fused mucon flint-loss kernel vs the XLA path.

Value fwd-only and fwd+bwd (custom VJP backward = XLA closed form), at the
flagship shape B=8, T_z=128 (T/16 after pooling), M=48, N_max=30.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from mucon_tpu.models.losses import mucon_loss_video, loss_static_config
from mucon_tpu.config import get_cfg_defaults
from mucon_tpu.ops.mucon_loss_pallas import mucon_flint_fused, mucon_flint_pallas

B, S, T, M = 8, 30, 128, 48


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    lr = jnp.asarray(rng.randn(B, S).astype(np.float32))
    seg = jnp.asarray(rng.randn(B, T, M).astype(np.float32))
    tgt = jnp.asarray(rng.randint(0, M, size=(B, S)).astype(np.int32))
    nlen = jnp.asarray(rng.randint(1, S + 1, size=B).astype(np.int32))
    tval = jnp.asarray(rng.randint(T // 2, T + 1, size=B).astype(np.int32))
    w1 = jnp.ones((M,), jnp.float32)

    cfg = get_cfg_defaults()
    cs = loss_static_config(cfg)

    def xla_fwd(lr_, seg_):
        return jnp.sum(jax.vmap(partial(mucon_loss_video, cs))(
            lr_, seg_, tgt, nlen, tval))

    def ker_fwd(lr_, seg_):
        return jnp.sum(mucon_flint_pallas(lr_, seg_, tgt, nlen, tval,
                                          0.0, None, False))

    def ker_fused(lr_, seg_):
        return jnp.sum(mucon_flint_fused(lr_, seg_, tgt, nlen, tval,
                                         0.0, False, False, w1))

    def bench(label, f, *args):
        jf = jax.jit(f)
        t0 = time.time()
        v = float(jnp.sum(jax.tree.leaves(jf(*args))[0]))
        print(f"{label}: compile {time.time()-t0:.1f}s value={v:.5f}",
              flush=True)
        n = 50
        t0 = time.time()
        for _ in range(n):
            out = jf(*args)
        float(jnp.sum(jax.tree.leaves(out)[0]))  # one readback at the end
        dt = (time.time() - t0) / n * 1e3
        print(f"{label}: {dt:.3f} ms/call", flush=True)

    bench("XLA fwd", xla_fwd, lr, seg)
    bench("kernel fwd", ker_fwd, lr, seg)
    bench("XLA fwd+bwd", jax.grad(xla_fwd, argnums=(0, 1)), lr, seg)
    bench("fused fwd+bwd", jax.grad(ker_fused, argnums=(0, 1)), lr, seg)

    # parity on hardware
    a = np.asarray(jax.jit(xla_fwd)(lr, seg))
    b = np.asarray(jax.jit(ker_fwd)(lr, seg))
    print(f"value diff {abs(a-b):.3e}", flush=True)


if __name__ == "__main__":
    main()
