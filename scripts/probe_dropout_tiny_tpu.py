"""Tiny-size probe of the v2 dropout backward sweep on TPU: distinguishes
an op-level Mosaic bug (tiny also fails) from compile-resource blow-up at
full size (tiny passes)."""

import time

import numpy as np
import jax
import jax.numpy as jnp

# the XLA replica must accumulate in f32 like the kernel does, or near-tie
# pool routing + grad magnitudes diverge on TPU (default = bf16-ish passes)
jax.config.update("jax_default_matmul_precision", "highest")

from mucon_tpu.models.temporal import WaveNetBlock
from mucon_tpu.models.layers import mask_time
from mucon_tpu.ops.wavenet_pallas_v2 import pack_wavenet_params
from mucon_tpu.ops.wavenet_train_pallas_v2 import wavenet_stack_train_v2


def probe(stages, pools, B, T, C, drop, chunks):
    rng = np.random.RandomState(0)
    lengths = jnp.asarray(rng.randint(T // 2, T + 1, size=B).astype(np.int32))
    x = mask_time(jnp.asarray(rng.randn(B, T, C).astype(np.float32)), lengths)
    block = WaveNetBlock(in_channels=C, stages=stages, out_dims=C,
                         pooling_layers=pools, dropout_rate=0.0)
    variables = block.init(jax.random.PRNGKey(0), x, lengths, False)
    packed = pack_wavenet_params(variables["params"], len(stages))
    n_pools = sum(1 for p in pools if p < len(stages))
    g_target = jnp.asarray(
        rng.randn(B, T >> n_pools, C).astype(np.float32))
    seed = jnp.zeros((), jnp.int32)

    def loss(xp, pk):
        z = wavenet_stack_train_v2(
            xp, lengths, seed, *pk, stages, pools, drop, False, False, chunks)
        return jnp.sum(z * g_target)

    label = f"L={len(stages)} B={B} T={T} C={C} drop={drop} chunks={chunks}"
    t0 = time.time()
    try:
        out = jax.jit(jax.grad(loss, argnums=(0, 1)))(x, packed)
        jax.block_until_ready(out)
        print(f"{label}: OK ({time.time()-t0:.1f}s)", flush=True)
        return True
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return False


def fd_check(stages, pools, B, T, C, drop, chunks):
    """Directional finite-difference vs VJP (dropout is deterministic
    given the seed, so fd is valid)."""
    rng = np.random.RandomState(1)
    lengths = jnp.asarray(rng.randint(T // 2, T + 1, size=B).astype(np.int32))
    x = mask_time(jnp.asarray(rng.randn(B, T, C).astype(np.float32)), lengths)
    block = WaveNetBlock(in_channels=C, stages=stages, out_dims=C,
                         pooling_layers=pools, dropout_rate=0.0)
    variables = block.init(jax.random.PRNGKey(0), x, lengths, False)
    packed = pack_wavenet_params(variables["params"], len(stages))
    n_pools = sum(1 for p in pools if p < len(stages))
    g_target = jnp.asarray(rng.randn(B, T >> n_pools, C).astype(np.float32))
    seed = jnp.asarray(7, jnp.int32)

    def loss(xp, pk):
        z = wavenet_stack_train_v2(
            xp, lengths, seed, *pk, stages, pools, drop, False, False, chunks)
        return jnp.sum(z * g_target)

    loss_j = jax.jit(loss)
    grads = jax.jit(jax.grad(loss, argnums=(0, 1)))(x, packed)
    dirs_x = jnp.asarray(rng.randn(*x.shape).astype(np.float32))
    dirs_p = [jnp.asarray(rng.randn(*np.asarray(p).shape).astype(np.float32))
              for p in packed]
    eps = 1e-3
    xp_p = x + eps * dirs_x
    xp_m = x - eps * dirs_x
    pk_p = tuple(p + eps * d for p, d in zip(packed, dirs_p))
    pk_m = tuple(p - eps * d for p, d in zip(packed, dirs_p))
    fd = (float(loss_j(xp_p, pk_p)) - float(loss_j(xp_m, pk_m))) / (2 * eps)
    vjp = float(jnp.sum(grads[0] * dirs_x)) + sum(
        float(jnp.sum(g * d)) for g, d in zip(grads[1], dirs_p))
    rel = abs(fd - vjp) / max(abs(fd), 1e-6)
    print(f"fd check drop={drop}: fd={fd:.4f} vjp={vjp:.4f} rel={rel:.2e}",
          flush=True)


def mask_exact_check(stages, pools, B, T, C, drop, chunks):
    """Definitive dropout-grad check: grad the kernel, then grad an XLA
    replica that multiplies by the kernel's own STASHED masks — the two
    computations are mathematically identical, so grads must match to
    f32-accum tolerance."""
    from mucon_tpu.ops.wavenet_train_pallas_v2 import _fwd_call
    from mucon_tpu.models.temporal import WaveNetLayer, pool2_time

    rng = np.random.RandomState(1)
    lengths = jnp.asarray(rng.randint(T // 2, T + 1, size=B).astype(np.int32))
    x = mask_time(jnp.asarray(rng.randn(B, T, C).astype(np.float32)), lengths)
    block = WaveNetBlock(in_channels=C, stages=stages, out_dims=C,
                         pooling_layers=pools, dropout_rate=0.0)
    variables = block.init(jax.random.PRNGKey(0), x, lengths, False)
    packed = pack_wavenet_params(variables["params"], len(stages))
    n_pools = sum(1 for p in pools if p < len(stages))
    g_target = jnp.asarray(rng.randn(B, T >> n_pools, C).astype(np.float32))
    seed = jnp.asarray(7, jnp.int32)

    _, _, _, ms = jax.jit(
        lambda xp, pk: _fwd_call(xp, lengths, seed, *pk, stages, pools,
                                 drop, False, False)
    )(x, packed)
    ms = [jax.lax.stop_gradient(m) for m in ms]

    def xla_loss(xp, pk):
        w3_, b3_, w1_, b1_, wl_, bl_ = pk
        xx = xp
        ln = lengths
        for i, d in enumerate(stages):
            T_i = xx.shape[1]
            left = jnp.pad(xx, ((0, 0), (d, 0), (0, 0)))[:, :T_i]  # x[t-d]
            right = jnp.pad(xx, ((0, 0), (0, d), (0, 0)))[:, d:]   # x[t+d]
            z = (
                jnp.einsum("btc,cd->btd", left, w3_[i, 0])
                + jnp.einsum("btc,cd->btd", xx, w3_[i, 1])
                + jnp.einsum("btc,cd->btd", right, w3_[i, 2])
                + b3_[i][None, None, :]
            )
            h = jnp.maximum(z, 0.0)
            y = jnp.einsum("btc,cd->btd", h, w1_[i]) + b1_[i][None, None, :]
            y = y * ms[i]
            xx = (y + xx) * mask_time(jnp.ones_like(xx), ln)
            if i in pools:
                p0, p1 = xx[:, 0::2], xx[:, 1::2]
                xx = jnp.where(p0 >= p1, p0, p1)  # first-max tie routing
                ln = ln // 2
                xx = xx * mask_time(jnp.ones_like(xx), ln)
        xx = jnp.maximum(xx, 0.0)
        xx = xx @ wl_ + bl_
        xx = xx * mask_time(jnp.ones_like(xx), ln)
        return jnp.sum(xx * g_target)

    def ker_loss(xp, pk):
        z = wavenet_stack_train_v2(
            xp, lengths, seed, *pk, stages, pools, drop, False, False, chunks)
        return jnp.sum(z * g_target)

    gx = jax.jit(jax.grad(xla_loss, argnums=(0, 1)))(x, packed)
    gk = jax.jit(jax.grad(ker_loss, argnums=(0, 1)))(x, packed)
    dx = float(jnp.max(jnp.abs(gx[0] - gk[0])))
    sx = float(jnp.max(jnp.abs(gx[0]))) + 1e-9
    print(f"mask-exact dx: abs {dx:.3e} rel {dx/sx:.2e}", flush=True)
    names = ["w3", "b3", "w1", "b1", "wl", "bl"]
    ok = dx / sx < 1e-3
    for nm, a, b_ in zip(names, gk[1], gx[1]):
        d = float(jnp.max(jnp.abs(a - b_)))
        s = float(jnp.max(jnp.abs(b_))) + 1e-9
        print(f"  d{nm}: abs {d:.3e} rel {d/s:.2e}", flush=True)
        ok = ok and d / s < 1e-3
    print(f"mask-exact check {'PASSED' if ok else 'FAILED'}", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    # correctness: exact masked-XLA comparison at medium size, full depth
    mask_exact_check((1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024),
                     (1, 2, 4, 8), 4, 512, 128, 0.25, 4)
    # fd directional check retained for reference (f32 fd is noisy at this
    # loss scale; advisory only)
    fd_check((1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024), (1, 2, 4, 8),
             4, 512, 128, 0.25, 4)
    # the previously-failing full size, chunks 4 then 3
    probe((1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024), (1, 2, 4, 8),
          8, 2048, 128, 0.25, 4)
    probe((1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024), (1, 2, 4, 8),
          8, 2048, 128, 0.25, 3)


if __name__ == "__main__":
    main()
