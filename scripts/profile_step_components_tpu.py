"""Component decomposition of the flagship train step on real TPU.

Times K-iteration lax.scan chains (one jit, one device program, one sync)
for nested subsets of the step:

  enc_fwd   : in-projection + fused v3 stack forward (sum reduce)
  enc_grad  : d(sum z)/d(params) through the kernel custom VJP
  full_fwd  : model.forward + loss.main (value only)
  full_grad : jax.grad of loss.main
  full_step : grads + partitioned clip + SGD update (the real step)

Subtractions localize the time: decoder fwd = full_fwd - enc_fwd,
decoder+loss bwd = full_grad - enc_grad - (full_fwd - enc_fwd), optimizer
= full_step - full_grad.  Methodology: best-of-3 trials of one K-step
chained program (per-iter scalar dependence), matching bench.py.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_step_components_tpu.py
"""

import os
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax

SMALL = bool(os.environ.get("BENCH_SMALL"))
K = 5 if SMALL else 30
B, T, D, M = (2, 128, 16, 6) if SMALL else (8, 2048, 2048, 48)
DROP = float(os.environ.get("PROFILE_DROP", "0.25"))
USE_PALLAS = os.environ.get("PROFILE_XLA") is None


def build():
    from mucon_tpu.config import get_cfg_defaults
    from mucon_tpu.models import create_model

    cfg = get_cfg_defaults()
    if SMALL:
        cfg.model.ft.stages = [1, 2, 4]
        cfg.model.ft.pooling_layers = [0, 1]
        cfg.model.ft.hidden_size = 16
        cfg.model.ft.last_gn_num_groups = 4
        cfg.model.fs.encoder.hidden_size = 16
        cfg.model.fs.decoder.hidden_size = 16
    cfg.tpu.use_pallas = USE_PALLAS
    cfg.tpu.use_pallas_train = USE_PALLAS
    cfg.tpu.scan_unroll = int(os.environ.get("SCAN_UNROLL", "1"))
    cfg.model.ft.dropout_rate = DROP
    cfg.model.ft.last_dropout_rate = DROP
    cfg.model.fs.decoder.embedding_dropout = DROP
    model = create_model(
        cfg, num_classes=M, max_decoding_steps=31, input_feature_size=D
    )
    return cfg, model


def make_batch():
    from mucon_tpu.data import collate_padded
    from mucon_tpu.data.general_dataset import Sample
    from mucon_tpu.data.utils import create_tf_input, create_tf_target
    from mucon_tpu.models import batch_to_arrays

    rng = np.random.RandomState(0)
    samples = []
    for i in range(B):
        t = int(rng.randint(T // 2, T + 1))
        tr = rng.randint(0, M, size=int(rng.randint(3, 12))).astype(np.int64)
        samples.append(Sample(
            feats=rng.randn(t, D).astype(np.float32),
            gt_label=rng.randint(0, M, size=t).astype(np.int64),
            transcript=tr,
            transcript_tf_input=create_tf_input(tr, sos_i=M + 1),
            transcript_tf_target=create_tf_target(tr, eos_i=M),
            video_name=f"v{i}",
        ))
    batch = collate_padded(samples, n_max=30, pad_multiple=T)
    return batch, batch_to_arrays(batch)


def timed(label, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.time() - t0) / K * 1e3)
    print(f"{label:10s}: {best:7.3f} ms/iter  (K={K}, best-of-3)", flush=True)
    return best


def main():
    print("devices:", jax.devices(), "drop:", DROP,
          "pallas:", USE_PALLAS, flush=True)
    cfg, model = build()
    batch, arrays = make_batch()
    arrays = jax.device_put(arrays)

    from mucon_tpu.harness.optim import create_optimizer

    params = model.init_params(jax.random.PRNGKey(0), batch)
    tx = create_optimizer(cfg, model.param_partition(params))
    opt_state = tx.init(params)

    # NOTE: arrays are passed as jit ARGUMENTS — closing over them embeds
    # the feature batch as a captured compile-time constant.
    def enc_z(p, arrays, rng):
        if USE_PALLAS:
            z, tz = model._encode_pallas_train(p, arrays, rng)
            assert z is not None, "kernel path did not engage"
            return z
        fwd = model.forward(p, arrays, rng=rng, train=True,
                            teacher_forcing=True)
        return fwd.segmentation  # no encoder-only surface on XLA path

    @jax.jit
    def enc_fwd_k(p, key, arrays):
        def body(c, k):
            z = enc_z(p, arrays, jax.random.fold_in(key, k))
            return c + z.sum(), None
        return jax.lax.scan(body, 0.0, jnp.arange(K))[0]

    def tree_sum(g):
        # consume EVERY grad leaf so XLA cannot DCE any of the backward
        return sum(x.sum() for x in jax.tree_util.tree_leaves(g))

    @jax.jit
    def enc_grad_k(p, key, arrays):
        def body(c, k):
            g = jax.grad(
                lambda q: enc_z(q, arrays, jax.random.fold_in(key, k)).sum()
            )(p)
            return c + tree_sum(g), None
        return jax.lax.scan(body, 0.0, jnp.arange(K))[0]

    def loss_main(p, arrays, rng):
        fwd = model.forward(p, arrays, rng=rng, train=True,
                            teacher_forcing=True)
        return model.loss(fwd, arrays, teacher_forcing=True).main

    @jax.jit
    def full_fwd_k(p, key, arrays):
        def body(c, k):
            return c + loss_main(p, arrays, jax.random.fold_in(key, k)), None
        return jax.lax.scan(body, 0.0, jnp.arange(K))[0]

    @jax.jit
    def full_grad_k(p, key, arrays):
        def body(c, k):
            g = jax.grad(loss_main)(p, arrays, jax.random.fold_in(key, k))
            return c + tree_sum(g), None
        return jax.lax.scan(body, 0.0, jnp.arange(K))[0]

    @jax.jit
    def full_step_k(p, o, key, arrays):
        def body(carry, k):
            p, o = carry
            g = jax.grad(loss_main)(p, arrays, jax.random.fold_in(key, k))
            updates, o = tx.update(g, o, p)
            p = optax.apply_updates(p, updates)
            return (p, o), None
        (p, o), _ = jax.lax.scan(body, (p, o), jnp.arange(K))
        return p, o

    key = jax.random.PRNGKey(7)
    t_ef = timed("enc_fwd", enc_fwd_k, params, key, arrays)
    t_eg = timed("enc_grad", enc_grad_k, params, key, arrays)
    t_ff = timed("full_fwd", full_fwd_k, params, key, arrays)
    t_fg = timed("full_grad", full_grad_k, params, key, arrays)
    t_fs = timed("full_step", full_step_k, params, opt_state, key, arrays)

    dec_fwd = t_ff - t_ef
    tail_bwd = t_fg - t_eg - dec_fwd
    opt = t_fs - t_fg
    print(f"\nDECOMPOSITION (ms/iter):")
    print(f"  encoder fwd (in-proj + stack)      {t_ef:7.3f}")
    print(f"  encoder bwd (grad - fwd)           {t_eg - t_ef:7.3f}")
    print(f"  decoder+heads+loss fwd             {dec_fwd:7.3f}")
    print(f"  decoder+heads+loss bwd             {tail_bwd:7.3f}")
    print(f"  clip + optimizer + update          {opt:7.3f}")
    print(f"  TOTAL (full_step)                  {t_fs:7.3f}")


if __name__ == "__main__":
    main()
