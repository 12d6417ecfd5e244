"""Measure the shard_map-vs-plain per-chip factor on real hardware.

Only ONE real chip exists on this rig, so the 8-chip rate cannot be
measured directly; what CAN be measured is the per-chip cost of the
shard_map program structure itself (manual partitioning, the pmean with
axis size 1, the per-shard kernel invocation) on a 1-device data-only
mesh, against the plain single-device step — both running the fused
Pallas v3 train path at the flagship shape.  The ratio is the
SHARD_FACTOR the timed-run projection uses (ICI collective cost for the
~85-leaf, ~1.3M-param grad pmean is sub-ms on v5e and is not measurable
here; the projection holds the first-epoch compile + cache fill serial
instead, which dominates any collective term).

Interleaved A/B, K chained steps per timed call, scalar-readback sync.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_shardmap_overhead_tpu.py
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

SMALL = bool(os.environ.get("BENCH_SMALL"))
K = 4 if SMALL else int(os.environ.get("PROBE_K", "50"))
TRIALS = int(os.environ.get("PROBE_TRIALS", "5"))
B, T, D, M = (2, 128, 16, 6) if SMALL else (8, 2048, 2048, 48)


def main():
    from functools import partial

    from mucon_tpu.config import get_cfg_defaults
    from mucon_tpu.data import collate_padded
    from mucon_tpu.data.general_dataset import Sample
    from mucon_tpu.data.utils import create_tf_input, create_tf_target
    from mucon_tpu.harness.optim import create_optimizer
    from mucon_tpu.models import batch_to_arrays, create_model
    from mucon_tpu.parallel.mesh import (
        _make_shardmap_grad_fn,
        make_mesh,
    )

    print(f"devices: {jax.devices()}")
    cfg = get_cfg_defaults()
    if SMALL:
        cfg.model.ft.stages = [1, 2, 4]
        cfg.model.ft.pooling_layers = [0, 1]
        cfg.model.ft.hidden_size = 16
        cfg.model.ft.last_gn_num_groups = 4
        cfg.model.fs.encoder.hidden_size = 16
        cfg.model.fs.decoder.hidden_size = 16
        cfg.tpu.use_pallas = True
        cfg.tpu.use_pallas_train = True
        cfg.model.ft.dropout_rate = 0.0
        cfg.model.ft.last_dropout_rate = 0.0
        cfg.model.fs.decoder.embedding_dropout = 0.0

    rng = np.random.RandomState(0)
    samples = []
    for i in range(B):
        t = int(rng.randint(3 * T // 4, T + 1))
        tr = rng.randint(0, M, size=6).astype(np.int64)
        samples.append(Sample(
            feats=rng.randn(t, D).astype(np.float32),
            gt_label=rng.randint(0, M, size=t).astype(np.int64),
            transcript=tr,
            transcript_tf_input=create_tf_input(tr, sos_i=M + 1),
            transcript_tf_target=create_tf_target(tr, eos_i=M),
            video_name=f"v{i}",
        ))
    batch = collate_padded(samples, n_max=30, pad_multiple=T)
    model = create_model(cfg, num_classes=M, max_decoding_steps=31,
                         input_feature_size=D)
    assert model.kernels_active(train=True) or SMALL is False
    params = model.init_params(jax.random.PRNGKey(0), batch)
    tx = create_optimizer(cfg, model.param_partition(params))
    mesh = make_mesh(1, 1, 1)
    grad_fn = _make_shardmap_grad_fn(model, mesh, teacher_forcing=True)

    def plain_grads(p, rng_k, arrays):
        def loss_fn(q):
            fwd = model.forward(q, arrays, rng=rng_k, train=True,
                                teacher_forcing=True)
            return model.loss(fwd, arrays, teacher_forcing=True).main

        return jax.grad(loss_fn)(p)

    def k_steps(grads_of):
        @partial(jax.jit, donate_argnums=(0, 1))
        def run(p, o, key, arrays):
            def body(carry, k):
                p, o = carry
                g = grads_of(p, k, arrays)
                updates, o = tx.update(g, o, p)
                return (optax.apply_updates(p, updates), o), 0.0

            keys = jax.random.split(key, K)
            (p, o), _ = jax.lax.scan(body, (p, o), keys)
            return p, o

        return run

    variants = {
        "plain": k_steps(plain_grads),
        "shardmap": k_steps(
            lambda p, k, a: grad_fn(p, k, a)[0]
        ),
    }
    arrays = jax.device_put(batch_to_arrays(batch))
    states = {
        k: (jax.tree.map(jnp.array, params),
            tx.init(jax.tree.map(jnp.array, params)))
        for k in variants
    }
    key = jax.random.PRNGKey(1)

    # compile
    for k, fn in variants.items():
        p, o = states[k]
        states[k] = fn(p, o, key, arrays)[:2]
        float(jnp.sum(jax.tree.leaves(states[k][0])[0]))
        print(f"{k}: compiled")

    times = {k: [] for k in variants}
    for trial in range(TRIALS):
        for k, fn in variants.items():
            key, kk = jax.random.split(key)
            p, o = states[k]
            t0 = time.perf_counter()
            p, o = fn(p, o, kk, arrays)
            float(jnp.sum(jax.tree.leaves(p)[0]))  # scalar readback
            times[k].append((time.perf_counter() - t0) * 1e3 / K)
            states[k] = (p, o)

    for k, ts in times.items():
        print(f"{k}: best {min(ts):.3f} ms/step  all "
              + " ".join(f"{t:.3f}" for t in ts))
    factor = min(times["shardmap"]) / min(times["plain"])
    print(f"SHARD_FACTOR={factor:.3f}")


if __name__ == "__main__":
    main()
