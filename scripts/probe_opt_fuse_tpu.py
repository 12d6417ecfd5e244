"""Isolate and attack the clip+optimizer+update segment of the train step.

scripts/profile_step_components_tpu.py puts it at 0.32-0.40 ms of a
3.6 ms on-device step (B=8, T=2048 flagship).  The update chain walks
~100 param leaves (clip norms, weight decay, SGD momentum, apply), so the
hypothesis was per-leaf kernel overhead inside the program, fixable by
running the chain over ONE flattened vector (optax.flatten-style).

RESULT (v5e, 2026-08-18): hypothesis REFUTED.  The tree-path update runs
in 0.0138 ms/iter standalone — XLA fully fuses the 85-leaf chain — while
the flattened arms are 20-36x SLOWER (0.28 / 0.49 ms: the ravel
concatenates and full-vector passes cost real HBM traffic).  The 0.3-0.4
ms attributed to "clip+optimizer" by the subtractive step decomposition
is therefore mis-attribution (full_step-vs-full_grad program-level
differences: donation/carry layout, not optimizer compute).  The tree
optimizer stays; do not revisit.

Arms (each a K-chained jit, best-of-3, matching the step profiler):
  tree      : current create_optimizer chain + optax.apply_updates
  flat_sgd  : partitioned clip on precomputed flat slices + wd + momentum
              all on a single ravelled vector, unravel at the end

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_opt_fuse_tpu.py
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

SMALL = bool(os.environ.get("BENCH_SMALL"))
K = 10 if SMALL else 100


def build_params():
    from mucon_tpu.config import get_cfg_defaults
    from mucon_tpu.models import create_model
    from mucon_tpu.data import collate_padded
    from mucon_tpu.data.general_dataset import Sample
    from mucon_tpu.data.utils import create_tf_input, create_tf_target

    cfg = get_cfg_defaults()
    B, T, D, M = (2, 128, 16, 6) if SMALL else (8, 2048, 2048, 48)
    if SMALL:
        cfg.model.ft.stages = [1, 2, 4]
        cfg.model.ft.pooling_layers = [0, 1]
        cfg.model.ft.hidden_size = 16
        cfg.model.ft.last_gn_num_groups = 4
        cfg.model.fs.encoder.hidden_size = 16
        cfg.model.fs.decoder.hidden_size = 16
    model = create_model(cfg, num_classes=M, max_decoding_steps=31,
                         input_feature_size=D)
    rng = np.random.RandomState(0)
    samples = []
    for i in range(B):
        t = int(rng.randint(T // 2, T + 1))
        tr = rng.randint(0, M, size=5).astype(np.int64)
        samples.append(Sample(
            feats=rng.randn(t, D).astype(np.float32),
            gt_label=rng.randint(0, M, size=t).astype(np.int64),
            transcript=tr,
            transcript_tf_input=create_tf_input(tr, sos_i=M + 1),
            transcript_tf_target=create_tf_target(tr, eos_i=M),
            video_name=f"v{i}",
        ))
    batch = collate_padded(samples, n_max=30, pad_multiple=T)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    return cfg, model, params


def timed(label, fn, *args):
    out = jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        best = min(best, (time.time() - t0) / K * 1e3)
    print(f"{label:10s}: {best:7.4f} ms/iter  (K={K}, best-of-3)", flush=True)
    return out, best


def main():
    print("devices:", jax.devices(), flush=True)
    cfg, model, params = build_params()
    from mucon_tpu.harness.optim import create_optimizer

    partition = model.param_partition(params)
    tx = create_optimizer(cfg, partition)
    opt_state = tx.init(params)
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"params: {n} in {len(jax.tree.leaves(params))} leaves", flush=True)

    # fake grads: params scaled (nonzero, deterministic)
    grads = jax.tree.map(lambda p: p * 1e-3 + 1e-4, params)

    @jax.jit
    def tree_k(p, o, g):
        def body(carry, _):
            p, o = carry
            updates, o = tx.update(g, o, p)
            p = optax.apply_updates(p, updates)
            return (p, o), None
        (p, o), _ = jax.lax.scan(body, (p, o), jnp.arange(K))
        return p, o

    # ---- flat arm -------------------------------------------------------
    from jax.flatten_util import ravel_pytree

    flat0, unravel = ravel_pytree(params)
    # per-leaf label -> contiguous boolean masks are wasteful; instead order
    # is fixed by the pytree, so build one int8 label vector once.
    lab_tree = jax.tree.map(
        lambda p, l: jnp.full((p.size,), 0 if l == "encode" else 1, jnp.int8),
        params, partition)
    lab_vec = jnp.concatenate([x for x in jax.tree.leaves(lab_tree)])
    enc_mask = (lab_vec == 0).astype(jnp.float32)
    dec_mask = 1.0 - enc_mask

    lr = cfg.trainer.learning_rate
    wd = cfg.trainer.weight_decay
    mom = cfg.trainer.momentum
    max_norm = cfg.trainer.clip_grad_norm_value

    def flat_update(pv, mv, gv):
        ne = jnp.sqrt(jnp.sum((gv * enc_mask) ** 2))
        nd = jnp.sqrt(jnp.sum((gv * dec_mask) ** 2))
        fe = jnp.minimum(1.0, max_norm / jnp.maximum(ne, 1e-12))
        fd = jnp.minimum(1.0, max_norm / jnp.maximum(nd, 1e-12))
        gv = gv * (fe * enc_mask + fd * dec_mask)
        if wd:
            gv = gv + wd * pv
        if mom:
            mv = mom * mv + gv
            step = mv
        else:
            step = gv
        return pv - lr * step, mv

    gflat, _ = ravel_pytree(grads)

    @jax.jit
    def flat_k(pv, mv, gv):
        def body(carry, _):
            pv, mv = carry
            return flat_update(pv, mv, gv), None
        (pv, mv), _ = jax.lax.scan(body, (pv, mv), jnp.arange(K))
        return pv, mv

    # round-trip arm: state and params stay TREES (checkpoint-compatible);
    # ravel at the top of each update, unravel at the bottom.
    @jax.jit
    def flat_rt_k(p, m, g):
        def body(carry, _):
            p, m = carry
            pv, _ = ravel_pytree(p)
            mv, _ = ravel_pytree(m)
            gv, _ = ravel_pytree(g)
            pv, mv = flat_update(pv, mv, gv)
            return (unravel(pv), unravel(mv)), None
        (p, m), _ = jax.lax.scan(body, (p, m), jnp.arange(K))
        return p, m

    (p_t, o_t), t_tree = timed("tree", tree_k, params, opt_state, grads)
    mv0 = jnp.zeros_like(flat0)
    (p_f, m_f), t_flat = timed("flat_sgd", flat_k, flat0, mv0, gflat)
    mtree0 = jax.tree.map(jnp.zeros_like, params)
    (p_r, m_r), t_rt = timed("flat_rt", flat_rt_k, params, mtree0, grads)

    # correctness: one step of each must match
    u1, o1 = tx.update(grads, opt_state, params)
    p1 = optax.apply_updates(params, u1)
    p1v, _ = ravel_pytree(p1)
    p2v, _ = flat_update(flat0, mv0, gflat)
    err = float(jnp.max(jnp.abs(p1v - p2v)))
    print(f"one-step max|diff| tree vs flat: {err:.3e}")
    print(f"speedup flat: {t_tree / t_flat:.2f}x   flat_rt: {t_tree / t_rt:.2f}x")


if __name__ == "__main__":
    main()
