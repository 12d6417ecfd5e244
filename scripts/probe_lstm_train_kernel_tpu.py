"""Interleaved same-process A/B of tpu.use_pallas_lstm_train on the
full train step (roofline follow-up to the decoder-chain win).

Arms: the default BiLSTM train scan vs the custom-VJP fused recurrence
(ops/lstm_pallas.py bilstm_recurrence_train — fwd with cell-trajectory
stash, reverse (dh, dc) chain backward, w_hh grads contracted in XLA).
Everything else is the flagship default config (v3 encoder kernel,
decoder chain kernel, dropout .25).  Methodology per CLAUDE.md:
same-process interleaved trials, K-step chained programs,
scalar-readback sync, best-of-N.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_lstm_train_kernel_tpu.py
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

SMALL = bool(os.environ.get("BENCH_SMALL"))
K = 5 if SMALL else int(os.environ.get("PROBE_K", "30"))
TRIALS = int(os.environ.get("TRIALS", "5"))
B, T, D, M = (2, 128, 16, 6) if SMALL else (8, 2048, 2048, 48)
B = int(os.environ.get("PROBE_B", B))
T = int(os.environ.get("PROBE_T", T))
DROP = float(os.environ.get("PROBE_DROP", "0.25"))
ARMS = [("scan", False), ("pallas-lstm-train", True)]


def make_batch():
    from mucon_tpu.data import collate_padded
    from mucon_tpu.data.general_dataset import Sample
    from mucon_tpu.data.utils import create_tf_input, create_tf_target

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
    return collate_padded(samples, n_max=30, pad_multiple=T)


def build_step(use_lstm_train_kernel, batch):
    from mucon_tpu.config import get_cfg_defaults
    from mucon_tpu.models import create_model, batch_to_arrays
    from mucon_tpu.harness.optim import create_optimizer

    cfg = get_cfg_defaults()
    if SMALL:
        cfg.model.ft.stages = [1, 2, 4]
        cfg.model.ft.pooling_layers = [0, 1]
        cfg.model.ft.hidden_size = 16
        cfg.model.ft.last_gn_num_groups = 4
        cfg.model.fs.encoder.hidden_size = 16
        cfg.model.fs.decoder.hidden_size = 16
    cfg.tpu.use_pallas_lstm_train = use_lstm_train_kernel
    cfg.model.ft.dropout_rate = DROP
    cfg.model.ft.last_dropout_rate = DROP
    cfg.model.fs.decoder.embedding_dropout = DROP
    model = create_model(cfg, num_classes=M, max_decoding_steps=31,
                         input_feature_size=D)
    arrays = jax.device_put(batch_to_arrays(batch))
    params = model.init_params(jax.random.PRNGKey(0), batch)
    tx = create_optimizer(cfg, model.param_partition(params))
    opt_state = tx.init(params)

    def loss_main(p, arrays, rng):
        fwd = model.forward(p, arrays, rng=rng, train=True,
                            teacher_forcing=True)
        return model.loss(fwd, arrays, teacher_forcing=True).main

    @jax.jit
    def step_k_a(p, o, key, arrays):
        def body(carry, k):
            p, o = carry
            g = jax.grad(loss_main)(p, arrays, jax.random.fold_in(key, k))
            updates, o = tx.update(g, o, p)
            p = optax.apply_updates(p, updates)
            return (p, o), None
        (p, o), _ = jax.lax.scan(body, (p, o), jnp.arange(K))
        return p, o, jax.tree.leaves(p)[0].sum()

    def step_k(p, o, key):
        p, o, chk = step_k_a(p, o, key, arrays)
        float(chk)  # scalar readback = real completion over the tunnel
        return p, o

    # 10-step loss trajectory for a numerics sanity check between arms
    @jax.jit
    def loss_traj(p, key, arrays):
        def body(carry, k):
            p, = carry
            g = jax.grad(loss_main)(p, arrays, jax.random.fold_in(key, k))
            p = jax.tree.map(lambda a, b: a - 1e-3 * b, p, g)
            l = loss_main(p, arrays, jax.random.fold_in(key, 1000 + k))
            return (p,), l
        _, ls = jax.lax.scan(body, (p,), jnp.arange(10))
        return ls

    return step_k, params, opt_state, lambda p, key: loss_traj(p, key, arrays)


def main():
    print("devices:", jax.devices(), f"B={B} T={T} drop={DROP} K={K}",
          flush=True)
    import logging
    logging.basicConfig(level=logging.INFO)
    batch = make_batch()
    arms = {}
    for name, flag in ARMS:
        t0 = time.time()
        step_k, params, opt_state, traj = build_step(flag, batch)
        step_k(params, opt_state, jax.random.PRNGKey(7))
        print(f"{name}: compiled+warm in {time.time()-t0:.0f}s", flush=True)
        arms[name] = (step_k, params, opt_state, traj)

    best = {name: float("inf") for name, _ in ARMS}
    for trial in range(TRIALS):
        for name, _ in ARMS:
            step_k, params, opt_state, _ = arms[name]
            t0 = time.time()
            step_k(params, opt_state, jax.random.PRNGKey(7))
            ms = (time.time() - t0) / K * 1e3
            best[name] = min(best[name], ms)
            print(f"trial {trial} {name}: {ms:7.3f} ms/iter", flush=True)

    print("\nBEST (interleaved best-of-%d):" % TRIALS)
    for name, _ in ARMS:
        print(f"  {name}: {best[name]:7.3f} ms/iter")

    print("\nloss trajectories (10 SGD steps, same seed):")
    for name, _ in ARMS:
        _, params, _, traj = arms[name]
        ls = np.asarray(traj(params, jax.random.PRNGKey(11)))
        print(f"  {name}: {np.array2string(ls, precision=5)}", flush=True)


if __name__ == "__main__":
    main()
