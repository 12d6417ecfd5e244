"""Interleaved same-process A/B of tpu.scan_unroll on the full train step.

profile_step_components_tpu.py runs showed full_step 3.65 (u1) / 3.60 (u4)
/ 3.40 ms (u8) but enc_fwd — an IDENTICAL program across runs — drifted
1.32->1.62 ms, i.e. cross-process variance on this rig is +-10%.  This
probe compiles both unroll variants in ONE process and interleaves trials
so they see the same environment.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_unroll_ab_tpu.py
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

SMALL = bool(os.environ.get("BENCH_SMALL"))
K = 5 if SMALL else int(os.environ.get("PROBE_K", "30"))
TRIALS = 5
UNROLLS = [int(x) for x in os.environ.get("UNROLLS", "1,8").split(",")]
B, T, D, M = (2, 128, 16, 6) if SMALL else (8, 2048, 2048, 48)
B = int(os.environ.get("PROBE_B", B))
T = int(os.environ.get("PROBE_T", T))
DROP = 0.25


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


def build_step(unroll, batch):
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
    cfg.tpu.scan_unroll = unroll
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

    # arrays passed as an ARGUMENT (closing over them embeds the 2 GB
    # feature batch as a captured compile-time constant at B=128).
    # A checksum scalar is returned for timing: sync MUST be a scalar
    # READBACK — block_until_ready on the output tree returns early over
    # the axon tunnel (it clocked a B=128 full step at 0.14 ms/iter,
    # i.e. dispatch only).
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
        float(chk)  # scalar readback = real completion
        return p, o

    return step_k, params, opt_state


def main():
    print("devices:", jax.devices(), "unrolls:", UNROLLS, flush=True)
    batch = make_batch()
    arms = {}
    for u in UNROLLS:
        t0 = time.time()
        step_k, params, opt_state = build_step(u, batch)
        step_k(params, opt_state, jax.random.PRNGKey(7))
        print(f"u={u}: compiled+warm in {time.time()-t0:.0f}s", flush=True)
        arms[u] = (step_k, params, opt_state)

    best = {u: float("inf") for u in UNROLLS}
    for trial in range(TRIALS):
        for u in UNROLLS:
            step_k, params, opt_state = arms[u]
            t0 = time.time()
            step_k(params, opt_state, jax.random.PRNGKey(7))
            ms = (time.time() - t0) / K * 1e3
            best[u] = min(best[u], ms)
            print(f"trial {trial} u={u}: {ms:7.3f} ms/iter", flush=True)

    print("\nBEST (interleaved best-of-%d):" % TRIALS)
    for u in UNROLLS:
        print(f"  unroll={u}: {best[u]:7.3f} ms/iter")


if __name__ == "__main__":
    main()
