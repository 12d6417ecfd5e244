"""Interleaved same-process A/B of the in-projection operand dtype on
the full flagship train step (roofline follow-up: the 2048->128 input
projection is 50% of forward FLOPs — 8.6 GFLOP fwd + 8.6 GFLOP wgrad —
and reads the [B*T x 2048] feature block from HBM in BOTH passes; bf16
operands halve the MXU time AND the feature bytes, f32 accumulation
keeps the output exact to ~1e-3 relative).

Arms (feats residency x tpu.in_proj_mm_dtype):
  f32res/f32mm    — current default (baseline)
  bf16res/bf16mm  — bf16-RESIDENT feats (as a bf16 feature wire caches
                    them) + bf16 matmul operands: no cast pass at all
  f32res/bf16mm   — f32-resident feats, in-graph cast to bf16 (isolates
                    whether the cast pass eats the MXU/HBM saving)
  bf16res/f32mm   — what a bf16/f16 wire pays TODAY with f32 compute:
                    in-graph upcast feeding the f32 matmul

Everything else is the flagship default config (v3 encoder kernel,
decoder + BiLSTM chain kernels, dropout .25).  Methodology per
CLAUDE.md: same-process interleaved trials, K-step chained programs,
scalar-readback sync, best-of-N.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_inproj_tpu.py
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
# (name, feats resident dtype, tpu.in_proj_mm_dtype)
ARMS = [
    ("f32res/f32mm", np.float32, "auto"),
    ("bf16res/bf16mm", jnp.bfloat16, "bfloat16"),
    ("f32res/bf16mm", np.float32, "bfloat16"),
    ("bf16res/f32mm", jnp.bfloat16, "auto"),
]


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


def build_step(feats_dtype, inproj_mm, batch):
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
    cfg.tpu.in_proj_mm_dtype = inproj_mm
    cfg.model.ft.dropout_rate = DROP
    cfg.model.ft.last_dropout_rate = DROP
    cfg.model.fs.decoder.embedding_dropout = DROP
    model = create_model(cfg, num_classes=M, max_decoding_steps=31,
                         input_feature_size=D)
    arrays = batch_to_arrays(batch)
    arrays["feats"] = jnp.asarray(arrays["feats"]).astype(feats_dtype)
    arrays = jax.device_put(arrays)
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
    for name, fdt, mm in ARMS:
        t0 = time.time()
        step_k, params, opt_state, traj = build_step(fdt, mm, batch)
        step_k(params, opt_state, jax.random.PRNGKey(7))
        print(f"{name}: compiled+warm in {time.time()-t0:.0f}s", flush=True)
        arms[name] = (step_k, params, opt_state, traj)

    best = {name: float("inf") for name, _, _ in ARMS}
    for trial in range(TRIALS):
        for name, _, _ in ARMS:
            step_k, params, opt_state, _ = arms[name]
            t0 = time.time()
            step_k(params, opt_state, jax.random.PRNGKey(7))
            ms = (time.time() - t0) / K * 1e3
            best[name] = min(best[name], ms)
            print(f"trial {trial} {name}: {ms:7.3f} ms/iter", flush=True)

    print("\nBEST (interleaved best-of-%d):" % TRIALS)
    for name, _, _ in ARMS:
        print(f"  {name}: {best[name]:7.3f} ms/iter")

    print("\nloss trajectories (10 SGD steps, same seed):")
    for name, _, _ in ARMS:
        _, params, _, traj = arms[name]
        ls = np.asarray(traj(params, jax.random.PRNGKey(11)))
        print(f"  {name}: {np.array2string(ls, precision=5)}", flush=True)


if __name__ == "__main__":
    main()
