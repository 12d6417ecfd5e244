"""Chained device-bound A/B: f32- vs bf16-resident cached features.

Round-5 xprof: the in-projection fwd (0.180 ms) and its dW contraction
(0.185 ms) both stream the 134 MB f32 feature batch from HBM and sit at
~90% of the HBM roofline — together ~19% of the 1.9 ms device-busy
step.  A bf16-RESIDENT cache halves those reads (~0.18 ms bound).
Session 17 measured this lever at <=2% WALL at K=30 — but the
chained-trace correction showed K=30 walls carry a ~0.8 ms/step
dispatch/readback constant that drowns a 0.15 ms effect.  This probe
re-runs the A/B the honest way: K=160 chained steps per call (readback
amortized to ~0.16 ms/step), interleaved best-of-5.

Numerics note: the bf16-resident path is loss-trajectory-IDENTICAL to
f32 on TPU (the in-projection truncates operands to bf16 MXU passes
either way — probe_inproj_tpu.py, docs/ROOFLINE.md lever 9).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_feats_resident_tpu.py
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

SMALL = bool(os.environ.get("BENCH_SMALL"))
K = 5 if SMALL else int(os.environ.get("PROBE_K", "160"))
TRIALS = 2 if SMALL else 5
B, T, D, M = (2, 128, 16, 6) if SMALL else (8, 2048, 2048, 48)
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


def build_arm(feats_dtype, batch):
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
    cfg.model.ft.dropout_rate = DROP
    cfg.model.ft.last_dropout_rate = DROP
    cfg.model.fs.decoder.embedding_dropout = DROP
    model = create_model(cfg, num_classes=M, max_decoding_steps=31,
                         input_feature_size=D)
    arrays = batch_to_arrays(batch, feats_dtype=feats_dtype)
    arrays = jax.device_put(arrays)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    tx = create_optimizer(cfg, model.param_partition(params))
    opt_state = tx.init(params)

    def loss_main(p, arrays, rng):
        fwd = model.forward(p, arrays, rng=rng, train=True,
                            teacher_forcing=True)
        return model.loss(fwd, arrays, teacher_forcing=True).main

    @jax.jit
    def step_k(p, o, key, arrays):
        def body(carry, k):
            p, o = carry
            g = jax.grad(loss_main)(p, arrays, jax.random.fold_in(key, k))
            updates, o = tx.update(g, o, p)
            return (optax.apply_updates(p, updates), o), None
        (p, o), _ = jax.lax.scan(body, (p, o), jnp.arange(K))
        return p, o, jax.tree.leaves(p)[0].sum()

    def run(p, o, key):
        p, o, chk = step_k(p, o, key, arrays)
        float(chk)  # scalar readback = real completion
        return p, o

    return run, params, opt_state


def main():
    print("devices:", jax.devices(), f"B={B} T={T} K={K}", flush=True)
    batch = make_batch()
    arms = {}
    for name, dt in (("f32-resident", None),
                     ("bf16-resident", jnp.bfloat16)):
        t0 = time.time()
        run, params, opt_state = build_arm(dt, batch)
        run(params, opt_state, jax.random.PRNGKey(7))
        print(f"{name}: compiled+warm in {time.time()-t0:.0f}s", flush=True)
        arms[name] = (run, params, opt_state)

    best = {n: float("inf") for n in arms}
    for trial in range(TRIALS):
        for n, (run, params, opt_state) in arms.items():
            t0 = time.perf_counter()
            run(params, opt_state, jax.random.PRNGKey(7))
            ms = (time.perf_counter() - t0) / K * 1e3
            best[n] = min(best[n], ms)
            print(f"trial {trial} {n}: {ms:7.3f} ms/step", flush=True)

    print(f"\nBEST (interleaved best-of-{TRIALS}, K={K} chained):")
    for n, v in best.items():
        print(f"  {n}: {v:7.3f} ms/step ({B / v * 1e3:6.0f} videos/s)")


if __name__ == "__main__":
    main()
