"""Interleaved same-process throughput comparison across batch sizes.

Cross-process runs today hinted at a non-monotonic optimum:
B=8 (Pallas path)   3.42 ms/step  = 0.428 ms/video
B=16 (Pallas path)  6.70 ms/step  = 0.419 ms/video
B=32 (XLA sliced)  11.11 ms/step  = 0.347 ms/video   <-- champion?
B=128 (XLA sliced) 51.04 ms/step  = 0.399 ms/video
but those numbers span hours on a rig with +-10% cross-process variance.
This probe compiles all requested batch sizes in ONE process and
interleaves trials, reporting ms/video, to pick bench.py's default B and
sanity-check the "auto" kernel routing crossover.

Usage: PYTHONPATH=/root/repo:/root/.axon_site BATCHES=8,32,128 \
           python -u scripts/probe_batch_throughput_tpu.py
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

SMALL = bool(os.environ.get("BENCH_SMALL"))
TRIALS = 5
BATCHES = [int(x) for x in os.environ.get("BATCHES", "8,32,128").split(",")]
T, D, M = (128, 16, 6) if SMALL else (2048, 2048, 48)
DROP = 0.25
# equal WORK per timed call across arms: ~K*B = const videos
VIDEOS_PER_CALL = int(os.environ.get("VIDEOS_PER_CALL", "16" if SMALL else "1280"))


def make_batch(B):
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


def build_step(B):
    from mucon_tpu.config import get_cfg_defaults
    from mucon_tpu.models import create_model, batch_to_arrays
    from mucon_tpu.harness.optim import create_optimizer

    K = max(1, VIDEOS_PER_CALL // B)
    batch = make_batch(B)
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

    def run(key):
        p, o, chk = step_k_a(params, opt_state, key, arrays)
        float(chk)  # scalar readback sync (block_until_ready lies here)

    return run, K


def main():
    print("devices:", jax.devices(), "batches:", BATCHES,
          f"~{VIDEOS_PER_CALL} videos/call", flush=True)
    arms = {}
    for B in BATCHES:
        t0 = time.time()
        run, K = build_step(B)
        run(jax.random.PRNGKey(7))
        print(f"B={B} (K={K}): compiled+warm in {time.time()-t0:.0f}s",
              flush=True)
        arms[B] = (run, K)

    best = {B: float("inf") for B in BATCHES}
    for trial in range(TRIALS):
        for B in BATCHES:
            run, K = arms[B]
            t0 = time.time()
            run(jax.random.PRNGKey(7))
            ms_video = (time.time() - t0) / (K * B) * 1e3
            best[B] = min(best[B], ms_video)
            print(f"trial {trial} B={B}: {ms_video:7.4f} ms/video "
                  f"({1e3 / ms_video:7.0f} videos/s)", flush=True)

    print("\nBEST (interleaved best-of-%d):" % TRIALS)
    for B in BATCHES:
        print(f"  B={B}: {best[B]:7.4f} ms/video "
              f"({1e3 / best[B]:7.0f} videos/s)")


if __name__ == "__main__":
    main()
