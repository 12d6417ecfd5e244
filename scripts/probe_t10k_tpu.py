"""Train + fused-eval measurement at >10k frames (VERDICT r2 #4).

SURVEY's north star names ">10k frames"; every hardware number so far is
T = 2048-2560.  This probe runs the flagship model at T_pad = 10240:

* TRAIN at B=8: both the XLA path and the forced sliced-kernel path
  (use_pallas_train=True) run interleaved.  MEASURED (v5e, 2026-08):
  XLA 17.44 ms/step vs sliced kernel 14.81 (1.18x) — which REVERSED the
  session-5 "slices lose to XLA" rule for SINGLE-video slices: "auto"
  now keeps the kernel when nb == B (one video per slice, only reachable
  at very long T) and still routes multi-video slices to XLA.
* EVAL at B=32: the sliced eval kernel stays on (2 videos per program);
  depth-3 pipelined like the evaluator/bench.

Reports videos/s AND frames/s (the honest unit at this length: one 10k
video is 5x the frames of a flagship-batch video).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_t10k_tpu.py
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

SMALL = bool(os.environ.get("BENCH_SMALL"))
B = int(os.environ.get("PROBE_B", "2" if SMALL else "8"))
EVAL_B = int(os.environ.get("PROBE_EVAL_B", "2" if SMALL else "32"))
T = int(os.environ.get("PROBE_T", "256" if SMALL else "10240"))
K = 2 if SMALL else int(os.environ.get("PROBE_K", "10"))
TRIALS = 2 if SMALL else int(os.environ.get("PROBE_TRIALS", "4"))
D, M = (16, 6) if SMALL else (2048, 48)


def make_batch(n, tag, rng):
    from mucon_tpu.data import collate_padded
    from mucon_tpu.data.general_dataset import Sample
    from mucon_tpu.data.utils import create_tf_input, create_tf_target

    samples = []
    for i in range(n):
        t = int(rng.randint(4 * T // 5, T + 1))
        tr = rng.randint(0, M, size=8).astype(np.int64)
        samples.append(Sample(
            feats=rng.randn(t, D).astype(np.float32),
            gt_label=rng.randint(0, M, size=t).astype(np.int64),
            transcript=tr,
            transcript_tf_input=create_tf_input(tr, sos_i=M + 1),
            transcript_tf_target=create_tf_target(tr, eos_i=M),
            video_name=f"{tag}{i}",
        ))
    return collate_padded(samples, n_max=30, pad_multiple=T)


def main():
    from functools import partial

    from mucon_tpu.config import get_cfg_defaults
    from mucon_tpu.harness.optim import create_optimizer
    from mucon_tpu.models import batch_to_arrays, create_model

    import logging

    logging.basicConfig(level=logging.INFO)  # show kernel-routing lines

    print(f"devices: {jax.devices()}")
    rng = np.random.RandomState(0)

    def build(pallas_train):
        cfg = get_cfg_defaults()
        if SMALL:
            cfg.model.ft.stages = [1, 2, 4]
            cfg.model.ft.pooling_layers = [0, 1]
            cfg.model.ft.hidden_size = 16
            cfg.model.ft.last_gn_num_groups = 4
            cfg.model.fs.encoder.hidden_size = 16
            cfg.model.fs.decoder.hidden_size = 16
        if pallas_train is not None:
            cfg.tpu.use_pallas_train = pallas_train
        return create_model(cfg, num_classes=M, max_decoding_steps=31,
                            input_feature_size=D)

    batch = make_batch(B, "tr", rng)
    model = build(None)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    tx = create_optimizer(cfg := model.cfg, model.param_partition(params))

    def k_steps(mdl):
        @partial(jax.jit, donate_argnums=(0, 1))
        def run(p, o, key, arrays):
            def body(carry, k):
                p, o = carry

                def loss_fn(q):
                    fwd = mdl.forward(q, arrays, rng=k, train=True,
                                      teacher_forcing=True)
                    return mdl.loss(fwd, arrays, teacher_forcing=True).main

                loss, g = jax.value_and_grad(loss_fn)(p)
                updates, o = tx.update(g, o, p)
                return (optax.apply_updates(p, updates), o), loss

            keys = jax.random.split(key, K)
            (p, o), losses = jax.lax.scan(body, (p, o), keys)
            return p, o, losses[-1]

        return run

    variants = {
        "train_auto(xla)": k_steps(model),
        "train_forced_pallas_slices": k_steps(build(True)),
    }
    arrays = jax.device_put(batch_to_arrays(batch))
    states = {
        k: (jax.tree.map(jnp.array, params),
            tx.init(jax.tree.map(jnp.array, params)))
        for k in variants
    }
    key = jax.random.PRNGKey(1)
    for k, fn in variants.items():
        p, o, loss = fn(*states[k], key, arrays)
        print(f"{k}: compiled, loss {float(loss):.4f}")
        states[k] = (p, o)

    frames = float(np.sum(np.asarray(batch.num_frames)))
    times = {k: [] for k in variants}
    for _ in range(TRIALS):
        for k, fn in variants.items():
            key, kk = jax.random.split(key)
            t0 = time.perf_counter()
            p, o, loss = fn(*states[k], kk, arrays)
            float(loss)  # scalar readback
            times[k].append((time.perf_counter() - t0) / K)
            states[k] = (p, o)
    for k, ts in times.items():
        dt = min(ts)
        print(f"{k}: best {dt*1e3:.2f} ms/step = {B/dt:.1f} videos/s "
              f"= {frames/dt/1e6:.2f} Mframes/s")

    # ---- fused eval at T=10k ----
    from collections import deque

    from mucon_tpu.ops.eval_fused import build_fused_eval, unpack_eval_wire
    from mucon_tpu.ops.viterbi import positions_to_results

    eval_batch = make_batch(EVAL_B, "ev", rng)
    eval_arrays = jax.device_put(batch_to_arrays(eval_batch))
    fused = build_fused_eval(
        model, teacher_forcing=False, frame_sampling=30,
        use_pallas_viterbi=jax.default_backend() != "cpu",
    )

    def consume(out):
        out = unpack_eval_wire(
            jax.device_get(out), n_steps_dim=model.max_decoding_steps,
            n_max=eval_batch.transcript.shape[1],
            num_frames=eval_batch.num_frames,
            t_full=int(eval_batch.feats.shape[1]),
        )
        positions_to_results(
            eval_batch.num_frames, out["transcripts"], out["n_dec"],
            out["vit_score"], out["vit_pos"], out["vit_k_valid"], 30,
        )

    consume(fused(params, eval_arrays))  # compile
    reps = 2 if SMALL else 6
    eframes = float(np.sum(np.asarray(eval_batch.num_frames)))
    best = float("inf")
    for _ in range(TRIALS):
        pending = deque()
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fused(params, eval_arrays)
            for leaf in jax.tree.leaves(out):
                leaf.copy_to_host_async()
            pending.append(out)
            if len(pending) > 2:
                consume(pending.popleft())
        while pending:
            consume(pending.popleft())
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"eval fused B={EVAL_B}: best {best*1e3:.2f} ms/batch = "
          f"{EVAL_B/best:.1f} videos/s = {eframes/best/1e6:.2f} Mframes/s")


if __name__ == "__main__":
    main()
