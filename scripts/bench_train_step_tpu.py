"""Full train-step validation of tpu.use_pallas_train on real TPU.

Runs the FLAGSHIP train step (full WaveNet encoder + BiLSTM/attention
decoder + all 4 losses + partitioned clip + SGD) at B=8, T=2048 twice —
XLA encoder vs the v2 trainable pallas stack — and reports:

  * per-step time, pipelined (steps chained by param donation, one sync):
    the number that matches training throughput, free of tunnel latency
  * loss trajectories over N steps from identical init with dropout OFF
    (deterministic -> must match within f32 accumulation tolerance)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_train_step_tpu.py
"""

import os
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax

SMALL = bool(os.environ.get("BENCH_SMALL"))
N_STEPS_TIME = 5 if SMALL else 30
N_STEPS_CURVE = 4 if SMALL else 10
B, T, D, M = (2, 128, 16, 6) if SMALL else (8, 2048, 2048, 48)
# shape overrides (e.g. BENCH_B=64 BENCH_T=1024 probes the timed-run
# bucket that drives the batch-sliced kernel path)
B = int(os.environ.get("BENCH_B", B))
T = int(os.environ.get("BENCH_T", T))


def build(use_pallas_train: bool, dropout: float, dtype: str = "float32"):
    from mucon_tpu.config import get_cfg_defaults
    from mucon_tpu.models import create_model

    cfg = get_cfg_defaults()
    cfg.tpu.compute_dtype = dtype
    cfg.tpu.train_sweep_chunks = int(os.environ.get("SWEEP_CHUNKS", "3"))
    if SMALL:
        cfg.model.ft.stages = [1, 2, 4]
        cfg.model.ft.pooling_layers = [0, 1]
        cfg.model.ft.hidden_size = 16
        cfg.model.ft.last_gn_num_groups = 4
        cfg.model.fs.encoder.hidden_size = 16
        cfg.model.fs.decoder.hidden_size = 16
    cfg.tpu.use_pallas = use_pallas_train
    cfg.tpu.use_pallas_train = use_pallas_train
    cfg.model.ft.dropout_rate = dropout
    cfg.model.ft.last_dropout_rate = dropout
    cfg.model.fs.decoder.embedding_dropout = dropout
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


def make_step(model, tx):
    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, rng, arrays):
        def loss_fn(p):
            fwd = model.forward(p, arrays, rng=rng, train=True, teacher_forcing=True)
            loss = model.loss(fwd, arrays, teacher_forcing=True)
            return loss.main, loss

        grads, loss = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def run(label, use_pallas_train, dropout, batch, arrays, n_time, n_curve,
        dtype="float32"):
    from mucon_tpu.harness.optim import create_optimizer

    cfg, model = build(use_pallas_train, dropout, dtype)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    tx = create_optimizer(cfg, model.param_partition(params))
    opt_state = tx.init(params)
    step = make_step(model, tx)

    t0 = time.time()
    params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(1), arrays)
    first = float(loss.main)
    print(f"{label}: compile+first {time.time()-t0:.1f}s loss0={first:.5f}",
          flush=True)

    curve = [first]
    for k in range(1, n_curve):
        params, opt_state, loss = step(
            params, opt_state, jax.random.PRNGKey(1 + k), arrays
        )
        curve.append(float(loss.main))
    print(f"{label}: curve {['%.5f' % c for c in curve]}", flush=True)

    # pipelined timing: chain steps, one readback at the end; best of 3
    # trials (single trials on this rig swing 2x with service load)
    best = float("inf")
    final = None
    for rep in range(3):
        t0 = time.time()
        for k in range(n_time):
            params, opt_state, loss = step(
                params, opt_state, jax.random.PRNGKey(100 + k), arrays
            )
        final = float(loss.main)  # forces the whole chain
        best = min(best, (time.time() - t0) / n_time * 1e3)
    dt = best
    print(f"{label}: {dt:.2f} ms/step pipelined best-of-3 "
          f"({B} videos -> {B/dt*1e3:.0f} videos/s), final loss {final:.5f}",
          flush=True)
    return curve, dt


ARMS = {
    "xla0": ("XLA[drop=0]", False, 0.0, "float32"),
    "pallas0": ("pallas[drop=0]", True, 0.0, "float32"),
    "xla25": ("XLA[drop=.25]", False, 0.25, "float32"),
    "pallas25": ("pallas[drop=.25]", True, 0.25, "float32"),
    "bf16": ("XLA-bf16[drop=.25]", False, 0.25, "bfloat16"),
    "bf16_0": ("XLA-bf16[drop=0]", False, 0.0, "bfloat16"),
    "pallas0_bf16": ("pallas-bf16[drop=0]", True, 0.0, "bfloat16"),
    "pallas25_bf16": ("pallas-bf16[drop=.25]", True, 0.25, "bfloat16"),
}


def main():
    import sys

    names = sys.argv[1:] or ["xla0", "pallas0", "xla25", "pallas25", "bf16"]
    print("devices:", jax.devices(), flush=True)
    batch, arrays = make_batch()
    arrays = jax.device_put(arrays)

    results = {}
    for name in names:
        label, use_pt, drop, dtype = ARMS[name]
        n_curve = N_STEPS_CURVE if drop == 0.0 else 3
        try:
            results[name] = run(label, use_pt, drop, batch, arrays,
                                N_STEPS_TIME, n_curve, dtype)
        except Exception as e:
            print(f"{label} FAILED: {type(e).__name__}: {str(e)[:3000]}",
                  flush=True)

    if "xla0" in results and "pallas0" in results:
        (cx, tx_ms), (cp, tp_ms) = results["xla0"], results["pallas0"]
        dmax = max(abs(a - b) for a, b in zip(cx, cp))
        print(f"curve max |diff| {dmax:.2e} over {len(cx)} steps "
              f"(f32-accum tolerance ~1e-3)", flush=True)
        print(f"SPEED drop=0: pallas {tp_ms:.2f} vs XLA {tx_ms:.2f} ms/step "
              f"-> {tx_ms/tp_ms:.2f}x", flush=True)
    if "xla25" in results and "pallas25" in results:
        tx2, tp2 = results["xla25"][1], results["pallas25"][1]
        print(f"SPEED drop=.25: pallas {tp2:.2f} vs XLA {tx2:.2f} ms/step "
              f"-> {tx2/tp2:.2f}x", flush=True)
    if "bf16" in results and "xla25" in results:
        cb, tb = results["bf16"]
        tx2 = results["xla25"][1]
        print(f"SPEED bf16: {tb:.2f} vs f32 XLA {tx2:.2f} ms/step "
              f"-> {tx2/tb:.2f}x (loss sanity: {['%.4f' % c for c in cb]})",
              flush=True)
    if "pallas0_bf16" in results and "pallas0" in results:
        tpb = results["pallas0_bf16"][1]
        tpf = results["pallas0"][1]
        print(f"SPEED pallas bf16 vs f32 (drop=0): {tpb:.2f} vs {tpf:.2f} "
              f"ms/step -> {tpf/tpb:.2f}x", flush=True)
        if "xla0" in results:
            print(f"COMPOUND pallas-bf16 vs XLA-f32 (drop=0): "
                  f"{results['xla0'][1]/tpb:.2f}x", flush=True)


if __name__ == "__main__":
    main()
