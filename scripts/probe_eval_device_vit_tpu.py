"""Device-bound fused-eval rate at the bench shape with the batched
Viterbi DP kernel routed (round-5 follow-up to the 10.43 ms/batch ladder).

Replicates bench.py's eval_device_round exactly: chained dispatches, ONE
scalar readback, warmup round + 4 timed rounds, median reported.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_eval_device_vit_tpu.py
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

SMALL = bool(os.environ.get("BENCH_SMALL"))
M, D = 48, 2048
EVAL_B = 4 if SMALL else 128
T_MIN, T_MAX = (256, 512) if SMALL else (1500, 2100)
PAD = 512
N_TR = 6
REPS = 2 if SMALL else 16
ROUNDS = 1 if SMALL else 4


def main():
    from mucon_tpu.config import get_cfg_defaults
    from mucon_tpu.data.batching import collate_padded
    from mucon_tpu.data.general_dataset import Sample
    from mucon_tpu.data.utils import create_tf_input, create_tf_target
    from mucon_tpu.models import batch_to_arrays, create_model
    from mucon_tpu.models.model import resolve_eval_feats_dtype
    from mucon_tpu.ops.eval_fused import build_fused_eval

    print("devices:", jax.devices(), flush=True)
    cfg = get_cfg_defaults()
    if SMALL:
        cfg.model.ft.stages = [1, 2, 4, 8]
        cfg.model.ft.pooling_layers = [0, 1, 2, 3]

    rng = np.random.RandomState(0)
    samples = []
    for i in range(EVAL_B):
        T = int(rng.randint(T_MIN, T_MAX + 1))
        tr = rng.randint(0, M, size=N_TR).astype(np.int64)
        samples.append(Sample(
            feats=rng.randn(T, D).astype(np.float32),
            gt_label=rng.randint(0, M, size=T).astype(np.int64),
            transcript=tr,
            transcript_tf_input=create_tf_input(tr, sos_i=M + 1),
            transcript_tf_target=create_tf_target(tr, eos_i=M),
            video_name=f"ev_{i}",
        ))
    batch = collate_padded(samples, n_max=30, pad_multiple=PAD)
    model = create_model(cfg, num_classes=M, max_decoding_steps=31,
                         input_feature_size=D)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    arrays = batch_to_arrays(batch, feats_dtype=resolve_eval_feats_dtype(cfg))
    fused = build_fused_eval(
        model, teacher_forcing=False, frame_sampling=30,
        use_pallas_viterbi=jax.default_backend() != "cpu",
    )

    def device_round(n):
        t0 = time.perf_counter()
        last = None
        for _ in range(n):
            last = fused(params, arrays)
        float(jnp.sum(jax.tree.leaves(last)[0]))  # scalar readback
        return (time.perf_counter() - t0) / n * 1e3

    t0 = time.time()
    device_round(1)  # compile
    print(f"compiled in {time.time()-t0:.0f}s "
          f"(Tpad={batch.feats.shape[1]})", flush=True)
    device_round(REPS)  # warmup, untimed
    all_ms = []
    for r in range(ROUNDS):
        ms = device_round(REPS)
        all_ms.append(ms)
        print(f"round {r}: {ms:6.2f} ms/batch "
              f"({EVAL_B/ms*1e3:7.0f} videos/s)", flush=True)
    med = float(np.median(all_ms))
    print(f"\nmedian {med:.2f} ms/batch = {EVAL_B/med*1e3:.0f} videos/s "
          f"(best {min(all_ms):.2f})")


if __name__ == "__main__":
    main()
