"""Decompose the end-to-end eval cost at bench scale (B=128).

The fused device program runs in ~12 ms (10.5k videos/s) but the bench
eval number is ~820-1020 videos/s (~126-156 ms per batch). Where do the
other ~115 ms go? Candidates:
  device : fused program compute (scalar-readback sync)
  d2h    : device_get of the full output tree over the ~100-250 MB/s
           axon tunnel (bps [B,K-1,30] i32 + y_argmax [B,T] i32 dominate)
  host   : the per-video Python traceback (_host_traceback) — builds a
           ~T-long Python list per video (262k appends per batch)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_eval_host_tpu.py
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

SMALL = bool(os.environ.get("BENCH_SMALL"))
B = 4 if SMALL else 128
T_MIN, T_MAX = (256, 512) if SMALL else (1500, 2100)
PAD = 512
M, D, N_TR = (6, 16, 4) if SMALL else (48, 2048, 6)
REPS = 2 if SMALL else 5


def best_of(fn, reps=REPS):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    print("devices:", jax.devices(), flush=True)
    from mucon_tpu.config import get_cfg_defaults
    from mucon_tpu.data.batching import collate_padded
    from mucon_tpu.data.general_dataset import Sample
    from mucon_tpu.data.utils import create_tf_input, create_tf_target
    from mucon_tpu.models import batch_to_arrays, create_model
    from mucon_tpu.ops.eval_fused import build_fused_eval
    from mucon_tpu.ops.viterbi import positions_to_results

    cfg = get_cfg_defaults()
    if SMALL:
        cfg.model.ft.stages = [1, 2, 4, 8]
        cfg.model.ft.pooling_layers = [0, 1, 2, 3]
        cfg.model.ft.hidden_size = 16
        cfg.model.ft.last_gn_num_groups = 4
        cfg.model.fs.encoder.hidden_size = 16
        cfg.model.fs.decoder.hidden_size = 16

    rng = np.random.RandomState(0)
    samples = []
    for i in range(B):
        T = int(rng.randint(T_MIN, T_MAX + 1))
        tr = rng.randint(0, M, size=N_TR).astype(np.int64)
        samples.append(Sample(
            feats=rng.randn(T, D).astype(np.float32),
            gt_label=rng.randint(0, M, size=T).astype(np.int64),
            transcript=tr,
            transcript_tf_input=create_tf_input(tr, sos_i=M + 1),
            transcript_tf_target=create_tf_target(tr, eos_i=M),
            video_name=f"ev{i}",
        ))
    batch = collate_padded(samples, n_max=30, pad_multiple=PAD)
    model = create_model(cfg, num_classes=M, max_decoding_steps=31,
                         input_feature_size=D)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    fs = 10 if SMALL else 30
    fused = build_fused_eval(
        model,
        teacher_forcing=False,
        frame_sampling=fs,
        use_pallas_viterbi=jax.default_backend() != "cpu",
    )
    arrays = jax.device_put(batch_to_arrays(batch))

    from mucon_tpu.ops.eval_fused import unpack_eval_wire

    def unpack(o):
        return unpack_eval_wire(o, n_steps_dim=31, n_max=30)

    out_dev = fused(params, arrays)  # compile
    float(jnp.sum(out_dev["wire"]))
    nbytes = {k: v.size * v.dtype.itemsize for k, v in out_dev.items()}
    print(f"output tree: {sum(nbytes.values())/1e6:.2f} MB "
          f"({ {k: round(v/1e3) for k, v in nbytes.items()} } KB)",
          flush=True)

    t_dev = best_of(lambda: float(jnp.sum(fused(params, arrays)["wire"])))

    def d2h():
        jax.block_until_ready(out_dev)  # already done; time transfer only
        jax.device_get(out_dev)
    t_d2h = best_of(d2h)

    out = unpack(jax.device_get(out_dev))

    def traceback_all():
        positions_to_results(
            batch.num_frames, out["transcripts"], out["n_dec"],
            out["vit_score"], out["vit_pos"], out["vit_k_valid"], fs,
        )
    t_host = best_of(traceback_all)

    def eval_once():
        o = unpack(jax.device_get(fused(params, arrays)))
        positions_to_results(
            batch.num_frames, o["transcripts"], o["n_dec"],
            o["vit_score"], o["vit_pos"], o["vit_k_valid"], fs,
        )
    t_all = best_of(eval_once)

    print(f"device (program, scalar sync): {t_dev:8.2f} ms", flush=True)
    print(f"d2h (full tree device_get)   : {t_d2h:8.2f} ms", flush=True)
    print(f"host traceback ({B} videos)  : {t_host:8.2f} ms", flush=True)
    print(f"end-to-end eval_once          : {t_all:8.2f} ms "
          f"({B/t_all*1e3:.0f} videos/s)", flush=True)


if __name__ == "__main__":
    main()
