"""Measure the shard_map-vs-plain per-chip factor for the FUSED EVAL
program (the eval analog of probe_shardmap_overhead_tpu.py).

The timed-run v5e-8 projection divides eval wall clock by 8; this probe
measures the per-chip cost of the shard_map program structure itself on
a 1-device data-only mesh (manual partitioning + per-shard kernels +
wire pack), so the projection can carry a measured factor instead of an
assumed 1.0.  Device-only timing (chained dispatch, one scalar
readback); the host consume/d2h side is identical for both variants.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_eval_shard_factor_tpu.py
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

SMALL = bool(os.environ.get("BENCH_SMALL"))
B = int(os.environ.get("PROBE_B", "4" if SMALL else "128"))
T = int(os.environ.get("PROBE_T", "128" if SMALL else "2560"))
REPS = int(os.environ.get("PROBE_REPS", "2" if SMALL else "20"))
TRIALS = int(os.environ.get("PROBE_TRIALS", "2" if SMALL else "5"))
D, M = (16, 6) if SMALL else (2048, 48)


def main():
    from mucon_tpu.config import get_cfg_defaults
    from mucon_tpu.data import collate_padded
    from mucon_tpu.data.general_dataset import Sample
    from mucon_tpu.data.utils import create_tf_input, create_tf_target
    from mucon_tpu.models import batch_to_arrays, create_model
    from mucon_tpu.ops.eval_fused import build_fused_eval
    from mucon_tpu.parallel.mesh import make_mesh

    print(f"devices: {jax.devices()}")
    cfg = get_cfg_defaults()
    if SMALL:
        cfg.model.ft.stages = [1, 2, 4]
        cfg.model.ft.pooling_layers = [0, 1]
        cfg.model.ft.hidden_size = 16
        cfg.model.ft.last_gn_num_groups = 4
        cfg.model.fs.encoder.hidden_size = 16
        cfg.model.fs.decoder.hidden_size = 16
        cfg.tpu.use_pallas = True

    rng = np.random.RandomState(0)
    samples = []
    for i in range(B):
        t = int(rng.randint(3 * T // 4, T + 1))
        tr = rng.randint(0, M, size=6).astype(np.int64)
        samples.append(Sample(
            feats=rng.randn(t, D).astype(np.float32),
            gt_label=rng.randint(0, M, size=t).astype(np.int64),
            transcript=tr,
            transcript_tf_input=create_tf_input(tr, sos_i=M + 1),
            transcript_tf_target=create_tf_target(tr, eos_i=M),
            video_name=f"v{i}",
        ))
    batch = collate_padded(samples, n_max=30, pad_multiple=T)
    model = create_model(cfg, num_classes=M, max_decoding_steps=31,
                         input_feature_size=D)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    arrays = jax.device_put(batch_to_arrays(batch))

    pallas_vit = jax.default_backend() != "cpu"
    fs = 10 if SMALL else 30
    variants = {
        "plain": build_fused_eval(model, teacher_forcing=False,
                                  frame_sampling=fs,
                                  use_pallas_viterbi=pallas_vit),
        "shardmap": build_fused_eval(model, teacher_forcing=False,
                                     frame_sampling=fs,
                                     use_pallas_viterbi=pallas_vit,
                                     mesh=make_mesh(1, 1, 1)),
    }

    outs = {}
    for k, fn in variants.items():
        out = fn(params, arrays)
        jax.block_until_ready(out)
        outs[k] = {kk: np.asarray(v) for kk, v in out.items()}
        print(f"{k}: compiled")
    for kk in outs["plain"]:
        np.testing.assert_allclose(outs["plain"][kk], outs["shardmap"][kk],
                                   rtol=0, atol=0)
    print("outputs bitwise identical")

    times = {k: [] for k in variants}
    for _ in range(TRIALS):
        for k, fn in variants.items():
            t0 = time.perf_counter()
            out = None
            for _ in range(REPS):
                out = fn(params, arrays)
            # scalar readback of the last rep syncs the chain
            float(jnp.sum(out["wire"] if "wire" in out
                          else list(out.values())[0]))
            times[k].append((time.perf_counter() - t0) * 1e3 / REPS)
    for k, ts in times.items():
        print(f"{k}: best {min(ts):.3f} ms/batch  all "
              + " ".join(f"{t:.2f}" for t in ts))
    print(f"EVAL_SHARD_FACTOR={min(times['shardmap']) / min(times['plain']):.3f}")


if __name__ == "__main__":
    main()
