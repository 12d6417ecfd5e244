"""Device-bound A/B: f32 vs bf16 eval feature wire in the fused program.

Round-5 xplane: the fused eval's in-projection reads the [128 x 2560 x
2048] f32 feature batch from HBM — 2.68 GB = 3.83 ms at ~85% of the HBM
roofline, the single biggest op of the 11.7 ms program.  A bf16-RESIDENT
eval batch halves that read; on TPU the result is numerics-IDENTICAL
(XLA's default matmul precision truncates f32 dot operands to bf16 MXU
passes anyway — scripts/probe_inproj_tpu.py, docs/ROOFLINE.md lever 9),
which this probe ASSERTS via output checksums before timing.

Interleaved chained device-bound rounds (scalar readback), best-of-5.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_eval_wire_dtype_tpu.py
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
N_CHAIN = 2 if SMALL else 16
TRIALS = 2 if SMALL else 5


def main():
    print("devices:", jax.devices(), f"B={B}", flush=True)
    from mucon_tpu.config import get_cfg_defaults
    from mucon_tpu.data.batching import collate_padded
    from mucon_tpu.data.general_dataset import Sample
    from mucon_tpu.data.utils import create_tf_input, create_tf_target
    from mucon_tpu.models import batch_to_arrays, create_model
    from mucon_tpu.ops.eval_fused import build_fused_eval

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
            video_name=f"v{i}",
        ))
    batch = collate_padded(samples, n_max=30, pad_multiple=PAD)

    cfg = get_cfg_defaults()
    if SMALL:
        cfg.model.ft.stages = [1, 2, 4]
        cfg.model.ft.pooling_layers = [0, 1]
    model = create_model(cfg, num_classes=M, max_decoding_steps=31,
                         input_feature_size=D)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    fused = build_fused_eval(
        model, teacher_forcing=False, frame_sampling=30,
        use_pallas_viterbi=jax.default_backend() != "cpu",
    )

    arms = {}
    for name, dt in (("f32-wire", None), ("bf16-wire", jnp.bfloat16)):
        arrays = jax.device_put(batch_to_arrays(batch, feats_dtype=dt))
        t0 = time.time()
        out = fused(params, arrays)
        chk = (float(jnp.sum(out["y_argmax"])),
               float(jnp.sum(out["wire"])))
        print(f"{name}: compiled+warm in {time.time()-t0:.0f}s "
              f"checksums {chk}", flush=True)
        arms[name] = (arrays, chk)

    chks = [c for _, c in arms.values()]
    if chks[0] == chks[1]:
        print("OUTPUTS IDENTICAL across wires (as predicted on TPU)")
    else:
        print(f"OUTPUTS DIFFER: {chks}")

    best = {n: float("inf") for n in arms}
    for trial in range(TRIALS):
        for n, (arrays, _) in arms.items():
            t0 = time.perf_counter()
            last = None
            for _ in range(N_CHAIN):
                last = fused(params, arrays)
            float(jnp.sum(last["wire"]))
            ms = (time.perf_counter() - t0) / N_CHAIN * 1e3
            best[n] = min(best[n], ms)
            print(f"trial {trial} {n}: {ms:8.3f} ms/batch", flush=True)

    print(f"\nBEST (interleaved best-of-{TRIALS}, device-bound):")
    for n, v in best.items():
        print(f"  {n}: {v:8.3f} ms/batch ({B / v * 1e3:6.0f} videos/s)")


if __name__ == "__main__":
    main()
