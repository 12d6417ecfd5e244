"""Interleaved A/B: framewise-head order inside the FUSED EVAL program.

The train-step A/B of conv-before-upsample was a wash at B=8 (the head
branch overlaps the sequential decoder/BiLSTM chains — the step is
critical-path bound, docs/ROOFLINE.md round 5).  The eval program is a
different regime: B=128, Tpad=2560, device-bound at ~15.5 ms/batch, and
its head upsample gathers [128 x 160 x 128] -> [128 x 2560 x 128]
features per batch.  Conv-first shrinks that to 48 channels.

Both arms compile in one process via mucon.models.mucon._UPSAMPLE_BEFORE_HEAD;
timing is the chained-dispatch + scalar-readback device-bound loop
(immune to d2h tunnel health).  Checksum equality of y_argmax is
asserted (the orders are bitwise-identical in forward).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_head_order_eval_tpu.py
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

SMALL = bool(os.environ.get("BENCH_SMALL"))
B = 4 if SMALL else int(os.environ.get("PROBE_B", "128"))
T_MIN, T_MAX = (256, 512) if SMALL else (1500, 2100)
PAD = 512
M, D, N_TR = (6, 16, 4) if SMALL else (48, 2048, 6)
N_CHAIN = 2 if SMALL else 16
TRIALS = 2 if SMALL else 5


def main():
    print("devices:", jax.devices(), f"B={B}", flush=True)
    import mucon_tpu.models.mucon as mucon_mod
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
    arrays = jax.device_put(batch_to_arrays(batch))

    use_pallas = jax.default_backend() != "cpu"
    arms = {}
    for name, upfirst in (("conv-first (fast)", False),
                          ("upsample-first (ref)", True)):
        mucon_mod._UPSAMPLE_BEFORE_HEAD = upfirst
        try:
            fused = build_fused_eval(
                model, teacher_forcing=False, frame_sampling=30,
                use_pallas_viterbi=use_pallas,
            )
            t0 = time.time()
            out = fused(params, arrays)
            chk = float(jnp.sum(out["y_argmax"]))
        finally:
            mucon_mod._UPSAMPLE_BEFORE_HEAD = False
        print(f"{name}: compiled+warm in {time.time()-t0:.0f}s "
              f"y_argmax checksum {chk}", flush=True)
        arms[name] = (fused, chk)

    chks = [c for _, c in arms.values()]
    assert chks[0] == chks[1], f"head orders disagree: {chks}"

    best = {n: float("inf") for n in arms}
    for trial in range(TRIALS):
        for n, (fused, _) in arms.items():
            t0 = time.perf_counter()
            last = None
            for _ in range(N_CHAIN):
                last = fused(params, arrays)
            float(jnp.sum(last["wire"]))  # scalar readback
            ms = (time.perf_counter() - t0) / N_CHAIN * 1e3
            best[n] = min(best[n], ms)
            print(f"trial {trial} {n}: {ms:8.3f} ms/batch", flush=True)

    print(f"\nBEST (interleaved best-of-{TRIALS}, device-bound):")
    for n, v in best.items():
        print(f"  {n}: {v:8.3f} ms/batch ({B / v * 1e3:6.0f} videos/s)")


if __name__ == "__main__":
    main()
