"""Op-level xplane decomposition of the FUSED EVAL program on v5e.

The round-5 bench pins the eval program at ~14.3 ms/batch device-bound
(B=128, Tpad=2560).  This traces N chained dispatches (the queue keeps
the device back-to-back, like bench's device-bound loop) and parses the
device plane per-op — where the 14 ms goes: encoder kernel slices,
free-decode scan, Poisson prep, Viterbi DP, head, packing.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_eval_xplane_tpu.py
Env: PROFILE_DIR (default /tmp/xplane_eval), PROBE_N batches (8).
"""

import glob
import os
import time
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

SMALL = bool(os.environ.get("BENCH_SMALL"))
N = 2 if SMALL else int(os.environ.get("PROBE_N", "8"))
B = 4 if SMALL else 128
T_MIN, T_MAX = (256, 512) if SMALL else (1500, 2100)
PAD = 512
M, D, N_TR = (6, 16, 4) if SMALL else (48, 2048, 6)
OUT = os.environ.get("PROFILE_DIR", "/tmp/xplane_eval")


def main():
    print("devices:", jax.devices(), f"B={B} N={N}", flush=True)
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

    fused = build_fused_eval(
        model, teacher_forcing=False, frame_sampling=30,
        use_pallas_viterbi=jax.default_backend() != "cpu",
    )
    t0 = time.time()
    out = fused(params, arrays)
    float(jnp.sum(out["wire"]))
    print(f"compiled+warm in {time.time()-t0:.0f}s", flush=True)

    os.makedirs(OUT, exist_ok=True)
    with jax.profiler.trace(OUT):
        last = None
        for _ in range(N):
            last = fused(params, arrays)
        float(jnp.sum(last["wire"]))
    print("trace captured", flush=True)
    summarize(OUT)


def summarize(logdir, top=35):
    from jax.profiler import ProfileData

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("NO xplane.pb under", logdir)
        return
    path = max(paths, key=os.path.getmtime)
    print("parsing", path, flush=True)
    data = ProfileData.from_file(path)
    for plane in data.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            by_op = defaultdict(float)
            n_ev = defaultdict(int)
            for ev in line.events:
                by_op[ev.name] += ev.duration_ns / 1e6
                n_ev[ev.name] += 1
            tot = sum(by_op.values())
            print(f"XLA Ops: {tot:.1f} ms over {N} batches = "
                  f"{tot/N:.3f} ms/batch, {len(by_op)} distinct ops")
            for name, ms in sorted(by_op.items(), key=lambda kv: -kv[1])[:top]:
                print(f"  {ms/N:8.4f} ms/batch x{n_ev[name]//N:4d}  "
                      f"{name[:130]}")


if __name__ == "__main__":
    main()
