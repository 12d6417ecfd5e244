"""A/B of the fused eval program: sliced-pallas stack vs XLA stack at
bench shapes (B=128, T=2048).  Decides whether "auto" use_pallas keeps
the batch-sliced eval kernel (wavenet_pallas_v2_sliced) at large B or
routes to XLA like the train path does.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_eval_sliced_ab_tpu.py
"""

import os
import sys
import time
from functools import partial

import numpy as np

SMALL = bool(os.environ.get("BENCH_SMALL"))
B = int(sys.argv[1]) if len(sys.argv) > 1 else (4 if SMALL else 128)
T, D, M = (128, 16, 6) if SMALL else (2048, 2048, 48)
if len(sys.argv) > 2:  # optional Tpad override (e.g. 2560 = bench shapes)
    T = int(sys.argv[2])
K = 3 if SMALL else 10


def main():
    import jax
    import jax.numpy as jnp

    from mucon_tpu.config import get_cfg_defaults
    from mucon_tpu.models import create_model
    from mucon_tpu.models.model import batch_to_arrays
    from mucon_tpu.ops.eval_fused import build_fused_eval
    import scripts.bench_train_step_tpu as btst

    btst.B, btst.T, btst.D, btst.M = B, T, D, M
    print(f"devices: {jax.devices()}  B={B} T={T}", flush=True)

    batch, _ = btst.make_batch()

    res = {}
    for label, use_pallas in [("xla", False), ("pallas-sliced", True)]:
        cfg = get_cfg_defaults()
        if SMALL:
            cfg.model.ft.stages = [1, 2, 4]
            cfg.model.ft.pooling_layers = [0, 1]
            cfg.model.ft.hidden_size = 16
            cfg.model.ft.last_gn_num_groups = 4
            cfg.model.fs.encoder.hidden_size = 16
            cfg.model.fs.decoder.hidden_size = 16
        cfg.tpu.use_pallas = use_pallas
        model = create_model(cfg, num_classes=M, max_decoding_steps=31,
                             input_feature_size=D)
        arrays = jax.device_put(batch_to_arrays(batch))
        params = jax.device_put(model.init_params(jax.random.PRNGKey(0), batch))
        fused = build_fused_eval(model, teacher_forcing=False,
                                 frame_sampling=10 if SMALL else 30,
                                 max_len=400 if SMALL else 2000)
        t0 = time.time()
        out = fused(params, arrays)
        s0 = float(jnp.sum(out['y_argmax']))
        print(f"{label}: compile+first {time.time()-t0:.1f}s", flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            for _ in range(K):
                out = fused(params, arrays)
            sK = float(jnp.sum(out['y_argmax']))
            best = min(best, (time.time() - t0) / K * 1e3)
        res[label] = (best, s0)
        print(f"{label}: {best:.2f} ms/eval-batch best-of-3 "
              f"({B/best*1e3:.0f} videos/s) checksum={s0:.3f}", flush=True)

    if len(res) == 2:
        tx, sx = res["xla"]
        tp, sp = res["pallas-sliced"]
        print(f"A/B: pallas-sliced {tp:.2f} vs XLA {tx:.2f} ms -> "
              f"{tx/tp:.2f}x; checksum diff {abs(sx-sp):.2e}", flush=True)


if __name__ == "__main__":
    main()
