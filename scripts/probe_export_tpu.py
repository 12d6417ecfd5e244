"""Validate the StableHLO serving export ON TPU HARDWARE (VERDICT r3 #7).

test_export.py proves the artifact round-trips bitwise on CPU; this probe
holds the export to the same measured-on-hw bar as the kernels:

  1. `export` mode: build the flagship-shaped model (48 classes, 2048-d
     features — the Breakfast geometry the reference serves via its
     resume-eval path, reference src/test_mucon.py:20-83), export the
     fused inference program at a frozen (B, pad_to) shape.
  2. `serve` mode: a FRESH process that imports ONLY
     mucon_tpu.serving.load_exported — no model code, no config system —
     deserializes the artifact on the TPU and times `predict` over
     fixture videos (ms/video; predict's device_get is a host readback,
     so the timing is trustworthy over the axon tunnel).

Run (real TPU, axon env untouched):
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_export_tpu.py export
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_export_tpu.py serve

Results land in docs/EVAL_PROFILE.md ("serving export on hw" row).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

OUT_DEFAULT = "/tmp/export_probe_artifact"


def do_export(args):
    import jax

    from mucon_tpu.config import get_cfg_defaults
    from mucon_tpu.data import handel_dataset
    from mucon_tpu.models import create_model
    from mucon_tpu.serving import export_serving

    print("devices:", jax.devices(), flush=True)
    cfg = get_cfg_defaults()
    cfg.merge_from_list(
        [
            "dataset.name", "synthetic",
            "dataset.root", "/tmp/export_probe_data",
            "dataset.synthetic.num_videos", "8",
            "dataset.synthetic.min_len", "1500",
            "dataset.synthetic.max_len", "2048",
        ]
    )
    db = handel_dataset(cfg, train=False)
    model = create_model(
        cfg,
        num_classes=db.get_num_classes(),
        max_decoding_steps=db.max_transcript_length + 1,
        input_feature_size=db.feat_dim,
    )
    params = model.init_params(jax.random.PRNGKey(0))
    t0 = time.perf_counter()
    export_serving(
        model, params, cfg, db,
        batch_size=args.batch, pad_to=args.pad,
        out_dir=args.out, viterbi_max_len=2000,
        feats_wire=args.feats_wire,
    )
    t1 = time.perf_counter()
    import os

    size = os.path.getsize(f"{args.out}/model.stablehlo")
    print(
        json.dumps(
            dict(
                mode="export",
                batch=args.batch,
                pad_to=args.pad,
                feats_wire=args.feats_wire,
                export_s=round(t1 - t0, 2),
                artifact_mb=round(size / 2**20, 2),
            )
        ),
        flush=True,
    )


def do_serve(args):
    # fresh-process serving contract: ONLY the loader + jax. No model
    # code, config system, or checkpoint format is imported.
    import jax

    from mucon_tpu.serving import load_exported

    print("devices:", jax.devices(), flush=True)
    served = load_exported(args.out)
    m = served.meta
    B, T, D = m["batch_size"], m["pad_to"], m["feat_dim"]
    rng = np.random.default_rng(7)
    n = args.videos
    t_lo = min(1500, max(1, T * 3 // 4))  # ragged lengths at any pad_to
    feats_list = [
        rng.standard_normal((int(rng.integers(t_lo, T + 1)), D)).astype(
            np.float32
        )
        for _ in range(n)
    ]

    t0 = time.perf_counter()
    served.predict(feats_list[:B])  # compile + warmup round
    t_warm = time.perf_counter() - t0

    # device-resident timing: inputs device_put once, scalar-readback
    # sync (CLAUDE.md: never trust block_until_ready over the tunnel) —
    # isolates the program itself from the per-batch feature wire
    import jax
    import jax.numpy as jnp

    feats0 = np.zeros((B, T, D), np.float32)
    nf0 = np.full((B,), T, m["num_frames_dtype"])
    for i, f in enumerate(feats_list[:B]):
        feats0[i, : f.shape[0]] = f
        nf0[i] = f.shape[0]
    dwire = jax.device_put(served.to_wire(feats0))
    dnf = jax.device_put(nf0)

    def run_synced():
        out = served(dwire, dnf, raw_wire=True)
        float(jnp.sum(jax.tree.leaves(out)[0]))

    run_synced()  # warm this sync path
    dev_times = []
    for _ in range(args.rounds):
        t0 = time.perf_counter()
        run_synced()
        dev_times.append(time.perf_counter() - t0)
    dev_best_ms = min(dev_times) / B * 1e3

    times = []
    for _ in range(args.rounds):
        t0 = time.perf_counter()
        res = served.predict(feats_list)
        times.append(time.perf_counter() - t0)
    assert len(res) == n and all(len(r["transcript"]) >= 1 for r in res)
    best = min(times)
    med = sorted(times)[len(times) // 2]
    print(
        json.dumps(
            dict(
                mode="serve",
                batch=B,
                pad_to=T,
                videos=n,
                feats_wire=served.feats_wire,
                warmup_s=round(t_warm, 2),
                ms_per_video_best=round(best / n * 1e3, 3),
                ms_per_video_median=round(med / n * 1e3, 3),
                videos_per_sec_best=round(n / best, 1),
                device_ms_per_video_best=round(dev_best_ms, 3),
                # wire bytes of ONE video's feature payload (int8 adds a
                # 4*T-byte scale array — counted)
                feats_mb_per_video=round(
                    sum(a.nbytes for a in served.to_wire(feats0))
                    / B / 2**20, 2,
                ),
                rounds_s=[round(t, 3) for t in times],
            )
        ),
        flush=True,
    )


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("mode", choices=["export", "serve"])
    p.add_argument("--out", default=OUT_DEFAULT)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--pad", type=int, default=2048)
    p.add_argument("--videos", type=int, default=64)
    p.add_argument("--rounds", type=int, default=4)
    p.add_argument("--feats-wire", default="float32",
                   choices=["float32", "float16", "bfloat16", "int8"])
    args = p.parse_args()
    if args.mode == "export":
        do_export(args)
    else:
        do_serve(args)


if __name__ == "__main__":
    main()
