"""Inference/export entry point: segment raw feature files with a trained run.

The reference can only *evaluate* (its predictions are reachable solely
through the evaluator's pickle dumps); this CLI is the serving surface the
reference lacks: point a trained `exp/run/epoch` at a directory of
`*.npy` feature files ([T x D] float32, the L0 disk contract for
`features/` — general_dataset.py:138-151) and get per-video predictions:

    <out>/<video>.labels.npy        framewise Viterbi labels [T] int32
    <out>/<video>.y_labels.npy      framewise y-head argmax  [T] int32
    <out>/<video>.json              transcript ids/names + relative lengths

Usage:
    python -m mucon_tpu.cli.predict my_exp/0/149 \
        --features /path/to/features --out /tmp/preds [--root R]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from mucon_tpu.config import get_cfg_defaults
from mucon_tpu.data import collate_padded, handel_dataset
from mucon_tpu.data.general_dataset import Sample
from mucon_tpu.data.utils import create_tf_input, create_tf_target
from mucon_tpu.harness.checkpoint import load_checkpoint
from mucon_tpu.models import create_model
from mucon_tpu.models.model import (
    batch_to_arrays,
    resolve_eval_feats_dtype,
    resolve_pallas_flag,
)
from mucon_tpu.ops.eval_fused import build_fused_eval, unpack_eval_wire
from mucon_tpu.ops.viterbi import positions_to_results


def predict_videos(model, params, feats_list, names, cfg, db):
    """Free-decode + Viterbi for raw feature arrays; returns per-video
    dicts (transcript ids, relative lengths, y/vit framewise labels)."""
    n_max = db.max_transcript_length
    frame_sampling = cfg.evaluator.viterbi.frame_sampling
    sos = db.sos_token_id
    run = build_fused_eval(
        model,
        teacher_forcing=False,
        frame_sampling=frame_sampling,
        use_pallas_viterbi=resolve_pallas_flag(cfg.tpu.use_pallas),
    )

    results = []
    bs = max(1, cfg.tpu.batch_size)
    for lo in range(0, len(feats_list), bs):
        chunk = feats_list[lo : lo + bs]
        chunk_names = names[lo : lo + bs]
        samples = []
        for f, name in zip(chunk, chunk_names):
            dummy_tr = np.zeros(1, np.int64)  # transcripts are unknown here
            samples.append(
                Sample(
                    feats=np.ascontiguousarray(f, np.float32),
                    gt_label=np.zeros(f.shape[0], np.int64),
                    transcript=dummy_tr,
                    transcript_tf_input=create_tf_input(dummy_tr, sos_i=sos),
                    transcript_tf_target=create_tf_target(
                        dummy_tr, eos_i=db.eos_token_id
                    ),
                    video_name=name,
                )
            )
        batch = collate_padded(samples, n_max, cfg.tpu.pad_multiple)
        import jax

        # honor the eval feature wire (tpu.eval_feats_transfer_dtype):
        # prediction is transfer-bound on thin links (the hw-validated
        # export is 99.7% f32 feature wire — docs/EVAL_PROFILE.md), and
        # the lossy wires are the evaluator's own convergence-validated
        # machinery (bfloat16 is numerics-identical on TPU)
        arrays = batch_to_arrays(
            batch, feats_dtype=resolve_eval_feats_dtype(cfg)
        )
        out = unpack_eval_wire(
            jax.device_get(run(params, arrays)),
            n_steps_dim=model.max_decoding_steps,
            n_max=batch.transcript.shape[1],
            num_frames=batch.num_frames,
            t_full=int(batch.feats.shape[1]),
        )
        nb = len(chunk_names)
        traced = positions_to_results(
            batch.num_frames[:nb],
            out["transcripts"][:nb],
            out["n_dec"][:nb],
            out["vit_score"][:nb],
            out["vit_pos"][:nb],
            out["vit_k_valid"][:nb],
            frame_sampling,
        )
        for i, name in enumerate(chunk_names):
            t_i = int(batch.num_frames[i])
            n = int(out["n_dec"][i])
            transcript = [int(x) for x in out["transcripts"][i, :n]]
            res = traced[i]
            results.append(
                dict(
                    name=name,
                    transcript=transcript,
                    transcript_names=[db.action_id_to_name[t] for t in transcript],
                    rel_lengths=[float(x) for x in out["rel_lengths"][i, :n]],
                    vit_labels=np.asarray(res.labels, np.int32),
                    y_labels=out["y_argmax"][i, :t_i].astype(np.int32),
                )
            )
    return results


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("identifier", help="exp-name/run-number/epoch-number")
    p.add_argument("--features", required=True,
                   help="directory of <video>.npy [T x D] feature files")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--root", default="")
    p.add_argument("--feats-wire", default=None,
                   choices=["float32", "float16", "bfloat16", "int8"],
                   help="override tpu.eval_feats_transfer_dtype for this "
                        "prediction run (h2d feature wire format)")
    args = p.parse_args(argv)

    cfg = get_cfg_defaults()
    root = args.root or cfg.trainer.root
    exp_name, run_number, epoch_number = args.identifier.split("/")
    run_folder = Path(root) / exp_name / run_number
    cfg.merge_from_file(str(run_folder / "config.yaml"))
    cfg.defrost()
    cfg.trainer.root = root
    if args.feats_wire is not None:
        cfg.tpu.eval_feats_transfer_dtype = args.feats_wire
    cfg.freeze()

    # the dataset supplies the label vocabulary + shape contract only
    db = handel_dataset(cfg, train=False)
    model = create_model(
        cfg=cfg,
        num_classes=db.get_num_classes(),
        max_decoding_steps=db.max_transcript_length + 1,
        input_feature_size=db.feat_dim,
    )
    import jax

    params = model.init_params(jax.random.PRNGKey(cfg.system.seed))
    ckpt = run_folder / "checkpoints" / f"epoch_{int(epoch_number)}"
    params, _, _ = load_checkpoint(ckpt, params)
    model.set_teacher_forcing(False)

    feat_files = sorted(Path(args.features).glob("*.npy"))
    if not feat_files:
        raise SystemExit(f"no .npy feature files in {args.features}")
    feats = [np.load(f) for f in feat_files]
    names = [f.stem for f in feat_files]
    for f, name in zip(feats, names):
        if f.ndim != 2 or f.shape[1] != db.feat_dim:
            raise SystemExit(
                f"{name}: expected [T x {db.feat_dim}] features, got {f.shape}"
            )

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    results = predict_videos(model, params, feats, names, cfg, db)
    for r in results:
        np.save(out_dir / f"{r['name']}.labels.npy", r["vit_labels"])
        np.save(out_dir / f"{r['name']}.y_labels.npy", r["y_labels"])
        with open(out_dir / f"{r['name']}.json", "w") as f:
            json.dump(
                {
                    k: r[k]
                    for k in ("name", "transcript", "transcript_names",
                              "rel_lengths")
                },
                f,
                indent=2,
            )
        print(f"{r['name']}: {' '.join(r['transcript_names'])}")
    print(f"wrote {len(results)} predictions to {out_dir}")
    return results


if __name__ == "__main__":
    main()
