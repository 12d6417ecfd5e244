"""Export a trained run to a self-contained StableHLO serving artifact.

The reference's only deployment story is re-running the research code
(src/test_mucon.py resumes a checkpoint inside the full framework); this
entry freezes weights + the fused inference program (forward, free
decode, Poisson prep, dense Viterbi, device traceback) into a versioned
artifact that serves WITHOUT the framework — see mucon_tpu/serving.py.

Usage:
    python -m mucon_tpu.cli.export_model my_exp/0/149 \
        --out /models/mucon_v1 --batch-size 16 --pad-to 2048 [--root R]

Then, from any process with jax installed:
    from mucon_tpu.serving import load_exported
    load_exported("/models/mucon_v1").predict([feats])   # [T x D] f32
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from mucon_tpu.config import get_cfg_defaults
from mucon_tpu.data import handel_dataset
from mucon_tpu.harness.checkpoint import load_checkpoint
from mucon_tpu.models import create_model
from mucon_tpu.serving import export_serving, load_exported


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("identifier", help="exp-name/run-number/epoch-number")
    p.add_argument("--out", required=True, help="artifact output directory")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--pad-to", type=int, default=2048,
                   help="frozen time dim (multiple of tpu.pad_multiple)")
    p.add_argument("--viterbi-max-len", type=int, default=2000)
    p.add_argument("--feats-wire", default="float32",
                   choices=["float32", "float16", "bfloat16", "int8"],
                   help="feature INPUT wire frozen into the artifact: the "
                        "f32 export is ~99.7%% feature-transfer-bound end "
                        "to end (docs/EVAL_PROFILE.md), so bfloat16 "
                        "(numerics-identical on TPU) or int8 (per-frame "
                        "quantized) cut serving latency ~2-4x")
    p.add_argument("--root", default="")
    p.add_argument("--no-selftest", action="store_true",
                   help="skip the deserialize-and-compare check")
    args = p.parse_args(argv)

    cfg = get_cfg_defaults()
    root = args.root or cfg.trainer.root
    exp_name, run_number, epoch_number = args.identifier.split("/")
    run_folder = Path(root) / exp_name / run_number
    cfg.merge_from_file(str(run_folder / "config.yaml"))
    cfg.defrost()
    cfg.trainer.root = root
    cfg.freeze()

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

    export_serving(
        model, params, cfg, db,
        batch_size=args.batch_size, pad_to=args.pad_to,
        out_dir=args.out, viterbi_max_len=args.viterbi_max_len,
        feats_wire=args.feats_wire,
    )
    print(f"exported {args.identifier} -> {args.out} "
          f"(B={args.batch_size}, T={args.pad_to}, "
          f"feats_wire={args.feats_wire})")

    if not args.no_selftest:
        # round-trip: the deserialized artifact must reproduce the live
        # program bit-for-bit on a random batch
        from mucon_tpu.serving import build_serving_fn

        served = load_exported(args.out)
        rng = np.random.default_rng(0)
        feats = rng.standard_normal(
            (args.batch_size, args.pad_to, db.feat_dim), np.float32
        )
        nf = np.full((args.batch_size,), args.pad_to // 2, np.int32)
        got = jax.device_get(served(feats, nf.astype(
            served.meta["num_frames_dtype"])))
        serve, template = build_serving_fn(
            model, params, cfg, db, args.batch_size, args.pad_to,
            viterbi_max_len=args.viterbi_max_len,
            feats_wire=args.feats_wire,
        )
        # feed the live program the SAME wire arrays the artifact saw so
        # lossy wires still compare bitwise
        wire = served.to_wire(feats)
        want = jax.device_get(jax.jit(serve)(
            *wire, nf.astype(template["num_frames"].dtype)))
        for k in want:
            np.testing.assert_array_equal(np.asarray(got[k]),
                                          np.asarray(want[k]), err_msg=k)
        print("selftest: exported == live program (bitwise)")
    return args.out


if __name__ == "__main__":
    main()
