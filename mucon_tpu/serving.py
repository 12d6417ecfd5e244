"""Serving export: serialize the inference program to a StableHLO artifact.

The reference has NO deployment surface at all — its predictions are
reachable only through the evaluator's pickle dumps (reference
src/mucon/evaluators.py:170-213); `cli/predict.py` added a live-process
serving path.  This module goes one step further, TPU-production style:
it freezes the ENTIRE fused inference program (forward + free decode +
Poisson prep + dense Viterbi DP + device traceback,
mucon_tpu/ops/eval_fused.py) plus the trained weights into one
self-contained `jax.export` StableHLO artifact that runs WITHOUT the
model code, the config system, or the checkpoint format:

    <out>/model.stablehlo     serialized jax.export.Exported bytes
    <out>/meta.json           shapes, vocabulary, wire layout params

Serving then needs only `load_exported(out_dir)` (or any runtime that
executes StableHLO) — model/version skew between training and serving
fleets is eliminated by construction.

Design notes (TPU-first):
  * fixed (batch, pad_to) shapes — the serving contract mirrors the
    training padding contract; XLA gets static shapes, serving gets
    deterministic latency.  Export one artifact per bucket shape.
  * the exported program is the XLA path (`use_pallas*=False`): Pallas
    lowers to `tpu_custom_call` ops whose serialized form is not
    guaranteed stable across runtime versions, so portability wins here
    (the fused eval program is dispatch-bound, not kernel-bound; the
    kernels' eval win is ~1.35x inside a live process, see
    docs/EVAL_PROFILE.md).
  * weights are baked into the program as constants: one artifact == one
    deployable model version, no side-channel checkpoint to keep in sync.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

ARTIFACT_NAME = "model.stablehlo"
META_NAME = "meta.json"


def _template_arrays(db, cfg, batch_size: int, pad_to: int):
    """Shape/dtype template for the canonical arrays dict at the export
    shape: one dummy batch through the REAL collate (data/batching.py),
    so every non-input field matches production shapes exactly."""
    from mucon_tpu.data import collate_padded
    from mucon_tpu.data.general_dataset import Sample
    from mucon_tpu.data.utils import create_tf_input, create_tf_target
    from mucon_tpu.models.model import batch_to_host_arrays

    dummy_tr = np.zeros(1, np.int64)
    samples = [
        Sample(
            feats=np.zeros((pad_to, db.feat_dim), np.float32),
            gt_label=np.zeros(pad_to, np.int64),
            transcript=dummy_tr,
            transcript_tf_input=create_tf_input(dummy_tr, sos_i=db.sos_token_id),
            transcript_tf_target=create_tf_target(dummy_tr, eos_i=db.eos_token_id),
            video_name=f"dummy_{i}",
        )
        for i in range(batch_size)
    ]
    batch = collate_padded(samples, db.max_transcript_length, cfg.tpu.pad_multiple)
    arrays = batch_to_host_arrays(batch)
    assert arrays["feats"].shape == (batch_size, pad_to, db.feat_dim), (
        arrays["feats"].shape,
        "pad_to must be a multiple of tpu.pad_multiple",
    )
    return arrays


FEATS_WIRES = ("float32", "float16", "bfloat16", "int8")


def feats_wire_dtype(wire: str):
    """Numpy dtype of the on-the-wire feature array for a wire name.
    ('int8' additionally carries a float32 per-frame scale array — see
    models/model.py quantize_feats_int8.)"""
    if wire not in FEATS_WIRES:
        raise ValueError(
            f"feats_wire must be one of {FEATS_WIRES}, got {wire!r}"
        )
    if wire == "bfloat16":
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(wire)


def build_serving_fn(model, params, cfg, db, batch_size: int, pad_to: int,
                     viterbi_max_len: int = 2000,
                     feats_wire: str = "float32"):
    """Jittable `serve(feats [B,T,D], num_frames [B] i32) -> wire dict`
    with the trained params closed over.  The wire is the fused eval
    program's 2-leaf output (unpack with `unpack_eval_wire`).

    `feats_wire` selects the FEATURE INPUT wire format — the same lossy
    wires the trainer/evaluator ship (tpu.eval_feats_transfer_dtype):
    float16/bfloat16 halve the dominant transfer (the program upcasts on
    device; bfloat16 is numerics-IDENTICAL to f32 on TPU because the
    in-projection matmul truncates operands to bf16 anyway — measured,
    docs/ROOFLINE.md lever 9), int8 quarters it (per-frame symmetric
    quantization; the scale rides as a second input and the program
    dequantizes on device).  The serving hw validation showed the f32
    export is 99.7% feature-wire-bound end-to-end (docs/EVAL_PROFILE.md),
    so this is THE serving latency lever.  int8 signature:
    `serve(q [B,T,D] int8, scale [B,T] f32, num_frames)`."""
    import jax.numpy as jnp

    from mucon_tpu.ops.eval_fused import build_fused_eval

    feats_wire_dtype(feats_wire)  # validate early
    model.set_teacher_forcing(False)
    run = build_fused_eval(
        model,
        teacher_forcing=False,
        frame_sampling=cfg.evaluator.viterbi.frame_sampling,
        max_len=viterbi_max_len,
        use_pallas_viterbi=False,
        use_pallas_forward=False,  # portable StableHLO: no custom calls
    )
    template = _template_arrays(db, cfg, batch_size, pad_to)

    def _arrays(num_frames):
        # bake the dummy-collate values, NOT zeros: free decode still
        # reads the SOS start token from tf_input[:, 0] (models/
        # mucon.py:306) — exactly what cli/predict.py feeds for unknown
        # transcripts
        arrays = {k: jnp.asarray(v) for k, v in template.items()}
        arrays["num_frames"] = num_frames.astype(
            template["num_frames"].dtype
        )
        return arrays

    if feats_wire == "int8":

        def serve(feats, feats_scale, num_frames):
            arrays = _arrays(num_frames)
            # model.forward dequantizes on device when feats_scale is
            # present (models/model.py:144) — same path the evaluator's
            # int8 eval wire exercises
            arrays["feats"] = feats
            arrays["feats_scale"] = feats_scale.astype(jnp.float32)
            return run(params, arrays)

    else:

        def serve(feats, num_frames):
            arrays = _arrays(num_frames)
            # f16/bf16 wires ride as-is; the model upcasts on device
            # (the cast fuses into the in-projection's producer)
            arrays["feats"] = feats
            return run(params, arrays)

    return serve, template


def export_serving(model, params, cfg, db, batch_size: int, pad_to: int,
                   out_dir, viterbi_max_len: int = 2000,
                   feats_wire: str = "float32"):
    """Export the serving fn at (batch_size, pad_to) and write the
    artifact + metadata.  Returns the jax.export.Exported object.
    `feats_wire` freezes the feature input wire format into the artifact
    (see build_serving_fn); ExportedMuCon reads it back from meta.json
    and converts host features automatically."""
    import jax
    from jax import export as jexport

    serve, template = build_serving_fn(
        model, params, cfg, db, batch_size, pad_to,
        viterbi_max_len=viterbi_max_len, feats_wire=feats_wire,
    )
    feats_spec = jax.ShapeDtypeStruct(
        (batch_size, pad_to, db.feat_dim), feats_wire_dtype(feats_wire)
    )
    nf_spec = jax.ShapeDtypeStruct(
        (batch_size,), template["num_frames"].dtype
    )
    if feats_wire == "int8":
        scale_spec = jax.ShapeDtypeStruct(
            (batch_size, pad_to), np.float32
        )
        exported = jexport.export(jax.jit(serve))(
            feats_spec, scale_spec, nf_spec
        )
    else:
        exported = jexport.export(jax.jit(serve))(feats_spec, nf_spec)

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / ARTIFACT_NAME).write_bytes(exported.serialize())
    meta = dict(
        format="mucon-tpu-serving-v1",
        batch_size=batch_size,
        pad_to=pad_to,
        feats_wire=feats_wire,
        feat_dim=db.feat_dim,
        num_frames_dtype=np.dtype(template["num_frames"].dtype).name,
        n_steps_dim=model.max_decoding_steps,
        n_max=int(template["transcript"].shape[1]),
        frame_sampling=cfg.evaluator.viterbi.frame_sampling,
        viterbi_max_len=viterbi_max_len,
        num_classes=db.get_num_classes(),
        action_names=[
            db.action_id_to_name[i] for i in range(db.get_num_classes())
        ],
        platforms=list(exported.platforms),
        jax_version=jax.__version__,
    )
    (out_dir / META_NAME).write_text(json.dumps(meta, indent=2) + "\n")
    return exported


class ExportedMuCon:
    """Runs an exported artifact: pads/chunks raw feature arrays to the
    frozen (batch, pad_to) shape, executes the StableHLO program, and
    post-processes to per-video predictions (same dict surface as
    cli/predict.py's predict_videos)."""

    def __init__(self, out_dir):
        import jax
        from jax import export as jexport

        out_dir = Path(out_dir)
        self.meta = json.loads((out_dir / META_NAME).read_text())
        if self.meta.get("format") != "mucon-tpu-serving-v1":
            raise ValueError(f"unknown artifact format in {out_dir}")
        self.exported = jexport.deserialize(
            (out_dir / ARTIFACT_NAME).read_bytes()
        )
        # jit the call ONCE: Exported.call re-traces (and over a remote
        # backend re-COMPILES) on every invocation otherwise — measured
        # 13-27 s/batch un-jitted vs milliseconds warm (probe_export_tpu)
        self._call = jax.jit(self.exported.call)
        self.feats_wire = self.meta.get("feats_wire", "float32")

    def to_wire(self, feats):
        """Convert a host [B,T,D] float array to the artifact's frozen
        feature wire: a tuple of the positional feature inputs the
        exported program takes (1 leaf for float wires, 2 for int8 —
        the quantized array + per-frame scale)."""
        feats = np.asarray(feats)
        if self.feats_wire == "int8":
            from mucon_tpu.models.model import quantize_feats_int8

            return quantize_feats_int8(np.asarray(feats, np.float32))
        return (feats.astype(feats_wire_dtype(self.feats_wire)),)

    def __call__(self, feats, num_frames, *, raw_wire=False):
        """Run the exported program at the frozen shapes -> 2-leaf wire.
        Host float feats are converted to the artifact's feature wire
        automatically; pass `raw_wire=True` with a `to_wire()` tuple (or
        pre-quantized arrays) to skip the conversion."""
        wire = feats if raw_wire else self.to_wire(feats)
        return self._call(*wire, num_frames)

    def predict(self, feats_list, names=None):
        """Serve a list of [T x D] float32 feature arrays (any count; any
        T <= pad_to).  Returns per-video dicts: transcript ids/names,
        relative lengths, framewise y/vit labels."""
        import jax

        from mucon_tpu.ops.eval_fused import unpack_eval_wire
        from mucon_tpu.ops.viterbi import positions_to_results

        m = self.meta
        B, T, D = m["batch_size"], m["pad_to"], m["feat_dim"]
        names = names or [f"video_{i}" for i in range(len(feats_list))]
        results = []
        for lo in range(0, len(feats_list), B):
            chunk = feats_list[lo : lo + B]
            feats = np.zeros((B, T, D), np.float32)
            num_frames = np.full((B,), 1, m["num_frames_dtype"])
            for i, f in enumerate(chunk):
                f = np.asarray(f, np.float32)
                if f.ndim != 2 or f.shape[1] != D or f.shape[0] > T:
                    raise ValueError(
                        f"expected [T<={T} x {D}] features, got {f.shape}"
                    )
                feats[i, : f.shape[0]] = f
                num_frames[i] = f.shape[0]
            out = unpack_eval_wire(
                jax.device_get(self(feats, num_frames)),
                n_steps_dim=m["n_steps_dim"],
                n_max=m["n_max"],
                num_frames=num_frames,
                t_full=T,
            )
            nb = len(chunk)
            traced = positions_to_results(
                num_frames[:nb],
                out["transcripts"][:nb],
                out["n_dec"][:nb],
                out["vit_score"][:nb],
                out["vit_pos"][:nb],
                out["vit_k_valid"][:nb],
                m["frame_sampling"],
            )
            for i in range(nb):
                t_i = int(num_frames[i])
                n = int(out["n_dec"][i])
                transcript = [int(x) for x in out["transcripts"][i, :n]]
                results.append(
                    dict(
                        name=names[lo + i],
                        transcript=transcript,
                        transcript_names=[
                            m["action_names"][t] for t in transcript
                        ],
                        rel_lengths=[
                            float(x) for x in out["rel_lengths"][i, :n]
                        ],
                        vit_labels=np.asarray(traced[i].labels, np.int32),
                        y_labels=out["y_argmax"][i, :t_i].astype(np.int32),
                    )
                )
        return results


def load_exported(out_dir) -> ExportedMuCon:
    return ExportedMuCon(out_dir)
