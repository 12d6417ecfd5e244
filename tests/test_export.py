"""StableHLO serving export (mucon_tpu/serving.py, cli/export_model.py).

New TPU capability — the reference has no deployment surface (its
predictions exist only in evaluator pickles, src/mucon/evaluators.py).
The artifact must reproduce the live fused inference program bitwise and
serve raw features without the framework's config/checkpoint machinery.
"""

import numpy as np
import pytest

from mucon_tpu.config import get_cfg_defaults
from mucon_tpu.data import handel_dataset
from mucon_tpu.models import create_model
from mucon_tpu.serving import build_serving_fn, export_serving, load_exported


def _tiny_cfg(tmp_path, data_root):
    cfg = get_cfg_defaults()
    cfg.merge_from_list(
        [
            "dataset.name", "synthetic",
            "dataset.root", str(data_root),
            "dataset.synthetic.num_videos", "8",
            "dataset.synthetic.num_classes", "6",
            "dataset.synthetic.feat_dim", "16",
            "dataset.synthetic.min_len", "120",
            "dataset.synthetic.max_len", "300",
            "trainer.root", str(tmp_path),
            "model.ft.stages", "[1, 2, 4]",
            "model.ft.pooling_layers", "[0, 1]",
            "model.ft.hidden_size", "16",
            "model.ft.last_gn_num_groups", "4",
            "model.fs.encoder.hidden_size", "16",
            "model.fs.decoder.hidden_size", "16",
            "tpu.batch_size", "4",
            "tpu.pad_multiple", "64",
            "evaluator.viterbi.frame_sampling", "10",
        ]
    )
    return cfg


@pytest.fixture(scope="module")
def exported_setup(tmp_path_factory):
    import jax

    tmp_path = tmp_path_factory.mktemp("export")
    cfg = _tiny_cfg(tmp_path / "runs", tmp_path / "data")
    db = handel_dataset(cfg, train=False)
    model = create_model(
        cfg,
        db.get_num_classes(),
        db.max_transcript_length + 1,
        db.feat_dim,
    )
    params = model.init_params(jax.random.PRNGKey(0))
    out_dir = tmp_path / "artifact"
    export_serving(
        model, params, cfg, db, batch_size=2, pad_to=128,
        out_dir=out_dir, viterbi_max_len=400,
    )
    return cfg, db, model, params, out_dir


def test_artifact_files_and_meta(exported_setup):
    import json

    _, db, model, _, out_dir = exported_setup
    assert (out_dir / "model.stablehlo").stat().st_size > 0
    meta = json.loads((out_dir / "meta.json").read_text())
    assert meta["format"] == "mucon-tpu-serving-v1"
    assert meta["batch_size"] == 2 and meta["pad_to"] == 128
    assert meta["feat_dim"] == db.feat_dim
    assert meta["n_steps_dim"] == model.max_decoding_steps
    assert meta["action_names"][: db.get_num_classes()] == [
        db.action_id_to_name[i] for i in range(db.get_num_classes())
    ]


def test_exported_matches_live_program_bitwise(exported_setup):
    import jax

    cfg, db, model, params, out_dir = exported_setup
    served = load_exported(out_dir)
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((2, 128, db.feat_dim)).astype(np.float32)
    nf = np.array([120, 77], served.meta["num_frames_dtype"])

    got = jax.device_get(served(feats, nf))
    serve, _ = build_serving_fn(
        model, params, cfg, db, 2, 128, viterbi_max_len=400
    )
    want = jax.device_get(jax.jit(serve)(feats, nf))
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(
            np.asarray(got[k]), np.asarray(want[k]), err_msg=k
        )


def test_predict_serves_raw_features(exported_setup):
    """End-to-end serving: raw [T x D] arrays in (count != batch size,
    ragged lengths), per-video predictions out — and identical to the
    live-process predict path (cli/predict.py) on the same inputs."""
    from mucon_tpu.cli.predict import predict_videos

    cfg, db, model, params, out_dir = exported_setup
    served = load_exported(out_dir)
    rng = np.random.default_rng(2)
    feats_list = [
        rng.standard_normal((t, db.feat_dim)).astype(np.float32)
        for t in (120, 64, 100)  # 3 videos through a B=2 artifact
    ]
    res = served.predict(feats_list, names=["a", "b", "c"])
    assert [r["name"] for r in res] == ["a", "b", "c"]
    for r, f in zip(res, feats_list):
        n = len(r["transcript"])
        assert n >= 1
        assert len(r["transcript_names"]) == n
        assert len(r["rel_lengths"]) == n
        assert abs(sum(r["rel_lengths"]) - 1.0) < 1e-5
        assert r["vit_labels"].shape == (f.shape[0],)
        assert r["y_labels"].shape == (f.shape[0],)
        assert set(np.unique(r["vit_labels"])) <= set(r["transcript"])

    # the live-process path (pad_multiple=64 pads these T's to 128 = the
    # artifact's frozen shape; batch_size=4 vs 2 only changes chunking,
    # videos are row-independent)
    model.set_teacher_forcing(False)
    cfg2 = cfg.clone()
    cfg2.defrost()
    cfg2.tpu.batch_size = 2
    cfg2.freeze()
    live = predict_videos(
        model, params, feats_list, ["a", "b", "c"], cfg2, db
    )
    for r, l in zip(res, live):
        assert r["transcript"] == l["transcript"]
        np.testing.assert_array_equal(r["vit_labels"], l["vit_labels"])
        np.testing.assert_array_equal(r["y_labels"], l["y_labels"])
        np.testing.assert_allclose(
            r["rel_lengths"], l["rel_lengths"], rtol=1e-6
        )


@pytest.mark.slow  # three full export traces — ~1 min on this 1-core box
@pytest.mark.parametrize("wire", ["float16", "bfloat16", "int8"])
def test_lossy_feature_wire_artifact(exported_setup, tmp_path, wire):
    """Lossy feature-wire exports (VERDICT r4 #3): the artifact freezes
    the wire format into its input signature + meta.json, ExportedMuCon
    converts host floats automatically, and the exported program matches
    the live serving fn BITWISE when both see the same wire arrays."""
    import json

    import jax

    cfg, db, model, params, _ = exported_setup
    out_dir = tmp_path / f"artifact_{wire}"
    export_serving(
        model, params, cfg, db, batch_size=2, pad_to=128,
        out_dir=out_dir, viterbi_max_len=400, feats_wire=wire,
    )
    meta = json.loads((out_dir / "meta.json").read_text())
    assert meta["feats_wire"] == wire

    served = load_exported(out_dir)
    assert served.feats_wire == wire
    rng = np.random.default_rng(3)
    feats = rng.standard_normal((2, 128, db.feat_dim)).astype(np.float32)
    nf = np.array([120, 77], served.meta["num_frames_dtype"])

    wire_arrays = served.to_wire(feats)
    if wire == "int8":
        assert len(wire_arrays) == 2
        assert wire_arrays[0].dtype == np.int8
        assert wire_arrays[1].shape == (2, 128)
    else:
        assert len(wire_arrays) == 1
        assert wire_arrays[0].dtype.itemsize == 2  # half the f32 bytes

    got = jax.device_get(served(feats, nf))
    serve, _ = build_serving_fn(
        model, params, cfg, db, 2, 128, viterbi_max_len=400,
        feats_wire=wire,
    )
    want = jax.device_get(jax.jit(serve)(*wire_arrays, nf))
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(
            np.asarray(got[k]), np.asarray(want[k]), err_msg=k
        )

    # end-to-end predict through the lossy artifact stays structurally
    # valid (ragged lengths, chunking)
    feats_list = [
        rng.standard_normal((t, db.feat_dim)).astype(np.float32)
        for t in (120, 64, 100)
    ]
    res = served.predict(feats_list, names=["a", "b", "c"])
    for r, f in zip(res, feats_list):
        assert len(r["transcript"]) >= 1
        assert abs(sum(r["rel_lengths"]) - 1.0) < 1e-5
        assert r["vit_labels"].shape == (f.shape[0],)
        assert set(np.unique(r["vit_labels"])) <= set(r["transcript"])


def test_predict_videos_honors_eval_wire(exported_setup):
    """cli/predict.py routes tpu.eval_feats_transfer_dtype through the
    live serving path (VERDICT r4 #3): the int8-wire prediction runs the
    quantize+device-dequant machinery end to end and stays structurally
    valid; the f16 wire is near-lossless, so its labels must agree with
    f32 on a margin-dominated model output."""
    from mucon_tpu.cli.predict import predict_videos

    cfg, db, model, params, _ = exported_setup
    model.set_teacher_forcing(False)
    rng = np.random.default_rng(4)
    feats_list = [
        rng.standard_normal((t, db.feat_dim)).astype(np.float32)
        for t in (120, 100)
    ]
    results = {}
    for wire in ("float32", "float16", "int8"):
        cfg_w = cfg.clone()
        cfg_w.defrost()
        cfg_w.tpu.eval_feats_transfer_dtype = wire
        cfg_w.freeze()
        results[wire] = predict_videos(
            model, params, feats_list, ["a", "b"], cfg_w, db
        )
    for wire, res in results.items():
        for r, f in zip(res, feats_list):
            assert r["vit_labels"].shape == (f.shape[0],), wire
            assert len(r["transcript"]) >= 1, wire
    # f16 rounding is ~1e-4 relative on unit-scale features — far below
    # the argmax margins of a real forward pass
    for r32, r16 in zip(results["float32"], results["float16"]):
        assert r32["transcript"] == r16["transcript"]
        np.testing.assert_array_equal(r32["vit_labels"], r16["vit_labels"])
