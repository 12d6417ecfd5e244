"""predict CLI: segment raw feature files from a trained run folder."""

import json

import numpy as np
import pytest

from mucon_tpu.cli import predict as predict_cli
from mucon_tpu.cli import train_test_mucon as train_cli


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    data_root = tmp_path_factory.mktemp("data")
    run_root = tmp_path_factory.mktemp("runs")
    overrides = [
        ("dataset.name", "synthetic"),
        ("dataset.root", str(data_root)),
        ("dataset.synthetic.num_videos", "6"),
        ("dataset.synthetic.num_classes", "5"),
        ("dataset.synthetic.feat_dim", "12"),
        ("dataset.synthetic.min_len", "100"),
        ("dataset.synthetic.max_len", "200"),
        ("trainer.root", str(run_root)),
        ("trainer.num_epochs", "1"),
        ("trainer.save_every", "1"),
        ("trainer.eval_every", "1"),
        ("model.ft.stages", "[1, 2]"),
        ("model.ft.pooling_layers", "[0, 1]"),
        ("model.ft.hidden_size", "16"),
        ("model.ft.last_gn_num_groups", "4"),
        ("model.fs.encoder.hidden_size", "16"),
        ("model.fs.decoder.hidden_size", "16"),
        ("tpu.batch_size", "2"),
        ("tpu.pad_multiple", "32"),
        ("evaluator.viterbi.frame_sampling", "10"),
    ]
    argv = ["--exp-name", "pred_e2e"]
    for k, v in overrides:
        argv += ["--set", k, v]
    train_cli.main(argv)
    feat_dir = next(data_root.glob("synthetic_*/features"))
    return run_root, feat_dir


def test_predict_cli_outputs(trained_run, tmp_path):
    run_root, feat_dir = trained_run
    out = tmp_path / "preds"
    results = predict_cli.main([
        "pred_e2e/0/0", "--root", str(run_root),
        "--features", str(feat_dir), "--out", str(out),
    ])
    feat_files = sorted(feat_dir.glob("*.npy"))
    assert len(results) == len(feat_files)
    for f in feat_files:
        T = np.load(f).shape[0]
        labels = np.load(out / f"{f.stem}.labels.npy")
        y = np.load(out / f"{f.stem}.y_labels.npy")
        assert labels.shape == (T,) and labels.dtype == np.int32
        assert y.shape == (T,)
        meta = json.load(open(out / f"{f.stem}.json"))
        assert len(meta["transcript"]) == len(meta["rel_lengths"])
        assert len(meta["transcript_names"]) == len(meta["transcript"])
        # viterbi labels only use transcript classes
        assert set(np.unique(labels)) <= set(meta["transcript"])
        # relative lengths sum to ~1 (masked softmax)
        assert np.isclose(sum(meta["rel_lengths"]), 1.0, atol=1e-4)


def test_predict_cli_rejects_bad_features(trained_run, tmp_path):
    run_root, _ = trained_run
    bad = tmp_path / "badfeats"
    bad.mkdir()
    np.save(bad / "wrong.npy", np.zeros((50, 7), np.float32))  # wrong D
    with pytest.raises(SystemExit, match="expected"):
        predict_cli.main([
            "pred_e2e/0/0", "--root", str(run_root),
            "--features", str(bad), "--out", str(tmp_path / "o"),
        ])
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(SystemExit, match="no .npy"):
        predict_cli.main([
            "pred_e2e/0/0", "--root", str(run_root),
            "--features", str(empty), "--out", str(tmp_path / "o2"),
        ])
