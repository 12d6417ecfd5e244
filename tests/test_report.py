"""HTML run-report tests (mucon_tpu/harness/report.py) — pure host code,
rendered from a synthetic run folder (no jax, no model)."""

import json
import pickle

import numpy as np
import pytest

from mucon_tpu.harness.report import (
    _svg_line_chart,
    _svg_timeline,
    render_report,
    write_report,
)


@pytest.fixture()
def run_folder(tmp_path):
    run = tmp_path / "exp" / "0"
    run.mkdir(parents=True)
    (run / "config.yaml").write_text(
        "experiment_name: exp\n"
        "dataset:\n  name: synthetic\n  split: 1\n"
        "trainer:\n  optimizer: SGD\n  learning_rate: 0.01\n  num_epochs: 3\n"
        "tpu:\n  batch_size: 4\n"
    )
    with open(run / "events.jsonl", "w") as f:
        for e in range(3):
            f.write(json.dumps({
                "kind": "epoch", "step": e, "time": 0.0,
                "main": 10.0 - e, "transcript_loss": 8.0 - e,
                "mucon_loss": 1.5, "smoothing_loss": 0.02,
            }) + "\n")
            f.write(json.dumps({
                "kind": "eval_0", "step": e, "time": 0.0,
                "vit_mof": 0.1 * e, "y_mof": 0.2 * e, "s_mof": 0.05 * e,
            }) + "\n")
    ckpt = run / "checkpoints" / "epoch_2"
    ckpt.mkdir(parents=True)
    data = {
        "target_segs": [np.array([0, 0, 1, 1, 2, 2]), np.array([1, 1, 0])],
        "y_segs": [np.array([0, 1, 1, 1, 2, 2]), np.array([1, 0, 0])],
        "s_segs": [np.array([0, 0, 0, 1, 2, 2]), np.array([1, 1, 1])],
        "vit_segs": [np.array([0, 0, 1, 1, 2, 0]), np.array([1, 1, 0])],
        "s_transcript": [np.array([0, 1, 2]), np.array([1, 0])],
    }
    with open(ckpt / "data_test_eval.pkl", "wb") as f:
        pickle.dump(data, f)
    return run


def test_render_report_contains_all_sections(run_folder):
    out = render_report(run_folder)
    for marker in (
        "Config", "Training losses", "Eval metrics", "Segmentations",
        "<svg", "<polyline", "<rect", "vit_mof",
    ):
        assert marker in out, marker
    # one timeline block per video
    assert out.count("class='video'") == 2
    # video 1 vit matches GT exactly -> mof=1.000 appears
    assert "vit_mof=1.000" in out


def test_write_report_default_path(run_folder):
    out = write_report(run_folder)
    assert out == run_folder / "report.html"
    assert out.read_text().startswith("<!doctype html>")


def test_report_degrades_without_artifacts(tmp_path):
    # bare folder: no events, no pickle, no config — still a valid page
    empty = tmp_path / "empty"
    empty.mkdir()
    out = render_report(empty)
    assert out.startswith("<!doctype html>") and out.endswith("</html>")
    assert "Training losses" not in out


def test_line_chart_handles_constant_and_single_point():
    svg = _svg_line_chart({"a": [(0, 5.0)]}, title="t")
    assert "<svg" in svg and "t</text>" in svg
    svg = _svg_line_chart({"a": [(0, 2.0), (1, 2.0)]})
    assert "<polyline" in svg
    assert _svg_line_chart({"a": [(0, float("nan"))]}) == ""


def test_timeline_run_length_merging():
    svg = _svg_timeline({"GT": np.array([0] * 50 + [1] * 50)}, width=100)
    # two runs -> exactly two rects
    assert svg.count("<rect") == 2
    # empty row renders the label but no rects
    svg = _svg_timeline({"GT": np.array([])}, width=10)
    assert "<rect" not in svg and "GT" in svg


def test_cli_html_flag(run_folder, capsys):
    from mucon_tpu.cli.inspect_run import main

    main([str(run_folder), "--html"])
    assert (run_folder / "report.html").exists()
    assert "report written" in capsys.readouterr().out
