"""Native C++ metric kernels: availability + exact parity vs Python."""

import os

import numpy as np
import pytest

from mucon_tpu import native


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("g++ unavailable — python fallback covers correctness")
    return True


def test_overlap_parity(lib_available):
    os.environ.pop("MUCON_TPU_NO_NATIVE", None)
    rng = np.random.RandomState(0)
    from mucon_tpu.metrics import segmentation as seg

    for _ in range(20):
        n = rng.randint(5, 60)
        t = rng.randint(0, 4, size=n)
        p = rng.randint(0, 4, size=n)
        for ignore in ([], [0]):
            for union in (False, True):
                got = native.overlap_score_native(p, t, ignore, union)
                # python reference (force fallback path)
                os.environ["MUCON_TPU_NO_NATIVE"] = "1"
                native._lib = None
                want = seg._overlap_score(p, t, ignore, union)
                del os.environ["MUCON_TPU_NO_NATIVE"]
                native._lib = None
                if np.isnan(want):
                    assert np.isnan(got)
                else:
                    assert got == pytest.approx(want, rel=1e-12)


def test_levenshtein_parity(lib_available):
    rng = np.random.RandomState(1)
    for _ in range(20):
        a = list(rng.randint(0, 5, size=rng.randint(0, 15)))
        b = list(rng.randint(0, 5, size=rng.randint(0, 15)))
        got = native.levenshtein_native(a, b)
        # simple dp reference
        la, lb = len(a), len(b)
        D = np.zeros((la + 1, lb + 1))
        D[:, 0] = np.arange(la + 1)
        D[0, :] = np.arange(lb + 1)
        for i in range(1, la + 1):
            for j in range(1, lb + 1):
                D[i, j] = min(
                    D[i - 1, j] + 1,
                    D[i, j - 1] + 1,
                    D[i - 1, j - 1] + (a[i - 1] != b[j - 1]),
                )
        assert got == D[la, lb]


def test_matches_parity(lib_available):
    rng = np.random.RandomState(2)
    from mucon_tpu.metrics.transcript import levenshtein_matches

    for _ in range(20):
        a = list(rng.randint(0, 4, size=rng.randint(0, 12)))
        b = list(rng.randint(0, 4, size=rng.randint(0, 12)))
        got = native.levenshtein_matches_native(a, b)
        os.environ["MUCON_TPU_NO_NATIVE"] = "1"
        native._lib = None
        want = levenshtein_matches(a, b)
        del os.environ["MUCON_TPU_NO_NATIVE"]
        native._lib = None
        assert got == want


def test_metrics_use_native_transparently(lib_available):
    from mucon_tpu.metrics import IoDMetric, Edit, MatchingScoreMetric

    m = IoDMetric()
    m.add([1, 1, 2, 2], [1, 1, 1, 1])
    assert m.summary() == pytest.approx((0.5 + 0.0) / 2)
    e = Edit()
    e.add([1, 1, 3, 3], [1, 1, 2, 3])
    assert e.summary() == pytest.approx(200 / 3)
    s = MatchingScoreMetric()
    s.add([1, 2, 3], [1, 3])
    assert s.summary() == pytest.approx(0.8)


def test_pad_copy_collate_matches_python():
    """Native collate pad-copy == numpy slicing, and the collate_padded
    surface produces identical batches with the native path on and off."""
    import os
    import numpy as np
    from mucon_tpu.native import pad_copy_feats_native, pad_copy_labels_native

    rng = np.random.RandomState(0)
    B, Tpad, D = 3, 64, 8
    feats_list = [
        np.ascontiguousarray(rng.randn(t, D).astype(np.float32))
        for t in (64, 41, 17)
    ]
    labels_list = [
        np.ascontiguousarray(rng.randint(0, 9, t).astype(np.int64))
        for t in (64, 41, 17)
    ]

    dst = np.zeros((B, Tpad, D), np.float32)
    if pad_copy_feats_native(dst, feats_list):
        ref = np.zeros_like(dst)
        for i, f in enumerate(feats_list):
            ref[i, : f.shape[0]] = f
        np.testing.assert_array_equal(dst, ref)

    dsti = np.zeros((B, Tpad), np.int32)
    if pad_copy_labels_native(dsti, labels_list):
        refi = np.zeros_like(dsti)
        for i, l in enumerate(labels_list):
            refi[i, : l.shape[0]] = l.astype(np.int32)
        np.testing.assert_array_equal(dsti, refi)

    # mismatched dtype falls back cleanly
    assert pad_copy_feats_native(
        np.zeros((1, 4, 2), np.float64), [np.zeros((2, 2), np.float64)]
    ) is False


def test_collate_padded_native_vs_python_batch():
    import numpy as np
    from mucon_tpu.data import collate_padded
    from mucon_tpu.data.general_dataset import Sample
    from mucon_tpu.data.utils import create_tf_input, create_tf_target
    import mucon_tpu.native as native

    rng = np.random.RandomState(1)

    def mk(t, name):
        tr = rng.randint(0, 5, 3).astype(np.int64)
        return Sample(
            feats=rng.randn(t, 8).astype(np.float32),
            gt_label=rng.randint(0, 5, t).astype(np.int64),
            transcript=tr,
            transcript_tf_input=create_tf_input(tr, sos_i=6),
            transcript_tf_target=create_tf_target(tr, eos_i=5),
            video_name=name,
        )

    samples = [mk(48, "a"), mk(31, "b")]
    b1 = collate_padded(samples, n_max=30, pad_multiple=16)
    # force the python fallback
    saved = native._lib
    try:
        native._lib = None
        import os
        os.environ["MUCON_TPU_NO_NATIVE"] = "1"
        b2 = collate_padded(samples, n_max=30, pad_multiple=16)
    finally:
        native._lib = saved
        os.environ.pop("MUCON_TPU_NO_NATIVE", None)
    np.testing.assert_array_equal(b1.feats, b2.feats)
    np.testing.assert_array_equal(b1.gt_label, b2.gt_label)
    np.testing.assert_array_equal(b1.num_frames, b2.num_frames)


def test_f_scores_multi_matches_python():
    """Randomized parity: native multi-threshold f-score == python f_score."""
    import numpy as np
    from mucon_tpu.metrics.fully_supervised import f_score
    from mucon_tpu.native import f_scores_multi_native

    rng = np.random.RandomState(3)
    overlaps = [0.1, 0.25, 0.5]
    for trial in range(40):
        T = rng.randint(5, 200)
        n_cls = rng.randint(2, 6)
        pred = rng.randint(0, n_cls, T)
        gt = rng.randint(0, n_cls, T)
        # make segments realistic: smooth with repeats
        rep = rng.randint(1, 12)
        pred = np.repeat(pred, rep)[:T]
        gt = np.repeat(gt, rep)[:T]
        bg = [0] if trial % 2 else []
        counts = f_scores_multi_native(pred, gt, overlaps, bg)
        if counts is None:
            pytest.skip("native lib unavailable")
        for s, ov in enumerate(overlaps):
            ref = f_score(pred, gt, ov, bg)
            assert tuple(counts[s]) == ref, (trial, ov, tuple(counts[s]), ref)


def test_edit_score_norm_matches_python():
    import numpy as np
    from mucon_tpu.metrics.fully_supervised import edit_score
    from mucon_tpu.native import edit_score_norm_native

    rng = np.random.RandomState(4)
    for trial in range(40):
        T = rng.randint(1, 150)
        pred = np.repeat(rng.randint(0, 5, T), rng.randint(1, 9))[:T]
        gt = np.repeat(rng.randint(0, 5, T), rng.randint(1, 9))[:T]
        bg = [0] if trial % 2 else []
        v = edit_score_norm_native(pred, gt, bg)
        if v is None:
            pytest.skip("native lib unavailable")
        ref = edit_score(pred, gt, norm=True, bg_class=bg)
        assert v == pytest.approx(ref), trial
    # all-background edge: both segmentations empty -> 100
    assert edit_score_norm_native([0, 0], [0, 0], [0]) == pytest.approx(100.0)
