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
