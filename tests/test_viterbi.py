"""Viterbi parity: dense TPU DP vs the host hypothesis-DP oracle."""

import numpy as np
import pytest

from mucon_tpu.decode.grammar import (
    ModifiedPathGrammar,
    SingleTranscriptGrammar,
)
from mucon_tpu.decode.length_model import PoissonModel, poisson_log_table
from mucon_tpu.decode.viterbi_host import ViterbiDecoder
from mucon_tpu.ops.viterbi import dense_viterbi_decode


def _random_problem(rng, T, M, N):
    log_probs = np.log(
        rng.dirichlet(np.ones(M) * 0.3, size=T).astype(np.float64) + 1e-8
    )
    transcript = [int(x) for x in rng.randint(0, M, size=N)]
    lam = np.ones(M)
    for c in transcript:
        lam[c] = rng.uniform(20, T / max(N, 1) * 1.5)
    return log_probs.astype(np.float32), transcript, lam


def _host_decode(log_probs, transcript, lam, S=30):
    vd = ViterbiDecoder(
        SingleTranscriptGrammar(transcript, log_probs.shape[1]),
        PoissonModel(lam),
        frame_sampling=S,
    )
    return vd.decode(np.asarray(log_probs, np.float64))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_dense_matches_host(seed):
    rng = np.random.RandomState(seed)
    T = int(rng.randint(400, 1200))
    M, N = 12, int(rng.randint(2, 7))
    log_probs, transcript, lam = _random_problem(rng, T, M, N)

    h_score, h_labels, h_segs = _host_decode(log_probs, transcript, lam)
    d = dense_viterbi_decode(log_probs, transcript, lam, frame_sampling=30)

    assert np.isfinite(h_score)
    np.testing.assert_allclose(d.score, h_score, rtol=2e-4, atol=2e-3)
    assert list(d.labels) == list(h_labels)
    assert [(s.label, s.length) for s in d.segments] == [
        (s.label, s.length) for s in h_segs
    ]


def test_dense_matches_host_long_video():
    rng = np.random.RandomState(42)
    T, M, N = 5000, 20, 9
    log_probs, transcript, lam = _random_problem(rng, T, M, N)
    h_score, h_labels, _ = _host_decode(log_probs, transcript, lam)
    d = dense_viterbi_decode(log_probs, transcript, lam, frame_sampling=30)
    np.testing.assert_allclose(d.score, h_score, rtol=2e-4, atol=5e-3)
    mismatch = np.mean(np.asarray(d.labels) != np.asarray(h_labels))
    assert mismatch == 0.0


def test_dense_with_padding_invariance():
    # padded frames must not affect the decode
    rng = np.random.RandomState(5)
    T, M, N = 700, 10, 4
    log_probs, transcript, lam = _random_problem(rng, T, M, N)
    d1 = dense_viterbi_decode(log_probs, transcript, lam, frame_sampling=30)
    d2 = dense_viterbi_decode(
        log_probs, transcript, lam, frame_sampling=30, t_pad=1024, n_max=12
    )
    assert d1.score == pytest.approx(d2.score, rel=1e-5)
    assert list(d1.labels) == list(d2.labels)


def test_remainder_quirk_reproduced():
    # T not divisible by frame_sampling: remainder frames carry the LAST
    # label but are placed FIRST (reference viterbi.py:140-158)
    rng = np.random.RandomState(9)
    T, M = 95, 5  # S=30 -> 3 windows + 5 remainder frames
    log_probs = np.full((T, M), -5.0, np.float32)
    log_probs[:30, 0] = -0.1
    log_probs[30:, 1] = -0.1
    transcript = [0, 1]
    lam = np.array([30.0, 60.0, 1, 1, 1])
    h_score, h_labels, h_segs = _host_decode(log_probs, transcript, lam)
    d = dense_viterbi_decode(log_probs, transcript, lam, frame_sampling=30)
    assert list(d.labels) == list(h_labels)
    assert len(d.labels) == T
    # quirk: first 5 frames carry the final label (1)
    assert list(d.labels[:5]) == [1] * 5
    # segment lengths sum to T and the last segment got the remainder
    assert sum(s.length for s in d.segments) == T
    assert [(s.label, s.length) for s in d.segments] == [
        (s.label, s.length) for s in h_segs
    ]


def test_batched_traceback_matches_per_video():
    # host_traceback_batched (vectorized walk) must be element-exact vs
    # the per-video _host_traceback on a heterogeneous padded batch
    from mucon_tpu.ops.viterbi import (
        _dense_viterbi_scan_batched,
        _host_traceback,
        host_traceback_batched,
    )

    rng = np.random.RandomState(11)
    B, M, n_max, t_pad, S = 6, 9, 8, 960, 30
    feats, t_valid, trs, n_valid, lams = [], [], [], [], []
    for _ in range(B):
        T = int(rng.randint(65, 950))  # includes remainder-bearing lengths
        N = int(rng.randint(1, n_max + 1))
        lp, tr, lam = _random_problem(rng, T, M, N)
        feats.append(np.pad(lp, ((0, t_pad - T), (0, 0))))
        t_valid.append(T)
        trs.append(tr + [0] * (n_max - N))
        n_valid.append(N)
        lams.append(lam)
    score, best_l, bps, k_valid = (
        np.asarray(x)
        for x in _dense_viterbi_scan_batched(
            np.asarray(feats),
            np.asarray(t_valid, np.int32),
            np.asarray(trs, np.int32),
            np.asarray(n_valid, np.int32),
            np.asarray(lams, np.float32),
            frame_sampling=S,
            max_len=2000,
            n_max=n_max,
            l_max=2000 // S,
        )
    )
    batched = host_traceback_batched(
        t_valid, trs, n_valid, score, best_l, bps, k_valid, S
    )
    # the on-device walk (fused-eval path) must agree too
    from mucon_tpu.ops.viterbi import (
        positions_to_results,
        traceback_positions_device,
    )

    pos_dev = traceback_positions_device(bps, k_valid, n_valid, best_l)
    deviced = positions_to_results(
        t_valid, trs, n_valid, score, pos_dev, k_valid, S
    )
    for b in range(B):
        ref = _host_traceback(
            t_valid[b],
            list(trs[b][: n_valid[b]]),
            float(score[b]),
            int(best_l[b]),
            bps[b],
            int(k_valid[b]),
            S,
        )
        for got in (batched[b], deviced[b]):
            assert got.score == ref.score
            assert list(got.labels) == list(ref.labels)
            assert [(s.label, s.length) for s in got.segments] == [
                (s.label, s.length) for s in ref.segments
            ]


def test_poisson_table_quirks():
    lam = np.array([30.7, 1.0, 250.0])
    table = poisson_log_table(lam, max_length=300)
    assert np.all(np.isneginf(table[0]))
    # mode of a Poisson(30.7) is near 30
    assert 25 <= int(np.argmax(table[1:, 0])) + 1 <= 35
    pm = PoissonModel(lam, max_length=300)
    assert pm.score(300, 0) == -np.inf
    assert pm.score(50, 0) == table[50, 0]


def test_path_grammar_decode_host():
    # full-grammar decode (research mode) stays host-side and works
    g = ModifiedPathGrammar([[0, 1], [0, 2]], num_classes=4)
    T = 120
    log_probs = np.full((T, 4), -6.0)
    log_probs[:60, 0] = -0.05
    log_probs[60:, 2] = -0.05
    vd = ViterbiDecoder(g, PoissonModel(np.full(4, 60.0)), frame_sampling=30)
    score, labels, segs = vd.decode(log_probs)
    assert [s.label for s in segs] == [0, 2]
    assert np.isfinite(score)


# ---------------------------------------------------------------------------
# Golden-value tests for the grammar family + length models (VERDICT r1 #9):
# every constant below is hand-derived from the reference math
# (grammar.py:40-138, length_model.py:19-39), including the upstream
# quirks (normalization dict keyed by the OBSERVED ngram so unseen-bigram
# lookups always miss, backoff scoring the context's last symbol).
# ---------------------------------------------------------------------------


@pytest.fixture()
def tiny_corpus(tmp_path):
    """Two transcripts 'a b' / 'a c' -> pinned bigram statistics:
    counts: ()=8, (-1,)=4, (0,)=2, (1,)=1, (2,)=1, (-2,)=2,
            (-1,0)=2, (0,1)=1, (0,2)=1, (1,-2)=1, (2,-2)=1
    lambdas: order0 = 2 singletons / 10 = 0.2; order1 = 4/6 = 2/3."""
    f = tmp_path / "transcripts.txt"
    f.write_text("a b\na c\n")
    return str(f), {"a": 0, "b": 1, "c": 2}


def test_ngram_golden_probabilities(tiny_corpus):
    from mucon_tpu.decode.grammar import NGram

    path, l2i = tiny_corpus
    g = NGram(path, l2i, ngram_order=2)
    assert g.lambdas == pytest.approx([0.2, 2.0 / 3.0])

    # seen bigrams: count(ctx+l)/count(ctx) * (1 - lambda1)
    assert g.score((0,), 1) == pytest.approx(np.log(0.5 * (1 / 3)))      # 1/6
    assert g.score((0,), 2) == pytest.approx(np.log(0.5 * (1 / 3)))
    assert g.score((-1,), 0) == pytest.approx(np.log((2 / 4) * (1 / 3)))
    assert g.score((1,), -2) == pytest.approx(np.log(1.0 * (1 / 3)))
    # unigram (empty context): count(l)/count(()) * (1 - lambda0)
    assert g.score((), 0) == pytest.approx(np.log((2 / 8) * 0.8))        # 0.2
    assert g.score((), 1) == pytest.approx(np.log((1 / 8) * 0.8))
    # unseen bigram backoff: p(context[-1] | ()) * lambda1 (normalization
    # lookup misses by construction -> divides by 1)
    assert g.score((0,), -2) == pytest.approx(np.log(0.2 * (2 / 3)))
    assert g.score((1,), 0) == pytest.approx(np.log(0.1 * (2 / 3)))

    # context maintenance: order-2 keeps the last symbol only
    assert g.update_context((0,), 1) == (1,)
    assert g.possible_successors(()) == {0, 1, 2, -2}


def test_ngram_unigram_order(tiny_corpus):
    from mucon_tpu.decode.grammar import NGram

    path, l2i = tiny_corpus
    g = NGram(path, l2i, ngram_order=1)
    # order-1 context is always empty
    assert g.update_context((5,), 1) == ()
    assert g.score((), 0) == pytest.approx(np.log((2 / 8) * (1 - g.lambdas[0])))


def test_ngram_perplexity_golden(tiny_corpus):
    from mucon_tpu.decode.grammar import NGram

    path, l2i = tiny_corpus
    g = NGram(path, l2i, ngram_order=2)
    # per line: p(-1|()) = (4/8)*0.8 = 0.4, p(a|-1) = 1/6,
    # p(b|a) = p(c|a) = 1/6, p(-2|b) = p(-2|c) = 1/3; N = 8 symbols
    expected = (0.4 * (1 / 6) * (1 / 6) * (1 / 3)) ** -0.25
    assert g.perplexity(path, l2i) == pytest.approx(expected)


def test_mean_length_model_golden():
    from mucon_tpu.decode.length_model import MeanLengthModel

    m = MeanLengthModel(num_classes=5, max_length=2000, threshold=200.0,
                        alpha=0.9)
    assert m.score(1, 3) == 0.0
    assert m.score(200, 0) == 0.0          # <= threshold -> free
    assert m.score(201, 0) == pytest.approx(1.0 * np.log(0.9))
    assert m.score(250, 4) == pytest.approx(50.0 * np.log(0.9))
    assert m.score(2001, 0) == -np.inf     # > max_len
    assert m.score(2000, 0) == pytest.approx(1800.0 * np.log(0.9))
    assert m.max_length() == 2000
    assert m.n_classes() == 5


def test_multi_poisson_score_multi():
    from mucon_tpu.decode.length_model import MultiPoissonModel, PoissonModel

    mp = MultiPoissonModel([30.0, 55.0], num_classes=4)
    ref0 = PoissonModel(np.full(4, 30.0, dtype=np.float32))
    ref1 = PoissonModel(np.full(4, 55.0, dtype=np.float32))
    assert mp.score_multi(0, 25, 2) == pytest.approx(ref0.score(25, 2))
    assert mp.score_multi(1, 80, 1) == pytest.approx(ref1.score(80, 1))
    with pytest.raises(NotImplementedError):
        mp.score(10, 0)  # dead path preserved (length_model.py:107-108)


def test_precompute_z_matches_full_t():
    """viterbi_precompute_z (round 5): W tables built from PRE-upsample
    log-probs via exact searchsorted counts must match the full-T window
    sums to f32 reassociation, with identical pois/k_valid — for ragged
    per-video (tz_len, num_frames) pairs including odd lengths."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    from mucon_tpu.models.layers import (
        interpolate_nearest_time,
        nearest_upsample_indices,
    )
    from mucon_tpu.ops.viterbi import viterbi_precompute, viterbi_precompute_z

    rng = np.random.RandomState(7)
    B, Tz, T, M, n_max = 3, 12, 192, 6, 5
    seg_z = jnp.asarray(rng.randn(B, Tz, M).astype(np.float32))
    num_frames = jnp.asarray([192, 177, 101], jnp.int32)  # odd ragged
    tz_len = num_frames // 16
    lam = jnp.asarray(rng.uniform(1, 5, size=(B, M)).astype(np.float32))
    trs = jnp.asarray(rng.randint(0, M, size=(B, n_max)))

    seg_lp_z = jax.nn.log_softmax(seg_z, -1)
    # full-T path: upsample the log-probs (log_softmax commutes with the
    # per-position selection, so upsampling before or after is identical)
    seg_lp = interpolate_nearest_time(seg_lp_z, tz_len, T, num_frames)
    idx = nearest_upsample_indices(tz_len, T, num_frames)

    kw = dict(frame_sampling=10, max_len=120, l_max=12)
    W1, p1, k1 = jax.vmap(partial(viterbi_precompute, **kw))(
        seg_lp, num_frames, trs, lam
    )
    W2, p2, k2 = jax.vmap(partial(viterbi_precompute_z, **kw))(
        seg_lp_z, idx, num_frames, trs, lam
    )
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_allclose(
        np.asarray(W1), np.asarray(W2), rtol=2e-5, atol=2e-5
    )


def test_fused_eval_y_argmax_exact_vs_full_t(tmp_path):
    """The fused eval's argmax-at-Tz + index-gather y labels are EXACTLY
    the full-T argmax (selection commutes with per-position argmax)."""
    import jax

    from mucon_tpu.config import get_cfg_defaults
    from mucon_tpu.data import collate_padded
    from mucon_tpu.data.general_dataset import Sample
    from mucon_tpu.data.utils import create_tf_input, create_tf_target
    from mucon_tpu.models import batch_to_arrays, create_model
    from mucon_tpu.ops.eval_fused import build_fused_eval, unpack_eval_wire

    M, D = 6, 16
    cfg = get_cfg_defaults()
    cfg.merge_from_list([
        "model.ft.stages", "[1, 2, 4]",
        "model.ft.pooling_layers", "[0, 1]",
        "model.ft.hidden_size", "16",
        "model.ft.last_gn_num_groups", "4",
        "model.fs.encoder.hidden_size", "16",
        "model.fs.decoder.hidden_size", "16",
    ])
    rng = np.random.RandomState(0)
    samples = []
    for i in range(3):
        T = int(rng.randint(100, 200))
        tr = rng.randint(0, M, size=4).astype(np.int64)
        samples.append(Sample(
            feats=rng.randn(T, D).astype(np.float32),
            gt_label=rng.randint(0, M, size=T).astype(np.int64),
            transcript=tr,
            transcript_tf_input=create_tf_input(tr, sos_i=M + 1),
            transcript_tf_target=create_tf_target(tr, eos_i=M),
            video_name=f"v{i}",
        ))
    batch = collate_padded(samples, n_max=8, pad_multiple=64)
    model = create_model(cfg, num_classes=M, max_decoding_steps=9,
                         input_feature_size=D)
    import jax as _jax

    params = model.init_params(_jax.random.PRNGKey(0), batch)
    arrays = batch_to_arrays(batch)
    fused = build_fused_eval(model, teacher_forcing=False,
                             frame_sampling=10, max_len=400,
                             use_pallas_viterbi=False)
    out = unpack_eval_wire(
        jax.device_get(fused(params, arrays)), n_steps_dim=9, n_max=8,
        num_frames=batch.num_frames, t_full=int(batch.feats.shape[1]),
    )
    fwd = model.forward(params, arrays, train=False, teacher_forcing=False)
    y_ref = np.argmax(np.asarray(fwd.segmentation), -1)
    np.testing.assert_array_equal(out["y_argmax"], y_ref)
