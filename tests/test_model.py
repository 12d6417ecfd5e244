"""Full-model tests: shapes, padding invariance, decode modes, losses."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mucon_tpu.config import get_cfg_defaults
from mucon_tpu.data import collate_padded
from mucon_tpu.data.general_dataset import Sample
from mucon_tpu.data.utils import create_tf_input, create_tf_target
from mucon_tpu.models import batch_to_arrays, create_model


def small_cfg():
    cfg = get_cfg_defaults()
    cfg.model.ft.stages = [1, 2, 4]
    cfg.model.ft.pooling_layers = [0, 1]  # 4x downsample
    cfg.model.ft.hidden_size = 16
    cfg.model.ft.last_gn_num_groups = 4
    cfg.model.fs.encoder.hidden_size = 16
    cfg.model.fs.decoder.hidden_size = 16
    return cfg


M = 6  # classes
D = 12  # feat dim
NMAX = 8  # max transcript length


def make_sample(rng, T, N, name="v"):
    transcript = rng.randint(0, M, size=N).astype(np.int64)
    return Sample(
        feats=rng.randn(T, D).astype(np.float32),
        gt_label=rng.randint(0, M, size=T).astype(np.int64),
        transcript=transcript,
        transcript_tf_input=create_tf_input(transcript, sos_i=M + 1),
        transcript_tf_target=create_tf_target(transcript, eos_i=M),
        video_name=name,
    )


@pytest.fixture(scope="module")
def model_and_batch():
    cfg = small_cfg()
    rng = np.random.RandomState(0)
    samples = [make_sample(rng, 60, 3, "a"), make_sample(rng, 41, 5, "b")]
    batch = collate_padded(samples, n_max=NMAX, pad_multiple=16)
    model = create_model(cfg, num_classes=M, max_decoding_steps=NMAX + 1,
                         input_feature_size=D)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    return cfg, model, params, batch, samples


def test_forward_shapes(model_and_batch):
    _, model, params, batch, _ = model_and_batch
    fwd = model.forward(params, batch_to_arrays(batch), train=False,
                        teacher_forcing=True)
    B, T = batch.feats.shape[:2]
    S = NMAX + 1
    assert fwd.transcript.shape == (B, S, M + 1)
    assert fwd.lengths.shape == (B, S)
    assert fwd.segmentation.shape == (B, T, M)
    # log-softmax rows sum to 1 in prob space
    p = np.exp(np.asarray(fwd.transcript[0, 0]))
    assert p.sum() == pytest.approx(1.0, rel=1e-4)
    # encoder 4x downsample with floor semantics
    np.testing.assert_array_equal(
        np.asarray(fwd.tz_lengths), batch.num_frames // 4
    )
    # teacher-forced step counts = N + 1
    np.testing.assert_array_equal(
        np.asarray(fwd.n_steps), batch.transcript_len + 1
    )


def test_padding_invariance(model_and_batch):
    """The defining property of the padded batch design: outputs for a video
    are identical whatever batch/padding it is computed in."""
    _, model, params, _, samples = model_and_batch
    b_pair = collate_padded(samples, n_max=NMAX, pad_multiple=64)  # big pad
    b_solo = collate_padded(samples[1:], n_max=NMAX, pad_multiple=16)

    f_pair = model.forward(params, batch_to_arrays(b_pair), train=False,
                           teacher_forcing=True)
    f_solo = model.forward(params, batch_to_arrays(b_solo), train=False,
                           teacher_forcing=True)

    T1 = int(b_solo.num_frames[0])
    np.testing.assert_allclose(
        np.asarray(f_pair.segmentation)[1, :T1],
        np.asarray(f_solo.segmentation)[0, :T1],
        rtol=2e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(f_pair.transcript)[1],
        np.asarray(f_solo.transcript)[0],
        rtol=2e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(f_pair.lengths)[1],
        np.asarray(f_solo.lengths)[0],
        rtol=2e-4, atol=1e-5,
    )


def test_free_decoding_eos(model_and_batch):
    _, model, params, batch, _ = model_and_batch
    fwd = model.forward(params, batch_to_arrays(batch), train=False,
                        teacher_forcing=False)
    n_steps = np.asarray(fwd.n_steps)
    tokens = np.asarray(fwd.tokens)
    S = NMAX + 1
    for i in range(tokens.shape[0]):
        k = int(n_steps[i])
        assert 1 <= k <= S
        # EOS appears exactly at step k-1, or never within S steps
        if k < S:
            assert tokens[i, k - 1] == M
            assert not np.any(tokens[i, : k - 1] == M)


def test_loss_finite_and_grads_flow(model_and_batch):
    cfg, model, params, batch, _ = model_and_batch
    arrays = batch_to_arrays(batch)

    def loss_fn(p):
        fwd = model.forward(p, arrays, rng=jax.random.PRNGKey(1), train=True,
                            teacher_forcing=True)
        return model.loss(fwd, arrays, teacher_forcing=True).main

    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    flat = jax.tree.leaves(jax.tree.map(lambda g: np.abs(np.asarray(g)).sum(), grads))
    total = sum(float(x) for x in flat)
    assert np.isfinite(total) and total > 0
    # the unused attention l3 gets zero grads, like the reference
    g3 = np.asarray(grads["fs_decoder_attention_l3_kernel"])
    assert np.all(g3 == 0)


def test_loss_padding_invariance(model_and_batch):
    cfg, model, params, _, samples = model_and_batch
    b_small = collate_padded(samples, n_max=NMAX, pad_multiple=16)
    b_big = collate_padded(samples, n_max=NMAX, pad_multiple=128)

    def main_loss(b):
        arrays = batch_to_arrays(b)
        fwd = model.forward(params, arrays, train=False, teacher_forcing=True)
        loss = model.loss(fwd, arrays, teacher_forcing=True)
        return float(loss.main), float(loss.mucon_loss), float(loss.smoothing_loss)

    l1, m1, s1 = main_loss(b_small)
    l2, m2, s2 = main_loss(b_big)
    assert l1 == pytest.approx(l2, rel=2e-4)
    assert m1 == pytest.approx(m2, rel=2e-4)
    assert s1 == pytest.approx(s2, rel=2e-4)


def test_loss_components_match_reference_weighting(model_and_batch):
    cfg, model, params, batch, _ = model_and_batch
    arrays = batch_to_arrays(batch)
    fwd = model.forward(params, arrays, train=False, teacher_forcing=True)
    loss = model.loss(fwd, arrays, teacher_forcing=True)
    expected = (
        cfg.model.loss.mul_transcript * float(loss.transcript_loss)
        + cfg.model.loss.mul_length * float(loss.length_loss)
        + cfg.model.loss.mul_mucon * float(loss.mucon_loss)
        + cfg.model.loss.mul_smoothing * float(loss.smoothing_loss)
    )
    assert float(loss.main) == pytest.approx(expected, rel=1e-5)


def test_predict_teacher_forcing_and_free(model_and_batch):
    _, model, params, batch, _ = model_and_batch
    arrays = batch_to_arrays(batch)

    model.set_teacher_forcing(True)
    fwd = model.forward(params, arrays, train=False)
    preds = model.predict(batch, fwd)
    for i, p in enumerate(preds):
        n = int(batch.transcript_len[i])
        assert p.transcript == list(batch.tf_target[i, : n + 1])
        assert p.lengths.shape == (n,)
        assert p.lengths.sum() == pytest.approx(1.0, rel=1e-5)
        assert p.segmentation_logits.shape == (int(batch.num_frames[i]), M)

    model.set_teacher_forcing(False)
    fwd = model.forward(params, arrays, train=False)
    preds = model.predict(batch, fwd)
    for i, p in enumerate(preds):
        k = int(np.asarray(fwd.n_steps)[i])
        assert len(p.transcript) == k
        assert len(p.lengths) == k - 1
    model.set_teacher_forcing(True)


def test_head_order_commutes(model_and_batch):
    """The framewise head's conv-at-Tz-then-upsample fast path (round 5)
    is BITWISE identical to the reference order (upsample features, then
    conv): a positionwise conv and an index-selection commute exactly —
    out[t] = W·z[idx[t]] + b either way.  Grads differ only in the
    summation order of the 16 repeated positions per pooled frame."""
    import mucon_tpu.models.mucon as mucon_mod

    _, model, params, batch, _ = model_and_batch
    arrays = batch_to_arrays(batch)
    f_fast = model.forward(params, arrays, train=False, teacher_forcing=True)
    assert mucon_mod._UPSAMPLE_BEFORE_HEAD is False
    mucon_mod._UPSAMPLE_BEFORE_HEAD = True
    try:
        f_ref = model.forward(params, arrays, train=False,
                              teacher_forcing=True)
    finally:
        mucon_mod._UPSAMPLE_BEFORE_HEAD = False
    np.testing.assert_array_equal(
        np.asarray(f_fast.segmentation), np.asarray(f_ref.segmentation)
    )

    # grads: same up to reassociation of the 16-way repeat sums
    def loss_fn(p, model_):
        fwd = model_.forward(p, arrays, rng=jax.random.PRNGKey(0),
                             train=True, teacher_forcing=True)
        return model_.loss(fwd, arrays, teacher_forcing=True).main

    g_fast = jax.grad(loss_fn)(params, model)
    mucon_mod._UPSAMPLE_BEFORE_HEAD = True
    try:
        g_ref = jax.grad(loss_fn)(params, model)
    finally:
        mucon_mod._UPSAMPLE_BEFORE_HEAD = False
    for kf, (a, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_fast),
        zip(jax.tree.leaves(g_fast), jax.tree.leaves(g_ref)),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
            err_msg=str(kf[0]),
        )


def test_remat_encoder_matches(model_and_batch):
    cfg, model, params, batch, _ = model_and_batch
    import jax
    from mucon_tpu.models import batch_to_arrays, create_model

    cfg2 = cfg.clone()
    cfg2.tpu.remat = True
    model2 = create_model(cfg2, num_classes=M, max_decoding_steps=NMAX + 1,
                          input_feature_size=D)
    arrays = batch_to_arrays(batch)
    f1 = model.forward(params, arrays, train=False, teacher_forcing=True)
    f2 = model2.forward(params, arrays, train=False, teacher_forcing=True)
    np.testing.assert_allclose(
        np.asarray(f2.segmentation), np.asarray(f1.segmentation),
        rtol=1e-5, atol=1e-6,
    )

    # grads flow through the rematted stack
    def loss_fn(p):
        fwd = model2.forward(p, arrays, rng=jax.random.PRNGKey(0), train=True,
                             teacher_forcing=True)
        return model2.loss(fwd, arrays, teacher_forcing=True).main

    g = jax.grad(loss_fn)(params)
    total = sum(float(np.abs(np.asarray(x)).sum()) for x in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0


@pytest.mark.slow  # full-model jit compiles dominate on this 1-core box (FAST-tier budget, VERDICT r3 #6)
def test_scan_unroll_preserves_semantics(model_and_batch):
    """tpu.scan_unroll only restructures the BiLSTM/decoder scan loops:
    outputs and grads match to float-reassociation noise (~1e-7 — XLA
    fuses the unrolled bodies differently) for any unroll factor (the
    TPU 'auto' default is 8)."""
    cfg, model, params, batch, _ = model_and_batch
    arrays = batch_to_arrays(batch)
    f1 = model.forward(params, arrays, train=False, teacher_forcing=True)

    def grads(m):
        def loss_fn(p):
            fwd = m.forward(p, arrays, rng=jax.random.PRNGKey(3), train=True,
                            teacher_forcing=True)
            return m.loss(fwd, arrays, teacher_forcing=True).main
        return jax.grad(loss_fn)(params)

    g1 = grads(model)
    for unroll in (4, 8):
        cfg2 = cfg.clone()
        cfg2.tpu.scan_unroll = unroll
        model2 = create_model(cfg2, num_classes=M, max_decoding_steps=NMAX + 1,
                              input_feature_size=D)
        f2 = model2.forward(params, arrays, train=False, teacher_forcing=True)
        np.testing.assert_allclose(
            np.asarray(f2.transcript), np.asarray(f1.transcript),
            rtol=1e-6, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(f2.segmentation), np.asarray(f1.segmentation),
            rtol=1e-6, atol=1e-6,
        )
        g2 = grads(model2)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            )


def test_scan_unroll_auto_resolution():
    from unittest import mock

    from mucon_tpu.models import mucon as mucon_mod
    from mucon_tpu.models.mucon import resolve_scan_unroll

    assert resolve_scan_unroll("auto") == 1  # tests force CPU backend
    assert resolve_scan_unroll(4) == 4
    assert resolve_scan_unroll(0) == 1
    with pytest.raises(ValueError):
        resolve_scan_unroll("fast")
    # accelerator policy: unroll 8 up to the measured B=16 crossover
    with mock.patch.object(
        mucon_mod.jax, "default_backend", return_value="tpu"
    ):
        assert resolve_scan_unroll("auto", batch_size=8) == 8
        assert resolve_scan_unroll("auto", batch_size=16) == 8
        assert resolve_scan_unroll("auto", batch_size=32) == 1
        assert resolve_scan_unroll("auto") == 8  # unknown B: small-B default
        assert resolve_scan_unroll(2, batch_size=128) == 2  # int forces


@pytest.mark.parametrize("ft_type,expect_pool", [("mstcnpp", 4), ("noft", 1)])
def test_alternate_ft_types_forward_and_loss(model_and_batch, ft_type, expect_pool):
    cfg, _, _, batch, _ = model_and_batch
    cfg2 = cfg.clone()
    cfg2.model.ft.type = ft_type
    model = create_model(cfg2, num_classes=M, max_decoding_steps=NMAX + 1,
                         input_feature_size=D)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    arrays = batch_to_arrays(batch)
    fwd = model.forward(params, arrays, train=False, teacher_forcing=True)
    # mstcnpp pools like wavenet (layers 0,1 in the small cfg); noft keeps T
    np.testing.assert_array_equal(
        np.asarray(fwd.tz_lengths), batch.num_frames // expect_pool
    )
    loss = model.loss(fwd, arrays, teacher_forcing=True)
    assert np.isfinite(float(loss.main))

    def loss_fn(p):
        f = model.forward(p, arrays, rng=jax.random.PRNGKey(1), train=True,
                          teacher_forcing=True)
        return model.loss(f, arrays, teacher_forcing=True).main

    g = jax.grad(loss_fn)(params)
    total = sum(float(np.abs(np.asarray(x)).sum()) for x in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0


def test_early_exit_free_decode_matches_scan(model_and_batch):
    """EOS-terminated while_loop free decode == full-S scan on every
    consumed output (prefix up to each video's n_steps)."""
    cfg, model, params, batch, _ = model_and_batch
    import jax
    from mucon_tpu.models.model import batch_to_arrays
    from mucon_tpu.models.mucon import build_model

    arrays = batch_to_arrays(batch)

    outs = {}
    for flag in (True, False):
        c = cfg.clone()
        c.tpu.early_exit_decode = flag
        net = build_model(c, model.num_classes, model.max_decoding_steps,
                          model.input_feature_size)
        outs[flag] = jax.jit(
            lambda p, a, n=net: n.apply(
                {"params": p}, a["feats"], a["num_frames"], a["tf_input"],
                a["transcript_len"], train=False, teacher_forcing=False,
            )
        )(params, arrays)

    a, b = outs[True], outs[False]
    np.testing.assert_array_equal(np.asarray(a.n_steps), np.asarray(b.n_steps))
    for i in range(batch.batch_size):
        n = int(a.n_steps[i])
        np.testing.assert_allclose(
            np.asarray(a.transcript[i, :n]), np.asarray(b.transcript[i, :n]),
            rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(a.tokens[i, :n]), np.asarray(b.tokens[i, :n]))
        np.testing.assert_allclose(
            np.asarray(a.lengths[i, : max(n - 1, 0)]),
            np.asarray(b.lengths[i, : max(n - 1, 0)]), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(a.segmentation), np.asarray(b.segmentation), rtol=1e-6)

    # force an ACTUAL early exit: bias transcript_out hard toward EOS so
    # every video emits it at step 0 and the while_loop stops immediately
    import jax.numpy as jnp

    p_eos = jax.tree.map(lambda x: x, params)
    bias = np.zeros(M + 1, np.float32)
    bias[M] = 1e4
    p_eos["decoder"]["transcript_out"]["bias"] = (
        p_eos["decoder"]["transcript_out"]["bias"] + jnp.asarray(bias)
    )
    arrays = batch_to_arrays(batch)
    outs2 = {}
    for flag in (True, False):
        c = cfg.clone()
        c.tpu.early_exit_decode = flag
        net = build_model(c, model.num_classes, model.max_decoding_steps,
                          model.input_feature_size)
        outs2[flag] = jax.jit(
            lambda p, a, n=net: n.apply(
                {"params": p}, a["feats"], a["num_frames"], a["tf_input"],
                a["transcript_len"], train=False, teacher_forcing=False,
            )
        )(p_eos, arrays)
    a2, b2 = outs2[True], outs2[False]
    assert np.all(np.asarray(a2.n_steps) == 1)  # EOS at step 0 everywhere
    np.testing.assert_array_equal(np.asarray(a2.n_steps), np.asarray(b2.n_steps))
    np.testing.assert_allclose(
        np.asarray(a2.transcript[:, :1]), np.asarray(b2.transcript[:, :1]),
        rtol=1e-6, atol=1e-6)


def test_in_proj_mm_dtype_resolution_and_numerics(model_and_batch):
    """tpu.in_proj_mm_dtype: "auto" follows compute_dtype; explicit
    "bfloat16" targets ONLY the D->H input projection (the kernel paths'
    [B*T x D] matmul — 50% of forward FLOPs at the flagship shapes);
    explicit "float32" keeps f32 matmuls even under bf16 compute."""
    cfg, model, params, batch, _ = model_and_batch

    def resolved(knob, compute="float32"):
        c = cfg.clone()
        c.tpu.in_proj_mm_dtype = knob
        c.tpu.compute_dtype = compute
        m = create_model(c, num_classes=M, max_decoding_steps=NMAX + 1,
                         input_feature_size=D)
        return m, m._in_proj_mm_dtype()

    assert resolved("auto")[1] is None
    assert resolved("auto", "bfloat16")[1] == jnp.bfloat16
    assert resolved("bfloat16")[1] == jnp.bfloat16
    assert resolved("float32", "bfloat16")[1] is None

    ft = params["ft"]
    w, b = ft["Conv1x1_0"]["kernel"], ft["Conv1x1_0"]["bias"]
    feats = jnp.asarray(batch.feats)

    m32, _ = resolved("float32")
    mbf, _ = resolved("bfloat16")
    y32 = np.asarray(m32._in_projection(feats, w, b))
    # bf16 operands, f32 accumulation: output stays f32 and tracks the
    # f32 matmul to bf16 mantissa precision
    ybf = mbf._in_projection(feats, w, b)
    assert ybf.dtype == jnp.float32
    scale = np.abs(y32).max() + 1e-9
    assert np.abs(np.asarray(ybf) - y32).max() / scale < 2e-2
    # bf16-RESIDENT feats (the bf16 feature wire's cached form) feed the
    # bf16 matmul with no upcast and land within the same tolerance
    ybf_res = mbf._in_projection(feats.astype(jnp.bfloat16), w, b)
    assert ybf_res.dtype == jnp.float32
    assert np.abs(np.asarray(ybf_res) - y32).max() / scale < 2e-2
