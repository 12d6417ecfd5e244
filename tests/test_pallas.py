"""Pallas kernel parity vs the XLA reference paths (interpret mode on CPU)."""

import numpy as np
import pytest

pytestmark = pytest.mark.interpret  # CPU interpret-mode kernel oracle tier (slow)
import jax
import jax.numpy as jnp

from mucon_tpu.models.temporal import WaveNetBlock
from mucon_tpu.ops.wavenet_pallas_v2 import (
    pack_wavenet_params,
    wavenet_stack_pallas_v2,
)


def test_wavenet_stack_kernel_matches_flax():
    rng = np.random.RandomState(0)
    B, T, CIN, C = 2, 64, 8, 128
    stages = (1, 2, 4)
    pooling_layers = (0, 1)
    lengths = np.array([64, 41], np.int32)
    xs = rng.randn(B, T, CIN).astype(np.float32)

    block = WaveNetBlock(
        in_channels=CIN,
        stages=stages,
        out_dims=C,
        pooling_layers=pooling_layers,
        dropout_rate=0.0,
    )
    variables = block.init(
        jax.random.PRNGKey(0), jnp.asarray(xs), jnp.asarray(lengths), False
    )
    params = variables["params"]
    ref_out, ref_len = block.apply(
        variables, jnp.asarray(xs), jnp.asarray(lengths), False
    )

    # kernel input = after the block's in-projection + relu + mask
    w_in = params["Conv1x1_0"]["kernel"]
    b_in = params["Conv1x1_0"]["bias"]
    x_proj = jnp.maximum(jnp.asarray(xs) @ w_in + b_in, 0.0)

    w3, b3, w1, b1, w_last, b_last = pack_wavenet_params(params, len(stages))
    z, out_len = wavenet_stack_pallas_v2(
        x_proj,
        jnp.asarray(lengths),
        w3, b3, w1, b1, w_last, b_last,
        stages=stages,
        pooling_layers=pooling_layers,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out_len), np.asarray(ref_len))
    np.testing.assert_allclose(
        np.asarray(z), np.asarray(ref_out), rtol=2e-4, atol=1e-5
    )


def test_wavenet_stack_kernel_dilation_exceeds_t():
    # late layers with dilation >= pooled length must still match
    rng = np.random.RandomState(1)
    B, T, C = 1, 32, 128
    stages = (1, 4, 64)
    pooling_layers = (0, 1)
    lengths = np.array([32], np.int32)
    x = rng.randn(B, T, C).astype(np.float32)

    block = WaveNetBlock(
        in_channels=C, stages=stages, out_dims=C,
        pooling_layers=pooling_layers, dropout_rate=0.0,
    )
    variables = block.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(lengths), False
    )
    params = variables["params"]
    ref_out, _ = block.apply(variables, jnp.asarray(x), jnp.asarray(lengths), False)

    w_in = params["Conv1x1_0"]["kernel"]
    b_in = params["Conv1x1_0"]["bias"]
    x_proj = jnp.maximum(jnp.asarray(x) @ w_in + b_in, 0.0)
    w3, b3, w1, b1, w_last, b_last = pack_wavenet_params(params, len(stages))
    z, _ = wavenet_stack_pallas_v2(
        x_proj, jnp.asarray(lengths), w3, b3, w1, b1, w_last, b_last,
        stages=stages, pooling_layers=pooling_layers, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref_out), rtol=2e-4, atol=1e-5)


def test_model_forward_with_pallas_encoder_matches():
    from mucon_tpu.data import collate_padded
    from mucon_tpu.models import batch_to_arrays, create_model
    from tests.test_model import M, D, NMAX, make_sample, small_cfg

    cfg = small_cfg()
    rng = np.random.RandomState(3)
    samples = [make_sample(rng, 64, 3, "a"), make_sample(rng, 41, 4, "b")]
    batch = collate_padded(samples, n_max=NMAX, pad_multiple=16)
    model = create_model(cfg, num_classes=M, max_decoding_steps=NMAX + 1,
                         input_feature_size=D)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    arrays = batch_to_arrays(batch)

    f_xla = model.forward(params, arrays, train=False, teacher_forcing=True,
                          use_pallas=False)
    f_pls = model.forward(params, arrays, train=False, teacher_forcing=True,
                          use_pallas=True)
    np.testing.assert_allclose(
        np.asarray(f_pls.segmentation), np.asarray(f_xla.segmentation),
        rtol=2e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(f_pls.transcript), np.asarray(f_xla.transcript),
        rtol=2e-4, atol=1e-4,
    )


def test_viterbi_pallas_kernel_matches_scan():
    from functools import partial as _partial
    from mucon_tpu.ops.viterbi import (
        _dense_viterbi_scan, viterbi_precompute,
    )
    from mucon_tpu.ops.viterbi_pallas import dense_viterbi_pallas

    rng = np.random.RandomState(0)
    B, T, M, S = 3, 600, 10, 30
    max_len, l_max = 2000, 2000 // 30
    n_max = 6
    log_probs = np.log(
        rng.dirichlet(np.ones(M), size=(B, T)).astype(np.float64) + 1e-8
    ).astype(np.float32)
    t_valid = np.array([600, 431, 299], np.int32)
    transcripts = rng.randint(0, M, size=(B, n_max)).astype(np.int32)
    n_valid = np.array([4, 6, 2], np.int32)
    lambdas = rng.uniform(20, 200, size=(B, M)).astype(np.float32)

    scan_fn = jax.vmap(
        _partial(_dense_viterbi_scan, frame_sampling=S, max_len=max_len,
                 n_max=n_max, l_max=l_max)
    )
    s_score, s_bestl, s_bps, s_kv = scan_fn(
        jnp.asarray(log_probs), jnp.asarray(t_valid),
        jnp.asarray(transcripts), jnp.asarray(n_valid), jnp.asarray(lambdas)
    )

    pre = jax.vmap(
        _partial(viterbi_precompute, frame_sampling=S, max_len=max_len,
                 l_max=l_max)
    )
    W, pois, k_valid = pre(
        jnp.asarray(log_probs), jnp.asarray(t_valid),
        jnp.asarray(transcripts), jnp.asarray(lambdas)
    )
    p_score, p_bestl, p_bps = dense_viterbi_pallas(
        W, pois, k_valid, jnp.asarray(n_valid),
        frame_sampling=S, max_len=max_len, interpret=True,
    )

    np.testing.assert_allclose(np.asarray(p_score), np.asarray(s_score),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(p_bestl), np.asarray(s_bestl))
    # backpointers must agree on every live window at positions n >= 1
    for b in range(B):
        kv = int(np.asarray(s_kv)[b])
        np.testing.assert_array_equal(
            np.asarray(p_bps)[b, : kv - 1, 1:],
            np.asarray(s_bps)[b, : kv - 1, 1:],
        )


def test_viterbi_batched_gate_routes_bench_shape():
    # the whole-batch DP program must stay routed at the bench/eval
    # shapes (8.65x measured on v5e); the grid fallback only engages
    # past the 14 MB VMEM gate
    from mucon_tpu.ops.viterbi_pallas import viterbi_batched_vmem_bytes

    gate = 14 << 20
    # bench eval: B=128, Tpad=2560, S=30 -> K=85; n_max=30, l_max=66
    assert viterbi_batched_vmem_bytes(128, 85, 30, 66) <= gate
    # 10k-frame eval: B=32, T=10240 -> K=341
    assert viterbi_batched_vmem_bytes(32, 341, 30, 66) <= gate
    # tiny CPU/interpret shapes
    assert viterbi_batched_vmem_bytes(4, 30, 6, 66) <= gate
    # a genuinely oversized batch falls back to the per-video grid
    assert viterbi_batched_vmem_bytes(1024, 341, 30, 66) > gate


def test_viterbi_pallas_batched_matches_scan():
    from functools import partial as _partial
    from mucon_tpu.ops.viterbi import (
        _dense_viterbi_scan, viterbi_precompute,
    )
    from mucon_tpu.ops.viterbi_pallas import dense_viterbi_pallas_batched

    rng = np.random.RandomState(7)
    B, T, M, S = 4, 600, 10, 30
    max_len, l_max = 2000, 2000 // 30
    n_max = 6
    log_probs = np.log(
        rng.dirichlet(np.ones(M), size=(B, T)).astype(np.float64) + 1e-8
    ).astype(np.float32)
    t_valid = np.array([600, 431, 299, 62], np.int32)
    transcripts = rng.randint(0, M, size=(B, n_max)).astype(np.int32)
    n_valid = np.array([4, 6, 2, 1], np.int32)
    lambdas = rng.uniform(20, 200, size=(B, M)).astype(np.float32)

    scan_fn = jax.vmap(
        _partial(_dense_viterbi_scan, frame_sampling=S, max_len=max_len,
                 n_max=n_max, l_max=l_max)
    )
    s_score, s_bestl, s_bps, s_kv = scan_fn(
        jnp.asarray(log_probs), jnp.asarray(t_valid),
        jnp.asarray(transcripts), jnp.asarray(n_valid), jnp.asarray(lambdas)
    )

    pre = jax.vmap(
        _partial(viterbi_precompute, frame_sampling=S, max_len=max_len,
                 l_max=l_max)
    )
    W, pois, k_valid = pre(
        jnp.asarray(log_probs), jnp.asarray(t_valid),
        jnp.asarray(transcripts), jnp.asarray(lambdas)
    )
    p_score, p_bestl, p_bps = dense_viterbi_pallas_batched(
        W, pois, k_valid, jnp.asarray(n_valid),
        frame_sampling=S, max_len=max_len, interpret=True,
    )

    np.testing.assert_allclose(np.asarray(p_score), np.asarray(s_score),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(p_bestl), np.asarray(s_bestl))
    for b in range(B):
        kv = int(np.asarray(s_kv)[b])
        np.testing.assert_array_equal(
            np.asarray(p_bps)[b, : kv - 1, 1:],
            np.asarray(s_bps)[b, : kv - 1, 1:],
        )


def test_fused_eval_with_pallas_viterbi_matches():
    from mucon_tpu.data import collate_padded
    from mucon_tpu.models import batch_to_arrays, create_model
    from mucon_tpu.ops.eval_fused import build_fused_eval
    from tests.test_model import M, D, NMAX, make_sample, small_cfg

    cfg = small_cfg()
    rng = np.random.RandomState(11)
    samples = [make_sample(rng, 120, 3, "a"), make_sample(rng, 90, 4, "b")]
    batch = collate_padded(samples, n_max=NMAX, pad_multiple=16)
    model = create_model(cfg, num_classes=M, max_decoding_steps=NMAX + 1,
                         input_feature_size=D)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    arrays = batch_to_arrays(batch)

    from mucon_tpu.ops.eval_fused import unpack_eval_wire

    f_scan = build_fused_eval(model, False, frame_sampling=10)
    f_pls = build_fused_eval(model, False, frame_sampling=10,
                             use_pallas_viterbi=True)
    a = unpack_eval_wire(jax.device_get(f_scan(params, arrays)),
                         n_steps_dim=NMAX + 1, n_max=NMAX)
    b = unpack_eval_wire(jax.device_get(f_pls(params, arrays)),
                         n_steps_dim=NMAX + 1, n_max=NMAX)
    np.testing.assert_allclose(b["vit_score"], a["vit_score"], rtol=1e-5,
                               atol=1e-4)
    np.testing.assert_array_equal(b["vit_best_l"], a["vit_best_l"])
    np.testing.assert_array_equal(b["y_argmax_z"], a["y_argmax_z"])


def test_wavenet_stack_v2_bf16_close_to_f32():
    """bf16 MXU mode of the eval kernel: f32-accumulated bf16 matmuls stay
    within bf16 rounding of the f32 kernel (residual state is f32)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mucon_tpu.models.layers import mask_time
    from mucon_tpu.models.temporal import WaveNetBlock
    from mucon_tpu.ops.wavenet_pallas_v2 import pack_wavenet_params
    from mucon_tpu.ops.wavenet_pallas_v2 import wavenet_stack_pallas_v2

    STAGES, POOLS, B, T, C = (1, 2, 4), (0, 1), 2, 64, 16
    rng = np.random.RandomState(0)
    ln = jnp.asarray([50, 64], jnp.int32)
    x = mask_time(jnp.asarray(rng.randn(B, T, C).astype(np.float32)), ln)
    block = WaveNetBlock(in_channels=C, stages=STAGES, out_dims=C,
                         pooling_layers=POOLS, dropout_rate=0.0)
    v = block.init(jax.random.PRNGKey(0), x, ln, False)
    pk = pack_wavenet_params(v["params"], len(STAGES))
    z32, l32 = wavenet_stack_pallas_v2(
        x, ln, *pk, stages=STAGES, pooling_layers=POOLS, interpret=True)
    z16, l16 = wavenet_stack_pallas_v2(
        x, ln, *pk, stages=STAGES, pooling_layers=POOLS, interpret=True,
        mm_dtype=jnp.bfloat16)
    assert np.array_equal(np.asarray(l32), np.asarray(l16))
    scale = float(jnp.max(jnp.abs(z32))) + 1e-9
    assert float(jnp.max(jnp.abs(z32 - z16))) / scale < 0.02


def test_wavenet_stack_v2_sliced_matches_unsliced():
    """Batch slicing (VMEM fit for large-B eval) is bitwise-transparent:
    videos are row-independent through the stack."""
    from mucon_tpu.ops.wavenet_pallas_v2 import (
        plan_eval_slices,
        wavenet_stack_pallas_v2,
        wavenet_stack_pallas_v2_sliced,
    )

    # real-shape planning: bench eval (B=128, T=2048) slices; the validated
    # whole-batch shape (B=8, T=2048) stays unsliced; nothing fits -> None
    assert plan_eval_slices(128, 2048, 128) > 1
    assert plan_eval_slices(8, 2048, 128) == 1
    assert plan_eval_slices(4, 2048, 128, budget=1024) is None

    rng = np.random.RandomState(9)
    B, T, C = 4, 64, 128
    stages = (1, 2, 4)
    pools = (0, 1)
    lengths = jnp.asarray([64, 41, 17, 60], jnp.int32)
    x = rng.randn(B, T, C).astype(np.float32)
    x = jnp.asarray(x * (np.arange(T)[None, :, None] < np.asarray(lengths)[:, None, None]))
    pk = [jnp.asarray(rng.randn(*s).astype(np.float32) * 0.05) for s in
          [(3, 3, C, C), (3, C), (3, C, C), (3, C), (C, C), (C,)]]

    z0, l0 = wavenet_stack_pallas_v2(
        x, lengths, *pk, stages=stages, pooling_layers=pools, interpret=True)
    # budget forcing 2 slices of 2 videos
    per_video = T * C * 4 * 3
    out = wavenet_stack_pallas_v2_sliced(
        x, lengths, *pk, stages=stages, pooling_layers=pools, interpret=True,
        slice_budget=2 * per_video)
    z_s, l_s = out
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l_s))
    np.testing.assert_array_equal(np.asarray(z0), np.asarray(z_s))


def test_bilstm_recurrence_kernel_matches_scan():
    """Fused BiLSTM recurrence kernel (ops/lstm_pallas.py) == the lax.scan
    twin AND MaskedBiLSTM's fused scan given the same folded projections,
    including state freezing at ragged lengths."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from mucon_tpu.ops.lstm_pallas import (
        bilstm_recurrence_pallas,
        bilstm_recurrence_xla,
    )

    rng = np.random.RandomState(3)
    T, B, H = 24, 3, 16
    xp = jnp.asarray(rng.randn(T, 2, B, 4 * H).astype(np.float32) * 0.5)
    lengths = np.array([24, 11, 1])
    m = jnp.asarray(
        (np.arange(T)[:, None] < lengths[None, :]).astype(np.float32)
    )
    whh = jnp.asarray(rng.randn(2, H, 4 * H).astype(np.float32) * 0.2)

    o_k, h_k, c_k = bilstm_recurrence_pallas(xp, m, whh, interpret=True)
    o_x, h_x, c_x = bilstm_recurrence_xla(xp, m, whh)
    for a, b in ((o_k, o_x), (h_k, h_x), (c_k, c_x)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
        )
    # state froze at each video's last valid frame
    frozen = np.asarray(o_k)[lengths[1]:, 0, 1, :]
    np.testing.assert_allclose(
        frozen,
        np.broadcast_to(
            np.asarray(o_k)[lengths[1] - 1, 0, 1, :], frozen.shape
        ),
        rtol=0, atol=0,
    )


def test_masked_bilstm_module_kernel_path_matches_scan():
    """MaskedBiLSTM(use_pallas=True) == the scan path through the MODULE
    (b_hh folding, valid-prefix reverse, output concat, final h/c)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from mucon_tpu.models.lstm import MaskedBiLSTM

    rng = np.random.RandomState(7)
    B, T, I, H = 3, 18, 6, 8
    lengths = jnp.asarray(np.array([18, 9, 2]))
    xs = jnp.asarray(rng.randn(B, T, I).astype(np.float32))

    base = MaskedBiLSTM(input_size=I, hidden_size=H)
    params = base.init(jax.random.PRNGKey(0), xs, lengths)["params"]

    out_s, (h_s, c_s) = base.apply({"params": params}, xs, lengths)
    # use_pallas=True on CPU -> interpret mode (resolve_pallas_flag)
    kern = MaskedBiLSTM(input_size=I, hidden_size=H, use_pallas=True)
    out_k, (h_k, c_k) = kern.apply({"params": params}, xs, lengths)

    for a, b in ((out_k, out_s), (h_k, h_s), (c_k, c_s)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
        )


def test_model_forward_with_lstm_kernel_matches_scan():
    """Full MuCon eval forward with tpu.use_pallas_lstm=True (interpret)
    == the scan path: exercises the MuConNet call-site gating (train
    traces must NOT route — the kernel has no VJP)."""
    import numpy as np
    import jax
    from tests.test_model import M, NMAX, D, make_sample, small_cfg
    from mucon_tpu.data import collate_padded
    from mucon_tpu.models import batch_to_arrays, create_model

    rng = np.random.RandomState(11)
    samples = [make_sample(rng, 60, 3, "a"), make_sample(rng, 41, 5, "b")]
    batch = collate_padded(samples, n_max=NMAX, pad_multiple=16)

    def build(flag):
        cfg = small_cfg()
        cfg.tpu.use_pallas_lstm = flag
        return create_model(cfg, num_classes=M, max_decoding_steps=NMAX + 1,
                            input_feature_size=D)

    base = build(False)
    kern = build(True)
    params = base.init_params(jax.random.PRNGKey(0), batch)
    arrays = batch_to_arrays(batch)

    for tf in (True, False):
        f0 = base.forward(params, arrays, train=False, teacher_forcing=tf)
        f1 = kern.forward(params, arrays, train=False, teacher_forcing=tf)
        for a, b in zip(jax.tree.leaves(f0), jax.tree.leaves(f1)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
            )

    # train trace must not hit the kernel (it would fail under jax.grad)
    def loss_of(mdl):
        def f(p):
            fwd = mdl.forward(p, arrays, rng=jax.random.PRNGKey(1),
                              train=True, teacher_forcing=True)
            return mdl.loss(fwd, arrays, teacher_forcing=True).main
        return f

    g0 = jax.grad(loss_of(base))(params)
    g1 = jax.grad(loss_of(kern))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_mstcnpp_stack_kernel_matches_flax():
    """Fused MSTCN++ stage kernel == MSTCNPPFirstStage (eval), ragged
    lengths + pooling."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from mucon_tpu.models.temporal import MSTCNPPFirstStage
    from mucon_tpu.ops.mstcnpp_pallas import (
        mstcnpp_stack_pallas_sliced,
        pack_mstcnpp_params,
    )

    rng = np.random.RandomState(5)
    B, T, CIN, C, L = 2, 64, 8, 16, 3
    pooling = (0, 1)
    lengths = np.array([64, 37], np.int32)
    xs = rng.randn(B, T, CIN).astype(np.float32)

    stage = MSTCNPPFirstStage(
        input_dim=CIN, num_layers=L, num_f_maps=C, output_dim=C,
        pooling_layers=pooling,
    )
    variables = stage.init(
        jax.random.PRNGKey(0), jnp.asarray(xs), jnp.asarray(lengths), False
    )
    params = variables["params"]
    ref_out, ref_len = stage.apply(
        variables, jnp.asarray(xs), jnp.asarray(lengths), False
    )

    w_in = params["Conv1x1_0"]["kernel"]
    b_in = params["Conv1x1_0"]["bias"]
    m = (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32)
    x_proj = (jnp.asarray(xs) @ w_in + b_in) * m[:, :, None]
    packed = pack_mstcnpp_params(params, L)
    out, out_len = mstcnpp_stack_pallas_sliced(
        x_proj, jnp.asarray(lengths), *packed,
        num_layers=L, pooling_layers=pooling, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out_len), np.asarray(ref_len))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_out), rtol=1e-5, atol=1e-5
    )


def test_model_forward_mstcnpp_kernel_matches_xla():
    """create_model(ft.type=mstcnpp) with use_pallas=True (interpret) ==
    the XLA forward, teacher-forced and free decode."""
    import numpy as np
    import jax
    from tests.test_model import M, NMAX, D, make_sample, small_cfg
    from mucon_tpu.data import collate_padded
    from mucon_tpu.models import batch_to_arrays, create_model

    rng = np.random.RandomState(13)
    samples = [make_sample(rng, 60, 3, "a"), make_sample(rng, 41, 5, "b")]
    batch = collate_padded(samples, n_max=NMAX, pad_multiple=16)

    def build(flag):
        cfg = small_cfg()
        cfg.model.ft.type = "mstcnpp"
        cfg.tpu.use_pallas = flag
        return create_model(cfg, num_classes=M, max_decoding_steps=NMAX + 1,
                            input_feature_size=D)

    base = build(False)
    kern = build(True)
    params = base.init_params(jax.random.PRNGKey(0), batch)
    arrays = batch_to_arrays(batch)
    for tf in (True, False):
        f0 = base.forward(params, arrays, train=False, teacher_forcing=tf)
        f1 = kern.forward(params, arrays, train=False, teacher_forcing=tf)
        for a, b in zip(jax.tree.leaves(f0), jax.tree.leaves(f1)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
            )


def test_bilstm_train_kernel_values_and_grads():
    """Trainable fused BiLSTM recurrence (custom VJP, reverse-chain
    backward program): values == the eval kernel/scan twin, grads ==
    XLA autodiff of the twin, including state freezing at ragged
    lengths."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from mucon_tpu.ops.lstm_pallas import (
        bilstm_recurrence_train,
        bilstm_recurrence_xla,
    )

    rng = np.random.RandomState(5)
    T, B, H = 24, 3, 16
    xp = jnp.asarray(rng.randn(T, 2, B, 4 * H).astype(np.float32) * 0.5)
    lengths = np.array([24, 11, 1])
    m = jnp.asarray(
        (np.arange(T)[:, None] < lengths[None, :]).astype(np.float32)
    )
    whh = jnp.asarray(rng.randn(2, H, 4 * H).astype(np.float32) * 0.2)

    o_k, h_k, c_k = bilstm_recurrence_train(True, xp, m, whh)
    o_x, h_x, c_x = bilstm_recurrence_xla(xp, m, whh)
    for a, b in ((o_k, o_x), (h_k, h_x), (c_k, c_x)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
        )

    w_o = jnp.asarray(rng.randn(T, 2, B, H).astype(np.float32))
    w_h = jnp.asarray(rng.randn(2, B, H).astype(np.float32))
    w_c = jnp.asarray(rng.randn(2, B, H).astype(np.float32))

    def loss_k(xp, whh):
        o, h, c = bilstm_recurrence_train(True, xp, m, whh)
        return jnp.sum(o * w_o) + jnp.sum(h * w_h) + jnp.sum(c * w_c)

    def loss_x(xp, whh):
        o, h, c = bilstm_recurrence_xla(xp, m, whh)
        return jnp.sum(o * w_o) + jnp.sum(h * w_h) + jnp.sum(c * w_c)

    gk = jax.grad(loss_k, argnums=(0, 1))(xp, whh)
    gx = jax.grad(loss_x, argnums=(0, 1))(xp, whh)
    for name, a, b in zip(("xp", "w_hh"), gk, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=f"grad mismatch: {name}",
        )


def test_masked_bilstm_module_train_kernel_grads_match_scan():
    """MaskedBiLSTM(kernel_differentiable=True) through the MODULE: values
    AND parameter/input grads equal the scan path (b_hh folding,
    valid-prefix reverse, output concat, final h/c all inside the
    differentiated graph)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from mucon_tpu.models.lstm import MaskedBiLSTM

    rng = np.random.RandomState(11)
    B, T, I, H = 3, 18, 6, 8
    lengths = jnp.asarray(np.array([18, 9, 2]))
    xs = jnp.asarray(rng.randn(B, T, I).astype(np.float32))
    w_o = jnp.asarray(rng.randn(B, T, 2 * H).astype(np.float32))
    w_h = jnp.asarray(rng.randn(B, 2 * H).astype(np.float32))

    base = MaskedBiLSTM(input_size=I, hidden_size=H)
    kern = MaskedBiLSTM(input_size=I, hidden_size=H, use_pallas=True,
                        kernel_differentiable=True)
    params = base.init(jax.random.PRNGKey(0), xs, lengths)["params"]

    def loss(mod, p, xs):
        out, (h, c) = mod.apply({"params": p}, xs, lengths)
        return jnp.sum(out * w_o) + jnp.sum(h * w_h) + jnp.sum(c * w_h)

    lk, gk = jax.value_and_grad(
        lambda p, x: loss(kern, p, x), argnums=(0, 1)
    )(params, xs)
    ls, gs = jax.value_and_grad(
        lambda p, x: loss(base, p, x), argnums=(0, 1)
    )(params, xs)
    np.testing.assert_allclose(float(lk), float(ls), rtol=1e-6)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(gk),
        jax.tree_util.tree_leaves_with_path(gs),
    ):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(pa)}",
        )
