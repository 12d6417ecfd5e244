"""Trainable fused-stack kernels: forward + gradient parity vs the XLA
path (interpret mode; dropout off for exact comparison).

Oracle chain: v2 (the retained parity oracle) is pinned directly against
XLA autodiff of the flax layers; v3 (the production path) is pinned
against v2 bit-for-bit given the same masks.  The superseded v1 kernel
was removed in round 3 (VERDICT r2 weak #5)."""

import numpy as np
import pytest

pytestmark = pytest.mark.interpret  # CPU interpret-mode kernel oracle tier (slow)
import jax
import jax.numpy as jnp

from mucon_tpu.models.temporal import WaveNetBlock
from mucon_tpu.ops.wavenet_pallas_v2 import pack_wavenet_params

STAGES = (1, 2, 4)
POOLS = (0, 1)
B, T, CIN, C = 2, 64, 8, 128


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    lengths = np.array([64, 41], np.int32)
    xs = rng.randn(B, T, CIN).astype(np.float32)
    block = WaveNetBlock(
        in_channels=CIN, stages=STAGES, out_dims=C,
        pooling_layers=POOLS, dropout_rate=0.0,
    )
    variables = block.init(
        jax.random.PRNGKey(0), jnp.asarray(xs), jnp.asarray(lengths), False
    )
    params = variables["params"]
    w_in = params["Conv1x1_0"]["kernel"]
    b_in = params["Conv1x1_0"]["bias"]
    x_proj = jnp.maximum(jnp.asarray(xs) @ w_in + b_in, 0.0)
    x_proj = x_proj * (jnp.arange(T)[None, :, None] < jnp.asarray(lengths)[:, None, None])
    packed = pack_wavenet_params(params, len(STAGES))
    return block, variables, xs, lengths, x_proj, packed


def test_train_kernel_grads_match_xla(setup):
    block, variables, xs, lengths, x_proj, packed = setup
    rng = np.random.RandomState(1)
    t_out = np.asarray(x_proj).shape[1] // 4
    g_target = jnp.asarray(rng.randn(B, t_out, C).astype(np.float32))

    # XLA reference: same loss through the flax stack taking x_proj as input
    # (bypass the in-projection by inverting it is messy; instead grad wrt
    # the PACKED params and x_proj via a stack-only apply)
    def xla_loss(x_proj_in, packed_in):
        w3, b3, w1, b1, wl, bl = packed_in
        # rebuild the flax param tree from packed arrays
        p = {"Conv1x1_1": {"kernel": wl, "bias": bl}}
        for i in range(len(STAGES)):
            p[f"WaveNetLayer_{i}"] = {
                "DilatedConv3_0": {"kernel": w3[i], "bias": b3[i]},
                "Conv1x1_0": {"kernel": w1[i], "bias": b1[i]},
            }
        # identity in-projection: feed x_proj directly through the layers by
        # replicating the block body minus the first conv
        from mucon_tpu.models.temporal import WaveNetLayer, pool2_time
        from mucon_tpu.models.layers import mask_time

        x = x_proj_in
        ln = jnp.asarray(lengths)
        for i, d in enumerate(STAGES):
            layer = WaveNetLayer(C, d, dropout_rate=0.0)
            x = layer.apply({"params": p[f"WaveNetLayer_{i}"]}, x, ln, False)
            if i in POOLS:
                x = pool2_time(x, "max")
                ln = ln // 2
                x = mask_time(x, ln)
        x = jax.nn.relu(x)
        x = x @ wl + bl
        x = mask_time(x, ln)
        return jnp.sum(x * g_target)

    ref_grads = jax.grad(xla_loss, argnums=(0, 1))(x_proj, packed)
    ker_grads = jax.grad(
        lambda xp, pk: _kernel_loss_v2(xp, lengths, pk, g_target, 2),
        argnums=(0, 1),
    )(x_proj, packed)

    np.testing.assert_allclose(
        np.asarray(ker_grads[0]), np.asarray(ref_grads[0]), rtol=3e-4, atol=2e-4
    )
    names = ["w3", "b3", "w1", "b1", "w_last", "b_last"]
    for name, kg, rg in zip(names, ker_grads[1], ref_grads[1]):
        np.testing.assert_allclose(
            np.asarray(kg), np.asarray(rg), rtol=3e-4, atol=2e-4, err_msg=name
        )


def test_model_training_grads_with_pallas_encoder():
    """Full-model gradient parity: use_pallas train path vs XLA path
    (dropout zeroed for determinism)."""
    from mucon_tpu.data import collate_padded
    from mucon_tpu.models import batch_to_arrays, create_model
    from tests.test_model import M, D, NMAX, make_sample, small_cfg

    cfg = small_cfg()
    cfg.model.ft.hidden_size = 128  # kernel channel width
    cfg.model.ft.last_gn_num_groups = 32
    cfg.model.ft.dropout_rate = 0.0
    cfg.model.ft.last_dropout = False
    cfg.model.fs.decoder.embedding_dropout = 0.0
    cfg.tpu.use_pallas_train = True
    rng = np.random.RandomState(5)
    samples = [make_sample(rng, 64, 3, "a"), make_sample(rng, 41, 4, "b")]
    batch = collate_padded(samples, n_max=NMAX, pad_multiple=16)
    model = create_model(cfg, num_classes=M, max_decoding_steps=NMAX + 1,
                         input_feature_size=D)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    arrays = batch_to_arrays(batch)

    def loss(p, use_pallas):
        fwd = model.forward(p, arrays, rng=jax.random.PRNGKey(1), train=True,
                            teacher_forcing=True, use_pallas=use_pallas)
        return model.loss(fwd, arrays, teacher_forcing=True).main

    l_x, g_x = jax.value_and_grad(lambda p: loss(p, False))(params)
    l_p, g_p = jax.value_and_grad(lambda p: loss(p, True))(params)
    assert float(l_p) == pytest.approx(float(l_x), rel=2e-4)
    flat_x = jax.tree.leaves(g_x)
    flat_p = jax.tree.leaves(g_p)
    for a, b in zip(flat_p, flat_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)


# ---------------------------------------------------------------------------
# v2: whole-batch layout, chunked backward
# ---------------------------------------------------------------------------


def _kernel_loss_v2(x_proj, lengths, packed, g_target, chunks):
    from mucon_tpu.ops.wavenet_train_pallas_v2 import wavenet_stack_train_v2

    w3, b3, w1, b1, wl, bl = packed
    z = wavenet_stack_train_v2(
        x_proj, jnp.asarray(lengths), jnp.zeros((), jnp.int32),
        w3, b3, w1, b1, wl, bl,
        STAGES, POOLS, 0.0, False, True, chunks,
    )
    return jnp.sum(z * g_target)


def test_train_kernel_v2_forward_matches(setup):
    block, variables, xs, lengths, x_proj, packed = setup
    ref_out, _ = block.apply(
        variables, jnp.asarray(xs), jnp.asarray(lengths), False
    )
    from mucon_tpu.ops.wavenet_train_pallas_v2 import wavenet_stack_train_v2

    w3, b3, w1, b1, wl, bl = packed
    z = wavenet_stack_train_v2(
        x_proj, jnp.asarray(lengths), jnp.zeros((), jnp.int32),
        w3, b3, w1, b1, wl, bl, STAGES, POOLS, 0.0, False, True, 2,
    )
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref_out),
                               rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("chunks", [1, 3])
def test_train_kernel_v2_chunking_invariant(setup, chunks):
    """The chunked sweep backward is chunking-invariant: grads at any
    chunk count == the chunks=2 program pinned against XLA above."""
    block, variables, xs, lengths, x_proj, packed = setup
    rng = np.random.RandomState(2)
    t_out = np.asarray(x_proj).shape[1] // 4
    g_target = jnp.asarray(rng.randn(B, t_out, C).astype(np.float32))

    ref_grads = jax.grad(
        lambda xp, pk: _kernel_loss_v2(xp, lengths, pk, g_target, 2),
        argnums=(0, 1),
    )(x_proj, packed)
    v2_grads = jax.grad(
        lambda xp, pk: _kernel_loss_v2(xp, lengths, pk, g_target, chunks),
        argnums=(0, 1),
    )(x_proj, packed)

    np.testing.assert_allclose(
        np.asarray(v2_grads[0]), np.asarray(ref_grads[0]), rtol=1e-5, atol=1e-5
    )
    names = ["w3", "b3", "w1", "b1", "w_last", "b_last"]
    for name, g2, g1 in zip(names, v2_grads[1], ref_grads[1]):
        np.testing.assert_allclose(
            np.asarray(g2), np.asarray(g1), rtol=1e-5, atol=1e-5, err_msg=name
        )


@pytest.mark.parametrize("chunks", [1, 2])
def test_train_kernel_v2_dropout_grads(setup, chunks):
    """Dropout-on v2 grads vs an XLA replica driven by the kernel's own
    XLA-generated masks (mathematically identical programs). Runs on CPU:
    the v2 kernels are prng-free."""
    from mucon_tpu.models.layers import mask_time
    from mucon_tpu.models.temporal import pool2_time
    from mucon_tpu.ops.wavenet_train_pallas_v2 import (
        _fwd_call,
        wavenet_stack_train_v2,
    )

    block, variables, xs, lengths, x_proj, packed = setup
    rng = np.random.RandomState(3)
    t_out = np.asarray(x_proj).shape[1] // 4
    g_target = jnp.asarray(rng.randn(B, t_out, C).astype(np.float32))
    ln = jnp.asarray(lengths)
    seed = jnp.asarray(11, jnp.int32)
    DROP = 0.25
    interp = jax.default_backend() == "cpu"

    # generic input WITHOUT exact relu zeros: when a whole pool pair is
    # dropped the pair becomes (x0, x1), and exact x ties (from relu zeros)
    # are tie-routing-ambiguous between mathematically identical programs
    # with different fp op orders; generic floats keep ties measure-zero
    from mucon_tpu.models.layers import mask_time as _mt
    x_proj = _mt(
        jnp.asarray(rng.randn(*np.asarray(x_proj).shape).astype(np.float32)),
        ln,
    )

    # deterministic in the seed
    def fwd(xp, pk, s):
        w3, b3, w1, b1, wl, bl = pk
        return wavenet_stack_train_v2(
            xp, ln, s, w3, b3, w1, b1, wl, bl,
            STAGES, POOLS, DROP, False, interp, chunks,
        )

    z0 = fwd(x_proj, packed, seed)
    np.testing.assert_array_equal(
        np.asarray(z0), np.asarray(fwd(x_proj, packed, seed))
    )
    assert np.abs(
        np.asarray(z0) - np.asarray(fwd(x_proj, packed, seed + 1))
    ).max() > 0

    # grads vs masked XLA replica
    w3, b3, w1, b1, wl, bl = packed
    _, _, _, ms = _fwd_call(
        x_proj, ln, seed, w3, b3, w1, b1, wl, bl,
        STAGES, POOLS, DROP, False, interp,
    )
    ms = [jax.lax.stop_gradient(m) for m in ms]

    def xla_loss(xp, pk):
        w3_, b3_, w1_, b1_, wl_, bl_ = pk
        xx = xp
        l = ln
        for i, d in enumerate(STAGES):
            T_i = xx.shape[1]
            left = jnp.pad(xx, ((0, 0), (d, 0), (0, 0)))[:, :T_i]
            right = jnp.pad(xx, ((0, 0), (0, d), (0, 0)))[:, d:]
            z = (
                jnp.einsum("btc,cd->btd", left, w3_[i, 0])
                + jnp.einsum("btc,cd->btd", xx, w3_[i, 1])
                + jnp.einsum("btc,cd->btd", right, w3_[i, 2])
                + b3_[i][None, None, :]
            )
            h = jnp.maximum(z, 0.0)
            y = jnp.einsum("btc,cd->btd", h, w1_[i]) + b1_[i][None, None, :]
            y = y * ms[i]
            xx = mask_time(y + xx, l)
            if i in POOLS:
                # first-max tie routing (torch max_pool semantics, which
                # the kernel reproduces; jnp.max's VJP splits ties)
                p0, p1 = xx[:, 0::2], xx[:, 1::2]
                xx = jnp.where(p0 >= p1, p0, p1)
                l = l // 2
                xx = mask_time(xx, l)
        xx = jnp.maximum(xx, 0.0) @ wl_ + bl_
        xx = mask_time(xx, l)
        return jnp.sum(xx * g_target)

    def ker_loss(xp, pk):
        return jnp.sum(fwd(xp, pk, seed) * g_target)

    gx = jax.grad(xla_loss, argnums=(0, 1))(x_proj, packed)
    gk = jax.grad(ker_loss, argnums=(0, 1))(x_proj, packed)
    np.testing.assert_allclose(
        np.asarray(gk[0]), np.asarray(gx[0]), rtol=2e-4, atol=2e-4
    )
    names = ["w3", "b3", "w1", "b1", "w_last", "b_last"]
    for name, a, b_ in zip(names, gk[1], gx[1]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=3e-4, atol=3e-4, err_msg=name
        )


def test_chunk_bounds_budget():
    """Budget subdivision: contiguous cover, order preserved, no chunk's
    stash exceeds the budget unless it is a single layer."""
    import mucon_tpu.ops.wavenet_train_pallas_v2 as mod

    t_ins = [2048, 2048, 1024, 512, 512, 256, 256, 256, 256, 128, 128]
    B_, C_ = 8, 128
    bounds = mod._chunk_bounds_budget(11, 3, t_ins, B_, C_, 2)
    # cover exactly 0..11 in order
    assert bounds[0][0] == 0 and bounds[-1][1] == 11
    for (a, b), (c, d) in zip(bounds, bounds[1:]):
        assert b == c and a < b
    for lo, hi in bounds:
        byte = sum(2 * B_ * t_ins[i] * C_ * 4 for i in range(lo, hi))
        assert hi - lo == 1 or byte <= mod._CHUNK_BYTES_BUDGET
    # the two T=2048 layers (16 MB stash each) can never share a chunk
    assert not any(lo <= 0 and hi >= 2 for lo, hi in bounds)
    # tiny shapes keep the plain count-based grouping
    small = mod._chunk_bounds_budget(3, 2, [64, 64, 32], 2, 128, 2)
    assert small == mod._chunk_bounds(3, 2)


def test_budget_subdivision_grads_invariant(setup, monkeypatch):
    """Forcing a tiny budget (many small programs) must not change values
    or grads."""
    import mucon_tpu.ops.wavenet_train_pallas_v2 as mod

    block, variables, xs, lengths, x_proj, packed = setup
    rng = np.random.RandomState(4)
    t_out = np.asarray(x_proj).shape[1] // 4
    g_target = jnp.asarray(rng.randn(B, t_out, C).astype(np.float32))

    def loss(xp, pk):
        return _kernel_loss_v2(xp, lengths, pk, g_target, 2)

    ref_v = float(loss(x_proj, packed))
    ref_g = jax.grad(loss, argnums=(0, 1))(x_proj, packed)

    monkeypatch.setattr(mod, "_CHUNK_BYTES_BUDGET", 1)  # 1 layer per chunk
    sub_v = float(loss(x_proj, packed))
    sub_g = jax.grad(loss, argnums=(0, 1))(x_proj, packed)

    assert sub_v == ref_v
    np.testing.assert_array_equal(np.asarray(sub_g[0]), np.asarray(ref_g[0]))
    for a, b_ in zip(sub_g[1], ref_g[1]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


# ---------------------------------------------------------------------------
# bf16 matmul mode (mm_dtype=bfloat16): MXU operands in bf16, f32
# accumulation, f32 residual state.  Exact equality with f32 is impossible
# (bf16 rounding flips relu boundaries), so the contract tested here is
# direction + scale: per-array gradient cosine similarity and norm ratio
# against the f32 kernel, at bf16-commensurate tolerances.  End-to-end
# convergence is validated on hardware (CLAUDE.md bf16 status).
# ---------------------------------------------------------------------------


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0 and nb == 0:
        return 1.0
    return float(a @ b / (na * nb + 1e-30))


@pytest.mark.parametrize("drop", [0.0, 0.25])
def test_train_kernel_v2_bf16_grads_direction(setup, drop):
    from mucon_tpu.ops.wavenet_train_pallas_v2 import wavenet_stack_train_v2

    block, variables, xs, lengths, x_proj, packed = setup
    rng = np.random.RandomState(7)
    t_out = np.asarray(x_proj).shape[1] // 4
    g_target = jnp.asarray(rng.randn(B, t_out, C).astype(np.float32))
    seed = jnp.asarray(11, jnp.int32)

    def loss(xp, pk, mm):
        z = wavenet_stack_train_v2(
            xp, jnp.asarray(lengths), seed, *pk,
            STAGES, POOLS, drop, False, True, 2, 0, mm,
        )
        return jnp.sum(z * g_target)

    g32 = jax.grad(loss, argnums=(0, 1))(x_proj, packed, None)
    g16 = jax.grad(loss, argnums=(0, 1))(x_proj, packed, jnp.bfloat16)

    flat32 = [g32[0]] + list(g32[1])
    flat16 = [g16[0]] + list(g16[1])
    names = ["dx", "w3", "b3", "w1", "b1", "w_last", "b_last"]
    for name, a, b in zip(names, flat32, flat16):
        assert _cos(a, b) > 0.995, (name, _cos(a, b))
        na, nb = np.linalg.norm(np.asarray(a)), np.linalg.norm(np.asarray(b))
        if na > 1e-6:
            assert abs(nb / na - 1.0) < 0.05, (name, na, nb)


def test_train_kernel_v2_bf16_forward_close(setup):
    from mucon_tpu.ops.wavenet_train_pallas_v2 import wavenet_stack_train_v2

    block, variables, xs, lengths, x_proj, packed = setup
    seed = jnp.asarray(0, jnp.int32)
    z32 = wavenet_stack_train_v2(
        x_proj, jnp.asarray(lengths), seed, *packed,
        STAGES, POOLS, 0.0, False, True, 2, 0, None,
    )
    z16 = wavenet_stack_train_v2(
        x_proj, jnp.asarray(lengths), seed, *packed,
        STAGES, POOLS, 0.0, False, True, 2, 0, jnp.bfloat16,
    )
    scale = float(jnp.max(jnp.abs(z32))) + 1e-9
    rel = float(jnp.max(jnp.abs(z32 - z16))) / scale
    assert rel < 0.02, rel
    assert _cos(z32, z16) > 0.9995


# ---------------------------------------------------------------------------
# v3: pool-free programs + XLA glue (ops/wavenet_train_pallas_v3.py).
# Contract: bit-matches v2 given the same masks (same math, same threefry
# stream); supports both pooling types and dropout at every size.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("pools,label", [
    ((0, 1), "mid"),
    ((0, 1, 2), "pooled-last"),  # projection moves to XLA after final pool
])
@pytest.mark.parametrize("drop", [0.0, 0.25])
def test_train_kernel_v3_matches_v2(setup, pools, label, drop):
    from mucon_tpu.ops.wavenet_train_pallas_v2 import wavenet_stack_train_v2
    from mucon_tpu.ops.wavenet_train_pallas_v3 import wavenet_stack_train_v3

    block, variables, xs, lengths, x_proj, packed = setup
    rng = np.random.RandomState(3)
    seed = jnp.asarray(7, jnp.int32)
    n_pools = sum(1 for p in pools if p < len(STAGES))
    t_out = T >> n_pools
    g_target = jnp.asarray(rng.randn(B, t_out, C).astype(np.float32))

    def l2(xp, p):
        z = wavenet_stack_train_v2(
            xp, jnp.asarray(lengths), seed, *p, STAGES, pools, drop,
            False, True, 2, 0, None)
        return jnp.sum(z * g_target)

    def l3(xp, p):
        z = wavenet_stack_train_v3(
            xp, jnp.asarray(lengths), seed, *p, STAGES, pools, "max",
            drop, False, True, None)
        return jnp.sum(z * g_target)

    v2v, g2 = jax.value_and_grad(l2, argnums=(0, 1))(x_proj, packed)
    v3v, g3 = jax.value_and_grad(l3, argnums=(0, 1))(x_proj, packed)
    assert float(v2v) == pytest.approx(float(v3v), abs=2e-5)
    for a, b in zip(jax.tree.leaves(g2), jax.tree.leaves(g3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-5)


def test_train_kernel_v3_sum_pool_matches_oracle(setup):
    """'sum' pooling (avg*2) against XLA autodiff of the flax layers.
    dx is compared only at VALID positions: the kernel masks padded dx to
    zero while raw autodiff leaks conv-halo gradients there; the model
    applies mask_time before the stack, so padded dx never matters."""
    from mucon_tpu.models.layers import mask_time as mt
    from mucon_tpu.models.temporal import WaveNetLayer, pool2_time
    from mucon_tpu.ops.wavenet_train_pallas_v3 import wavenet_stack_train_v3

    block, variables, xs, lengths, x_proj, packed = setup
    pools = (0, 1)
    rng = np.random.RandomState(5)
    g_target = jnp.asarray(rng.randn(B, T >> 2, C).astype(np.float32))
    ln = jnp.asarray(lengths)

    def l3(xp, p):
        z = wavenet_stack_train_v3(
            xp, ln, jnp.asarray(0, jnp.int32), *p, STAGES, pools, "sum",
            0.0, False, True, None)
        return jnp.sum(z * g_target)

    def lx(xp, p):
        w3, b3, w1, b1, wl, bl = p
        xx, l = xp, ln
        for i, d in enumerate(STAGES):
            layer = WaveNetLayer(C, d, dropout_rate=0.0)
            xx = layer.apply(
                {"params": {"DilatedConv3_0": {"kernel": w3[i], "bias": b3[i]},
                            "Conv1x1_0": {"kernel": w1[i], "bias": b1[i]}}},
                xx, l, False)
            if i in pools:
                xx = pool2_time(xx, "sum")
                l = l // 2
                xx = mt(xx, l)
        xx = jax.nn.relu(xx) @ wl + bl
        return jnp.sum(mt(xx, l) * g_target)

    g3 = jax.grad(l3, argnums=(0, 1))(x_proj, packed)
    gx = jax.grad(lx, argnums=(0, 1))(x_proj, packed)
    valid = (np.arange(T)[None, :, None] < np.asarray(lengths)[:, None, None])
    np.testing.assert_allclose(np.asarray(g3[0]) * valid,
                               np.asarray(gx[0]) * valid,
                               rtol=3e-4, atol=2e-4)
    for kg, rg in zip(g3[1], gx[1]):
        np.testing.assert_allclose(np.asarray(kg), np.asarray(rg),
                                   rtol=3e-4, atol=2e-4)


@pytest.mark.parametrize("drop", [0.0, 0.25])
def test_train_kernel_v3_bf16_grads_direction(setup, drop):
    from mucon_tpu.ops.wavenet_train_pallas_v3 import wavenet_stack_train_v3

    block, variables, xs, lengths, x_proj, packed = setup
    rng = np.random.RandomState(7)
    t_out = np.asarray(x_proj).shape[1] // 4
    g_target = jnp.asarray(rng.randn(B, t_out, C).astype(np.float32))
    seed = jnp.asarray(11, jnp.int32)

    def loss(xp, pk, mm):
        z = wavenet_stack_train_v3(
            xp, jnp.asarray(lengths), seed, *pk,
            STAGES, POOLS, "max", drop, False, True, mm,
        )
        return jnp.sum(z * g_target)

    g32 = jax.grad(loss, argnums=(0, 1))(x_proj, packed, None)
    g16 = jax.grad(loss, argnums=(0, 1))(x_proj, packed, jnp.bfloat16)
    names = ["dx", "w3", "b3", "w1", "b1", "w_last", "b_last"]
    for name, a, b in zip(names, [g32[0]] + list(g32[1]),
                          [g16[0]] + list(g16[1])):
        assert _cos(a, b) > 0.995, (name, _cos(a, b))
        na, nb = np.linalg.norm(np.asarray(a)), np.linalg.norm(np.asarray(b))
        if na > 1e-6:
            assert abs(nb / na - 1.0) < 0.05, (name, na, nb)


def test_model_dropout_training_uses_v3(tmp_path):
    """The flagship config (dropout 0.25) takes the pallas-train path when
    forced on; grads are finite and the loss is identical-config
    reproducible — the round-1 'auto requires dropout==0' gate is gone."""
    from mucon_tpu.config import get_cfg_defaults
    from mucon_tpu.models import create_model
    from mucon_tpu.models.model import batch_to_arrays
    from mucon_tpu.data.batching import collate_padded
    from mucon_tpu.data.general_dataset import Sample
    from mucon_tpu.data.utils import create_tf_input, create_tf_target

    M, D, Tt = 6, 16, 128
    cfg = get_cfg_defaults()
    cfg.model.ft.stages = [1, 2, 4]
    cfg.model.ft.pooling_layers = [0, 1]
    cfg.model.ft.hidden_size = 16
    cfg.model.ft.last_gn_num_groups = 4
    cfg.model.fs.encoder.hidden_size = 16
    cfg.model.fs.decoder.hidden_size = 16
    cfg.model.ft.dropout_rate = 0.25  # flagship default keeps dropout
    cfg.tpu.use_pallas = True
    cfg.tpu.use_pallas_train = True

    rng = np.random.RandomState(0)
    samples = []
    for i in range(2):
        tr = rng.randint(0, M, size=3).astype(np.int64)
        samples.append(Sample(
            feats=rng.randn(Tt, D).astype(np.float32),
            gt_label=rng.randint(0, M, size=Tt).astype(np.int64),
            transcript=tr,
            transcript_tf_input=create_tf_input(tr, sos_i=M + 1),
            transcript_tf_target=create_tf_target(tr, eos_i=M),
            video_name=f"v{i}",
        ))
    batch = collate_padded(samples, n_max=30, pad_multiple=64)
    model = create_model(cfg, num_classes=M, max_decoding_steps=31,
                        input_feature_size=D)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    arrays = batch_to_arrays(batch)

    def loss_fn(p, key):
        fwd = model.forward(p, arrays, rng=key, train=True,
                            teacher_forcing=True)
        return model.loss(fwd, arrays, teacher_forcing=True).main

    key = jax.random.PRNGKey(1)
    l1, grads = jax.value_and_grad(loss_fn)(params, key)
    assert np.isfinite(float(l1))
    for leaf in jax.tree.leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))
    l2 = loss_fn(params, key)
    assert float(l1) == pytest.approx(float(l2), rel=1e-6)


# ---------------------------------------------------------------------------
# batch slicing (VMEM fit for large-B train configs; the timed full-scale
# run at B=64, t=1024 needs 5x32 MB resident blocks = 166 MB unsliced)
# ---------------------------------------------------------------------------


def test_plan_batch_slices():
    from mucon_tpu.ops.wavenet_train_pallas_v3 import plan_batch_slices

    # the shape that OOMed the timed run must now slice
    assert plan_batch_slices(64, 1024, 128, True) >= 2
    # the hw-validated flagship shape stays unsliced (bit-compat)
    assert plan_batch_slices(8, 2048, 128, True) == 1
    # nothing fits -> None (caller falls back to XLA)
    assert plan_batch_slices(4, 2048, 128, True, budget=1024) is None


def test_train_kernel_v3_sliced_matches_unsliced(setup):
    """No dropout: slicing is bitwise-transparent through value AND grads
    (weight grads from the slices accumulate via autodiff addition)."""
    from mucon_tpu.ops.wavenet_train_pallas_v3 import (
        wavenet_stack_train_v3,
        wavenet_stack_train_v3_auto,
    )

    block, variables, xs, lengths, x_proj, packed = setup
    rng = np.random.RandomState(13)
    g_target = jnp.asarray(rng.randn(B, T >> 2, C).astype(np.float32))
    seed = jnp.asarray(3, jnp.int32)
    ln = jnp.asarray(lengths)
    per_video = T * C * 4 * 4  # no-drop resident blocks

    def l_unsliced(xp, p):
        z = wavenet_stack_train_v3(
            xp, ln, seed, *p, STAGES, POOLS, "max", 0.0, False, True, None)
        return jnp.sum(z * g_target)

    def l_sliced(xp, p):
        z = wavenet_stack_train_v3_auto(
            xp, ln, seed, *p, STAGES, POOLS, "max", 0.0, False, True, None,
            slice_budget=per_video)  # forces B slices of 1
        return jnp.sum(z * g_target)

    v0, g0 = jax.value_and_grad(l_unsliced, argnums=(0, 1))(x_proj, packed)
    v1, g1 = jax.value_and_grad(l_sliced, argnums=(0, 1))(x_proj, packed)
    assert float(v0) == pytest.approx(float(v1), rel=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_train_kernel_v3_sliced_dropout_seed_contract(setup):
    """With dropout, slice i draws its threefry stream from
    randint(fold_in(PRNGKey(seed), i)) — pinned so replica tests (and the
    same-masks XLA oracle pattern) can reconstruct the masks per slice."""
    from mucon_tpu.ops.wavenet_train_pallas_v3 import (
        wavenet_stack_train_v3,
        wavenet_stack_train_v3_auto,
    )

    block, variables, xs, lengths, x_proj, packed = setup
    seed = jnp.asarray(21, jnp.int32)
    ln = jnp.asarray(lengths)
    drop = 0.25
    per_video = T * C * 4 * 5

    z_sliced = wavenet_stack_train_v3_auto(
        x_proj, ln, seed, *packed, STAGES, POOLS, "max", drop, False, True,
        None, slice_budget=per_video)

    key = jax.random.PRNGKey(np.uint32(21))
    parts = []
    for i in range(B):
        seed_i = jax.random.randint(
            jax.random.fold_in(key, i), (), 0, 2**31 - 1).astype(jnp.int32)
        parts.append(wavenet_stack_train_v3(
            x_proj[i:i + 1], ln[i:i + 1], seed_i, *packed,
            STAGES, POOLS, "max", drop, False, True, None))
    z_manual = jnp.concatenate(parts, axis=0)
    np.testing.assert_array_equal(np.asarray(z_sliced), np.asarray(z_manual))


def test_sliced_train_routing_rule():
    """"auto" keeps the kernel unsliced and for SINGLE-video slices
    (nb == B — the long-T regime, 1.18x measured at T=10240) but routes
    multi-video slices to XLA (measured loss at B=64/t=1024)."""
    from mucon_tpu.models.model import sliced_train_uses_kernel

    assert sliced_train_uses_kernel(1, 8, "auto")       # unsliced
    assert sliced_train_uses_kernel(8, 8, "auto")       # single-video slices
    assert not sliced_train_uses_kernel(4, 64, "auto")  # multi-video slices
    assert not sliced_train_uses_kernel(2, 8, "auto")
    assert sliced_train_uses_kernel(4, 64, True)        # explicit force
    assert not sliced_train_uses_kernel(1, 8, False)
