"""Fused teacher-forced decoder chain kernel (ops/decoder_pallas.py):
forward parity vs the lax.scan twin, custom-VJP grads vs XLA autodiff,
and the full glue (chain + heads) against the flax DecoderCell scan."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.interpret  # CPU interpret-mode kernel oracle tier (slow)

S, B, Tz, H, E = 6, 3, 10, 8, 16


def _make_inputs(seed=0):
    rng = np.random.RandomState(seed)
    r = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.4)
    maskf = (np.arange(Tz)[None, :] < np.array([[Tz], [7], [3]])).astype(
        np.float32
    )
    args = dict(
        emb=jnp.maximum(r(S, B, H), 0.0),
        enc=r(B, Tz, E) * jnp.asarray(maskf)[:, :, None],
        pre=r(B, Tz, H),
        maskf=jnp.asarray(maskf),
        h0=r(B, H),
        c0=r(B, H),
        wl2=r(H, H),
        bl2=r(H),
        v=r(H),
        wc1=r(H, H),
        wc2=r(E, H),
        bc=r(H),
        wih=r(H, 4 * H),
        whh=r(H, 4 * H),
        bl=r(4 * H),
    )
    return list(args.values())


def test_chain_kernel_matches_scan():
    from mucon_tpu.ops.decoder_pallas import decoder_chain, decoder_chain_xla

    args = _make_inputs()
    hs_k, cs_k, cb_k = decoder_chain(True, *args)
    hs_x, cs_x, cb_x = decoder_chain_xla(*args)
    np.testing.assert_allclose(np.asarray(hs_k), np.asarray(hs_x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cs_k), np.asarray(cs_x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cb_k), np.asarray(cb_x), atol=1e-6)


def test_chain_custom_vjp_matches_autodiff():
    from mucon_tpu.ops.decoder_pallas import decoder_chain, decoder_chain_xla

    args = _make_inputs(1)
    rng = np.random.RandomState(9)
    w_h, w_c, w_cb = (
        jnp.asarray(rng.randn(S, B, H).astype(np.float32)) for _ in range(3)
    )

    def loss_kernel(*a):
        hs, cs, cb = decoder_chain(True, *a)
        return jnp.sum(hs * w_h) + jnp.sum(cs * w_c) + jnp.sum(cb * w_cb)

    def loss_xla(*a):
        hs, cs, cb = decoder_chain_xla(*a)
        return jnp.sum(hs * w_h) + jnp.sum(cs * w_c) + jnp.sum(cb * w_cb)

    # every differentiable input except maskf (index 3; the custom rule
    # pins its grad to zero — it is a constant 0/1 selector)
    argnums = tuple(i for i in range(15) if i != 3)
    gk = jax.grad(loss_kernel, argnums=argnums)(*args)
    gx = jax.grad(loss_xla, argnums=argnums)(*args)
    names = [
        "emb", "enc", "pre", "h0", "c0", "wl2", "bl2", "v",
        "wc1", "wc2", "bc", "wih", "whh", "bl",
    ]
    for name, a, b in zip(names, gk, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=f"grad mismatch: {name}",
        )


def test_teacher_forced_glue_matches_flax_scan():
    """decoder_teacher_forced (kernel chain + vectorized heads) ==
    the flax nn.scan DecoderCell branch, on a real initialized model."""
    from mucon_tpu.models.mucon import DecoderCell
    import flax.linen as nn

    from mucon_tpu.ops.decoder_pallas import decoder_teacher_forced

    M = 5
    rng = np.random.RandomState(3)
    cell_kwargs = dict(
        hidden=H, enc_out_dim=E, num_classes=M, embed_dropout=0.0,
        train=False, free_decode=False,
    )
    scan_cell = nn.scan(
        DecoderCell,
        variable_broadcast="params",
        split_rngs={"params": False, "dropout": True},
        in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast),
        out_axes=0,
    )(**cell_kwargs)

    enc = jnp.asarray(rng.randn(B, Tz, E).astype(np.float32))
    pre = jnp.asarray(rng.randn(B, Tz, H).astype(np.float32))
    maskf = jnp.asarray(
        (np.arange(Tz)[None, :] < np.array([[Tz], [6], [2]])).astype(
            np.float32
        )
    )
    h0 = jnp.asarray(rng.randn(B, H).astype(np.float32))
    c0 = jnp.asarray(rng.randn(B, H).astype(np.float32))
    tokens_tf = jnp.asarray(rng.randint(0, M + 2, (S, B)).astype(np.int32))

    variables = scan_cell.init(
        jax.random.PRNGKey(0),
        (h0, c0, tokens_tf[0]), tokens_tf, enc, pre, maskf,
    )
    _, (lp_ref, len_ref, tok_ref) = scan_cell.apply(
        variables, (h0, c0, tokens_tf[0]), tokens_tf, enc, pre, maskf
    )

    dp = variables["params"]
    table = dp["embedding"]["embedding"]
    emb = jnp.maximum(jnp.take(table, tokens_tf, axis=0), 0.0)
    lp, lens, toks = decoder_teacher_forced(
        dp, emb, enc, pre, maskf, h0, c0, use_kernel=True, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(lp), np.asarray(lp_ref), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(lens), np.asarray(len_ref), atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(tok_ref))


def _model_and_batch(use_decoder_kernel):
    from mucon_tpu.config import get_cfg_defaults
    from mucon_tpu.data import collate_padded
    from mucon_tpu.data.general_dataset import Sample
    from mucon_tpu.data.utils import create_tf_input, create_tf_target
    from mucon_tpu.models import batch_to_arrays, create_model

    M, D, NMAX = 6, 12, 8
    cfg = get_cfg_defaults()
    cfg.model.ft.stages = [1, 2, 4]
    cfg.model.ft.pooling_layers = [0, 1]
    cfg.model.ft.hidden_size = 16
    cfg.model.ft.last_gn_num_groups = 4
    cfg.model.fs.encoder.hidden_size = 16
    cfg.model.fs.decoder.hidden_size = 16
    cfg.model.ft.dropout_rate = 0.0
    cfg.model.ft.last_dropout = False
    cfg.model.fs.decoder.embedding_dropout = 0.0
    cfg.tpu.use_pallas_decoder = use_decoder_kernel

    rng = np.random.RandomState(0)

    def sample(T, N, name):
        tr = rng.randint(0, M, size=N).astype(np.int64)
        return Sample(
            feats=rng.randn(T, D).astype(np.float32),
            gt_label=rng.randint(0, M, size=T).astype(np.int64),
            transcript=tr,
            transcript_tf_input=create_tf_input(tr, sos_i=M + 1),
            transcript_tf_target=create_tf_target(tr, eos_i=M),
            video_name=name,
        )

    batch = collate_padded(
        [sample(60, 3, "a"), sample(41, 5, "b")], n_max=NMAX, pad_multiple=16
    )
    model = create_model(cfg, num_classes=M, max_decoding_steps=NMAX + 1,
                         input_feature_size=D)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    return model, params, batch_to_arrays(batch)


def test_model_train_step_matches_scan_path():
    """Full model forward+loss+grads: the decoder_fn kernel route equals
    the nn.scan branch (dropout off so both paths are deterministic)."""
    model_k, params, arrays = _model_and_batch(True)
    model_s, _, _ = _model_and_batch(False)

    def loss_with(model, p):
        fwd = model.forward(p, arrays, rng=jax.random.PRNGKey(1),
                            train=True, teacher_forcing=True)
        return model.loss(fwd, arrays, teacher_forcing=True).main

    lk, gk = jax.value_and_grad(lambda p: loss_with(model_k, p))(params)
    ls, gs = jax.value_and_grad(lambda p: loss_with(model_s, p))(params)
    np.testing.assert_allclose(float(lk), float(ls), rtol=1e-6)
    flat_k = jax.tree_util.tree_leaves_with_path(gk)
    flat_s = dict(jax.tree_util.tree_leaves_with_path(gs))
    assert len(flat_k) == len(flat_s)
    for path, leaf in flat_k:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_s[path]),
            rtol=5e-4, atol=1e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )
