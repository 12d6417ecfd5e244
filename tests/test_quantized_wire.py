"""int8 quantized feature wire (tpu.feats_transfer_dtype="int8").

New TPU capability — the training pipeline is wire-bound on its first
epoch (features stream host->device) and HBM-bound in the device cache
at Breakfast scale (docs/STREAMING.md); per-frame symmetric int8
quantization quarters both vs f32 (halves vs the f16 wire).  Lossy and
opt-in: f32 stays the parity default, like the f16 wires.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mucon_tpu.data import collate_padded
from mucon_tpu.harness.optim import create_optimizer
from mucon_tpu.models import batch_to_arrays, create_model
from mucon_tpu.models.model import (
    batch_to_host_arrays,
    dequantize_feats,
    quantize_feats_int8,
)
from tests.test_model import D, M, NMAX, make_sample, small_cfg


def test_quantize_roundtrip_error_bound():
    rng = np.random.RandomState(0)
    # wildly varying per-frame magnitudes: the per-frame scale must adapt
    f = rng.randn(3, 17, D).astype(np.float32)
    f *= np.exp(rng.uniform(-6, 6, size=(3, 17, 1))).astype(np.float32)
    q, s = quantize_feats_int8(f)
    assert q.dtype == np.int8 and q.shape == f.shape
    assert s.dtype == np.float32 and s.shape == (3, 17)
    deq = q.astype(np.float32) * s[..., None]
    # |error| <= scale/2 elementwise (round-to-nearest)
    assert (np.abs(deq - f) <= s[..., None] / 2 + 1e-12).all()
    # the bound is tight relative to each frame's peak: <= peak/254
    peak = np.abs(f).max(-1)
    assert (s / 2 <= peak / 254 + 1e-12).all()


def test_quantize_zero_frames():
    q, s = quantize_feats_int8(np.zeros((1, 4, D), np.float32))
    assert (q == 0).all() and (s > 0).all()  # no div-by-zero NaNs


def test_dequantize_feats_noop_on_float_wire():
    arrays = {"feats": jnp.ones((1, 2, 3)), "num_frames": jnp.ones(1)}
    assert dequantize_feats(arrays) is arrays


@pytest.fixture(scope="module")
def setup():
    cfg = small_cfg()
    rng = np.random.RandomState(1)
    samples = [make_sample(rng, 48 + 16 * i, 3, f"v{i}") for i in range(4)]
    batch = collate_padded(samples, n_max=NMAX, pad_multiple=64)
    model = create_model(cfg, num_classes=M, max_decoding_steps=NMAX + 1,
                         input_feature_size=D)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    return cfg, model, params, batch


def _int8_arrays(batch):
    return {
        k: jnp.asarray(v)
        for k, v in batch_to_host_arrays(batch, feats_dtype="int8").items()
    }


def test_forward_tracks_f32(setup):
    """The int8 wire must reproduce the f32 forward closely (it feeds the
    same model; only the features carry ~0.2%-of-peak noise)."""
    cfg, model, params, batch = setup
    arrays8 = _int8_arrays(batch)
    assert arrays8["feats"].dtype == jnp.int8
    assert "feats_scale" in arrays8
    fwd32 = model.forward(params, batch_to_arrays(batch), train=False)
    fwd8 = model.forward(params, arrays8, train=False)
    ref = np.asarray(fwd32.segmentation)
    got = np.asarray(fwd8.segmentation)
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / scale < 0.05
    np.testing.assert_allclose(
        np.asarray(fwd8.lengths), np.asarray(fwd32.lengths),
        atol=0.05 * (np.abs(np.asarray(fwd32.lengths)).max() + 1e-9),
    )


def test_grad_step_finite_and_tracks_f32(setup):
    cfg, model, params, batch = setup

    def loss_on(arrays):
        def loss_fn(p):
            fwd = model.forward(p, arrays, train=True,
                                rng=jax.random.PRNGKey(3),
                                teacher_forcing=True)
            return model.loss(fwd, arrays, teacher_forcing=True).main

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return float(loss), grads

    l32, _ = loss_on(batch_to_arrays(batch))
    l8, g8 = loss_on(_int8_arrays(batch))
    assert np.isfinite(l8)
    assert l8 == pytest.approx(l32, rel=0.05)
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(g8))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
def test_sharded_step_matches_single_device_int8(setup):
    """DP sharding must not change the quantized-wire math: identical
    int8 host arrays through a (4,1) mesh == (1,1) mesh."""
    from mucon_tpu.parallel import make_mesh, make_sharded_train_step, \
        shard_batch_arrays

    cfg, model, params, batch = setup
    host = batch_to_host_arrays(batch, feats_dtype="int8")

    def loss_on(mesh_shape):
        mesh = make_mesh(*mesh_shape)
        tx = create_optimizer(cfg, model.param_partition(params))
        params_in = jax.tree.map(jnp.array, params)  # fresh (step donates)
        opt_state = tx.init(params_in)
        step = make_sharded_train_step(model, tx, mesh, teacher_forcing=True)
        sharded = shard_batch_arrays(mesh, host)
        assert sharded["feats"].dtype == jnp.int8
        _, _, loss = step(params_in, opt_state, jax.random.PRNGKey(7), sharded)
        return float(loss.main)

    assert loss_on((4, 1)) == pytest.approx(loss_on((1, 1)), rel=2e-4)


def test_evaluator_int8_wire(tmp_path):
    """End-to-end: the evaluator runs with the int8 eval wire and returns
    a finite 24-field result close to the f32 one."""
    from tests.test_cache_budget import _build, _tiny_cfg
    from mucon_tpu.data import handel_dataset
    from mucon_tpu.harness import MuConEvaluator

    cfg = _tiny_cfg(tmp_path / "runs", tmp_path / "data")
    _, model = _build(cfg)
    test_db = handel_dataset(cfg, train=False)
    params = model.init_params(jax.random.PRNGKey(0))

    def result_with(dtype):
        c = cfg.clone()
        c.defrost()
        c.tpu.eval_feats_transfer_dtype = dtype
        c.freeze()
        ev = MuConEvaluator(c, test_db, model)
        ev.viterbi_mode(True)
        return ev.evaluate(params)

    r8 = result_with("int8")
    assert np.isfinite(r8.y_mof) and np.isfinite(r8.vit_mof)
    r32 = result_with("float32")
    assert abs(r8.y_mof - r32.y_mof) < 0.1
