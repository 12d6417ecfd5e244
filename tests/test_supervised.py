"""Fully-supervised and mixed-supervision model variants (SURVEY.md §2.8,
reference models.py:781-911) + bf16 compute path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mucon_tpu.data import collate_padded
from mucon_tpu.data.general_dataset import MixedSupervisionSample
from mucon_tpu.data.utils import create_tf_input, create_tf_target
from mucon_tpu.models import (
    batch_to_arrays,
    create_fully_supervised_model,
    create_mixed_supervision_model,
)
from tests.test_model import M, D, NMAX, small_cfg


def make_sup_sample(rng, T, N, name, supervised=True):
    transcript = rng.randint(0, M, size=N).astype(np.int64)
    w = rng.dirichlet(np.ones(N))
    lengths = np.maximum(1, np.round(w * T)).astype(np.float32)
    return MixedSupervisionSample(
        feats=rng.randn(T, D).astype(np.float32),
        gt_label=rng.randint(0, M, size=T).astype(np.int64),
        transcript=transcript,
        transcript_tf_input=create_tf_input(transcript, sos_i=M + 1),
        transcript_tf_target=create_tf_target(transcript, eos_i=M),
        video_name=name,
        absolute_lengths=lengths,
        fully_supervised=supervised,
    )


@pytest.fixture(scope="module")
def sup_setup():
    cfg = small_cfg()
    rng = np.random.RandomState(0)
    samples = [
        make_sup_sample(rng, 60, 3, "a", supervised=True),
        make_sup_sample(rng, 44, 4, "b", supervised=False),
    ]
    batch = collate_padded(samples, n_max=NMAX, pad_multiple=16)
    return cfg, batch


def test_fully_supervised_loss_has_extra_terms(sup_setup):
    cfg, batch = sup_setup
    model = create_fully_supervised_model(
        cfg, num_classes=M, max_decoding_steps=NMAX + 1, input_feature_size=D
    )
    params = model.init_params(jax.random.PRNGKey(0), batch)
    arrays = batch_to_arrays(batch)
    fwd = model.forward(params, arrays, train=False, teacher_forcing=True)
    loss = model.loss(fwd, arrays, teacher_forcing=True)
    assert np.isfinite(float(loss.classification_loss))
    assert np.isfinite(float(loss.supervised_length_loss))
    # weighting identity (models.py:853-860): supervised terms contribute to
    # main with their multipliers (all videos supervised in this variant)
    base = (
        cfg.model.loss.mul_transcript * float(loss.transcript_loss)
        + cfg.model.loss.mul_length * float(loss.length_loss)
        + cfg.model.loss.mul_mucon * float(loss.mucon_loss)
        + cfg.model.loss.mul_smoothing * float(loss.smoothing_loss)
        + cfg.model.loss.fully_supervised.mul_classification
        * float(loss.classification_loss)
        + cfg.model.loss.fully_supervised.mul_supervised_length
        * float(loss.supervised_length_loss)
    )
    assert float(loss.main) == pytest.approx(base, rel=1e-5)


def test_mixed_supervision_gates_extra_terms(sup_setup):
    cfg, batch = sup_setup
    model = create_mixed_supervision_model(
        cfg, num_classes=M, max_decoding_steps=NMAX + 1, input_feature_size=D
    )
    params = model.init_params(jax.random.PRNGKey(0), batch)
    arrays = batch_to_arrays(batch)
    fwd = model.forward(params, arrays, train=False, teacher_forcing=True)
    loss_mixed = model.loss(fwd, arrays, teacher_forcing=True)

    # flipping the unsupervised flag on must increase main by the gated terms
    arrays2 = dict(arrays)
    arrays2["fully_supervised"] = jnp.array([True, True])
    loss_all = model.loss(fwd, arrays2, teacher_forcing=True)
    assert float(loss_all.main) > float(loss_mixed.main)

    arrays3 = dict(arrays)
    arrays3["fully_supervised"] = jnp.array([False, False])
    loss_none = model.loss(fwd, arrays3, teacher_forcing=True)
    base = (
        cfg.model.loss.mul_transcript * float(loss_none.transcript_loss)
        + cfg.model.loss.mul_length * float(loss_none.length_loss)
        + cfg.model.loss.mul_mucon * float(loss_none.mucon_loss)
        + cfg.model.loss.mul_smoothing * float(loss_none.smoothing_loss)
    )
    assert float(loss_none.main) == pytest.approx(base, rel=1e-5)


def test_bf16_compute_path(sup_setup):
    cfg, batch = sup_setup
    cfg = cfg.clone()
    cfg.tpu.compute_dtype = "bfloat16"
    model = create_fully_supervised_model(
        cfg, num_classes=M, max_decoding_steps=NMAX + 1, input_feature_size=D
    )
    params = model.init_params(jax.random.PRNGKey(0), batch)
    # params stay f32
    assert all(
        a.dtype == jnp.float32 for a in jax.tree.leaves(params)
    )
    arrays = batch_to_arrays(batch)
    fwd = model.forward(params, arrays, train=False, teacher_forcing=True)
    loss = model.loss(fwd, arrays, teacher_forcing=True)
    assert np.isfinite(float(loss.main))
    # loss is accumulated in f32
    assert loss.main.dtype == jnp.float32


def test_arithmetic_mucon_and_templates(sup_setup):
    cfg, batch = sup_setup
    for mtype, template in [("arithmetic", "box"), ("flint", "gaussian"),
                            ("flint", "trapezoid")]:
        c = cfg.clone()
        c.model.loss.mucon.type = mtype
        c.model.loss.mucon.template = template
        model = create_fully_supervised_model(
            c, num_classes=M, max_decoding_steps=NMAX + 1, input_feature_size=D
        )
        params = model.init_params(jax.random.PRNGKey(0), batch)
        arrays = batch_to_arrays(batch)
        fwd = model.forward(params, arrays, train=False, teacher_forcing=True)
        loss = model.loss(fwd, arrays, teacher_forcing=True)
        assert np.isfinite(float(loss.mucon_loss)), (mtype, template)
