"""Device-cache byte budget (tpu.cache_budget_gb, harness/cache.py).

New TPU capability — at Breakfast scale the feature cache approaches a
single chip's HBM, so the cache must degrade to streaming instead of
OOMing.  No reference equivalent (the reference streams one video at a
time, src/mucon/trainers.py:97-105)."""

import numpy as np
import pytest

from mucon_tpu.config import get_cfg_defaults
from mucon_tpu.data import handel_dataset
from mucon_tpu.harness import MuConEvaluator, SimpleTrainer
from mucon_tpu.harness.cache import CacheBudget, arrays_nbytes
from mucon_tpu.models import create_model


def _tiny_cfg(tmp_path, data_root):
    cfg = get_cfg_defaults()
    cfg.merge_from_list(
        [
            "dataset.name", "synthetic",
            "dataset.root", str(data_root),
            "dataset.synthetic.num_videos", "10",
            "dataset.synthetic.num_classes", "6",
            "dataset.synthetic.feat_dim", "16",
            "dataset.synthetic.min_len", "120",
            "dataset.synthetic.max_len", "400",
            "trainer.root", str(tmp_path),
            "trainer.num_epochs", "1",
            "trainer.eval_every", "100",
            "trainer.save_every", "100",
            "model.ft.stages", "[1, 2, 4]",
            "model.ft.pooling_layers", "[0, 1]",
            "model.ft.hidden_size", "16",
            "model.ft.last_gn_num_groups", "4",
            "model.fs.encoder.hidden_size", "16",
            "model.fs.decoder.hidden_size", "16",
            "tpu.batch_size", "4",
            "tpu.pad_multiple", "64",
            "tpu.cache_batches", "True",
            "evaluator.viterbi.frame_sampling", "10",
        ]
    )
    return cfg


def _build(cfg):
    train_db = handel_dataset(cfg, train=True)
    model = create_model(
        cfg,
        train_db.get_num_classes(),
        train_db.max_transcript_length + 1,
        train_db.feat_dim,
    )
    return train_db, model


class TestCacheBudget:
    def test_unlimited_reserves_everything(self):
        b = CacheBudget(0)
        assert b.try_reserve(1 << 40)
        assert b.try_reserve(1 << 40)

    def test_budget_is_first_come_first_served(self):
        b = CacheBudget(100)
        assert b.try_reserve(60)
        assert not b.try_reserve(60)  # would overflow
        assert b.try_reserve(40)  # still fits
        assert b.reserved_bytes == 100

    def test_eval_reserve_blocks_train_not_eval(self):
        b = CacheBudget(100, eval_reserve_bytes=30)
        assert b.try_reserve(60, pool="train")
        assert not b.try_reserve(20, pool="train")  # would eat the reserve
        assert b.try_reserve(10, pool="train")  # 70 + 30 reserve == budget
        assert b.try_reserve(25, pool="eval")  # reserve is eval's
        assert not b.try_reserve(10, pool="eval")  # hard budget still holds
        assert b.try_reserve(5, pool="eval")
        assert b.reserved_bytes == 100

    def test_eval_usage_counts_against_its_reserve_once(self):
        b = CacheBudget(100, eval_reserve_bytes=30)
        assert b.try_reserve(25, pool="eval")
        # train may take budget - max(reserve - used_eval, 0) - used = 70
        assert b.try_reserve(70, pool="train")
        assert not b.try_reserve(10, pool="train")

    def test_eval_may_use_unreserved_leftovers(self):
        b = CacheBudget(100, eval_reserve_bytes=10)
        assert b.try_reserve(50, pool="eval")  # well past its reserve
        assert b.try_reserve(50, pool="train")
        assert not b.try_reserve(1, pool="train")

    def test_zero_reserve_is_plain_fcfs(self):
        b = CacheBudget(100)
        assert b.try_reserve(60, pool="train")
        assert b.try_reserve(40, pool="eval")
        assert not b.try_reserve(1, pool="eval")

    def test_arrays_nbytes(self):
        arrays = {
            "a": np.zeros((3, 4), np.float32),
            "b": np.zeros((7,), np.int64),
        }
        assert arrays_nbytes(arrays) == 3 * 4 * 4 + 7 * 8


@pytest.mark.slow  # full-model jit compiles dominate on this 1-core box (FAST-tier budget, VERDICT r3 #6)
def test_trainer_budget_limits_cache_but_training_runs(tmp_path):
    cfg = _tiny_cfg(tmp_path / "runs", tmp_path / "data")
    # a few KB: only the first batch (if any) can cache
    cfg.tpu.cache_budget_gb = 1e-6
    train_db, model = _build(cfg)
    trainer = SimpleTrainer(cfg, "budget_test", train_db, model)
    trainer.train()
    n_batches = len(trainer.create_train_dataloader())
    assert len(trainer._batch_cache) < n_batches
    assert trainer.cache_budget.budget_bytes == int(1e-6 * (1 << 30))

    # unlimited budget caches every fixed batch (historical behavior)
    cfg2 = _tiny_cfg(tmp_path / "runs2", tmp_path / "data")
    train_db2, model2 = _build(cfg2)
    trainer2 = SimpleTrainer(cfg2, "budget_test2", train_db2, model2)
    trainer2.train()
    assert len(trainer2._batch_cache) == len(trainer2.create_train_dataloader())


@pytest.mark.slow  # full-model jit compiles dominate on this 1-core box (FAST-tier budget, VERDICT r3 #6)
def test_cache_replay_skips_collate_and_matches_streaming(
    tmp_path, monkeypatch
):
    """Once every fixed batch is cached, epochs replay device arrays in
    the loader's own shuffle order: zero _make_batch calls after epoch 1
    and a parameter trajectory IDENTICAL to the same cached run with
    replay disabled (same fixed batches, loader-materialized each epoch)."""
    import jax
    from mucon_tpu.data.batching import PaddedBatchLoader

    calls = {"n": 0}
    orig = PaddedBatchLoader._make_batch

    def counted(self, idxs):
        calls["n"] += 1
        return orig(self, idxs)

    monkeypatch.setattr(PaddedBatchLoader, "_make_batch", counted)

    cfg = _tiny_cfg(tmp_path / "runs_cache", tmp_path / "data")
    cfg.trainer.num_epochs = 3
    train_db, model = _build(cfg)
    trainer = SimpleTrainer(cfg, "replay", train_db, model)
    trainer.train()
    n_batches = len(trainer.create_train_dataloader())
    assert calls["n"] == n_batches  # epoch 1 only; epochs 2-3 replayed

    cfg2 = _tiny_cfg(tmp_path / "runs_stream", tmp_path / "data")
    cfg2.trainer.num_epochs = 3
    train_db2, model2 = _build(cfg2)
    trainer2 = SimpleTrainer(cfg2, "stream", train_db2, model2)
    trainer2._epoch_batches = trainer2._prefetched  # force loader path
    trainer2.train()

    flat_a = jax.tree_util.tree_leaves(trainer.params)
    flat_b = jax.tree_util.tree_leaves(trainer2.params)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow  # full-model jit compiles dominate on this 1-core box (FAST-tier budget, VERDICT r3 #6)
def test_replay_fallback_rewinds_shuffle_state(tmp_path):
    """If the cache-key scan aborts mid-epoch (batch composition changed),
    the loader fallback must replay the SAME epoch order: iter_cached_keys
    already advanced loader.epoch, so without the rewind the fallback
    epoch would use epoch+1's shuffle and the trajectory would diverge
    from a never-replayed run."""
    import jax

    cfg = _tiny_cfg(tmp_path / "runs_poison", tmp_path / "data")
    cfg.trainer.num_epochs = 3
    train_db, model = _build(cfg)
    trainer = SimpleTrainer(cfg, "poison", train_db, model)
    # poison the cache before every epoch: count matches, one key misses,
    # so _epoch_batches enters the replay branch then falls back
    orig_batches = trainer._epoch_batches

    def poisoned(loader):
        if trainer._batch_cache:
            key = next(iter(trainer._batch_cache))
            arrays = trainer._batch_cache.pop(key)
            trainer._batch_cache[("__bogus__",) + key] = arrays
        return orig_batches(loader)

    trainer._epoch_batches = poisoned
    trainer.train()

    cfg2 = _tiny_cfg(tmp_path / "runs_plain", tmp_path / "data")
    cfg2.trainer.num_epochs = 3
    train_db2, model2 = _build(cfg2)
    trainer2 = SimpleTrainer(cfg2, "plain", train_db2, model2)
    trainer2._epoch_batches = trainer2._prefetched  # never replay
    trainer2.train()

    flat_a = jax.tree_util.tree_leaves(trainer.params)
    flat_b = jax.tree_util.tree_leaves(trainer2.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_evaluator_shares_trainer_budget(tmp_path):
    cfg = _tiny_cfg(tmp_path / "runs", tmp_path / "data")
    cfg.tpu.cache_budget_gb = 1e-6
    train_db, model = _build(cfg)
    test_db = handel_dataset(cfg, train=False)
    evaluator = MuConEvaluator(cfg, test_db, model)
    trainer = SimpleTrainer(
        cfg, "shared_budget", train_db, model, evaluators=[evaluator]
    )
    assert evaluator.cache_budget is trainer.cache_budget


def test_standalone_evaluator_builds_own_budget(tmp_path):
    cfg = _tiny_cfg(tmp_path / "runs", tmp_path / "data")
    cfg.tpu.cache_budget_gb = 1e-6
    train_db, model = _build(cfg)
    test_db = handel_dataset(cfg, train=False)
    evaluator = MuConEvaluator(cfg, test_db, model)
    assert evaluator.cache_budget is None
    params = model.init_params(__import__("jax").random.PRNGKey(0))
    result = evaluator.evaluate(params)
    assert evaluator.cache_budget is not None
    assert np.isfinite(result.s_mof)
    # budget too small: eval batches streamed, cache stayed under the count
    n_batches = len(evaluator.create_dataloader())
    assert len(getattr(evaluator, "_array_cache", {})) < n_batches


def test_evaluator_replay_skips_collate_and_matches(tmp_path, monkeypatch):
    """Once every eval batch's device arrays are cached, later
    evaluations replay (metadata, arrays) pairs: zero _make_batch calls
    after the first pass (no disk reads, no pad-collate — measured ~45 s
    per periodic eval at Breakfast scale, docs/TIMED_RUN.md) and a result
    IDENTICAL to the streaming pass."""
    from mucon_tpu.data.batching import PaddedBatchLoader

    calls = {"n": 0}
    orig = PaddedBatchLoader._make_batch

    def counted(self, idxs):
        calls["n"] += 1
        return orig(self, idxs)

    monkeypatch.setattr(PaddedBatchLoader, "_make_batch", counted)

    cfg = _tiny_cfg(tmp_path / "runs", tmp_path / "data")
    _, model = _build(cfg)
    test_db = handel_dataset(cfg, train=False)
    evaluator = MuConEvaluator(cfg, test_db, model)
    evaluator.viterbi_mode(True)
    params = model.init_params(__import__("jax").random.PRNGKey(0))

    r1 = evaluator.evaluate(params)
    n_first = calls["n"]
    assert n_first == len(evaluator.create_dataloader())
    assert getattr(evaluator, "_fused_replay", None)

    r2 = evaluator.evaluate(params)
    assert calls["n"] == n_first  # replayed: dataset never touched
    assert r1 == r2


def test_evaluator_replay_disabled_on_budget_miss(tmp_path):
    """If any eval batch failed to cache (budget miss), replay must NOT
    install — a partial replay would skip the streamed batches' fresh
    arrays; every evaluation keeps streaming and results stay equal."""
    cfg = _tiny_cfg(tmp_path / "runs", tmp_path / "data")
    cfg.tpu.cache_budget_gb = 1e-6  # nothing fits
    _, model = _build(cfg)
    test_db = handel_dataset(cfg, train=False)
    evaluator = MuConEvaluator(cfg, test_db, model)
    params = model.init_params(__import__("jax").random.PRNGKey(0))
    r1 = evaluator.evaluate(params)
    assert getattr(evaluator, "_fused_replay", None) is None
    r2 = evaluator.evaluate(params)
    assert r1 == r2


def test_eval_feats_transfer_dtype(tmp_path):
    """float16 eval wire: arrays arrive f16, evaluation still runs and the
    result is finite (parity-critical runs keep the float32 default)."""
    import jax.numpy as jnp

    cfg = _tiny_cfg(tmp_path / "runs", tmp_path / "data")
    cfg.tpu.eval_feats_transfer_dtype = "float16"
    train_db, model = _build(cfg)
    test_db = handel_dataset(cfg, train=False)
    evaluator = MuConEvaluator(cfg, test_db, model)
    for batch in evaluator.create_dataloader():
        arrays = evaluator._make_arrays(batch)
        assert arrays["feats"].dtype == jnp.float16
        break
    params = model.init_params(__import__("jax").random.PRNGKey(0))
    result = evaluator.evaluate(params)
    assert np.isfinite(result.s_mof)

    cfg.tpu.eval_feats_transfer_dtype = "nope"
    with pytest.raises(ValueError):
        evaluator._eval_feats_dtype()
