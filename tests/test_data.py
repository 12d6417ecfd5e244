import numpy as np
import pytest

from mucon_tpu.config import get_cfg_defaults
from mucon_tpu.data import (
    PaddedBatchLoader,
    collate_padded,
    handel_dataset,
)
from mucon_tpu.data.synthetic import materialize_synthetic_dataset
from mucon_tpu.data.utils import (
    create_tf_input,
    create_tf_target,
    segment_to_labels,
    summarize_list,
    unsummarize_list,
)


@pytest.fixture(scope="module")
def synth_cfg(tmp_path_factory):
    cfg = get_cfg_defaults()
    cfg.dataset.name = "synthetic"
    cfg.dataset.root = str(tmp_path_factory.mktemp("data"))
    cfg.dataset.synthetic.num_videos = 12
    cfg.dataset.synthetic.num_classes = 8
    cfg.dataset.synthetic.feat_dim = 32
    cfg.dataset.synthetic.min_len = 100
    cfg.dataset.synthetic.max_len = 700
    return cfg


def test_tf_helpers():
    tr = [3, 1, 4]
    assert list(create_tf_input(tr, sos_i=9)) == [9, 3, 1, 4]
    assert list(create_tf_target(tr, eos_i=8)) == [3, 1, 4, 8]
    s, l = summarize_list([4, 5, 5, 6])
    assert s == [4, 5, 6] and l == [1, 2, 1]
    assert unsummarize_list(s, l) == [4, 5, 5, 6]
    np.testing.assert_array_equal(
        segment_to_labels([1, 2], [2, 3]), [1, 1, 2, 2, 2]
    )


def test_disk_contract_and_vocab(synth_cfg):
    db = handel_dataset(synth_cfg, train=True)
    assert db.get_num_classes() == 8
    assert db.eos_token_id == 8 and db.sos_token_id == 9
    assert db.background_class_ids == [0]
    assert db.training_path_grammar is not None
    s = db[0]
    assert s.feats.ndim == 2 and s.feats.shape[1] == 32
    assert s.gt_label.shape[0] == s.feats.shape[0]
    assert list(s.transcript_tf_input[:1]) == [9]
    assert s.transcript_tf_target[-1] == 8
    # labels expand the transcript
    summ, _ = summarize_list(list(s.gt_label))
    assert summ == list(s.transcript)


def test_collate_padding_and_masks(synth_cfg):
    db = handel_dataset(synth_cfg, train=True)
    samples = [db[i] for i in range(3)]
    batch = collate_padded(samples, n_max=30, pad_multiple=64)
    assert batch.feats.shape[0] == 3
    assert batch.feats.shape[1] % 64 == 0
    for i, s in enumerate(samples):
        t, n = s.feats.shape[0], s.transcript.shape[0]
        assert batch.num_frames[i] == t
        assert batch.transcript_len[i] == n
        np.testing.assert_array_equal(batch.feats[i, :t], s.feats)
        assert np.all(batch.feats[i, t:] == 0)
        np.testing.assert_array_equal(batch.transcript[i, :n], s.transcript)
        np.testing.assert_array_equal(batch.tf_input[i, : n + 1], s.transcript_tf_input)
        np.testing.assert_array_equal(
            batch.tf_target[i, : n + 1], s.transcript_tf_target
        )


def test_loader_covers_all_videos_once(synth_cfg):
    db = handel_dataset(synth_cfg, train=True)
    loader = PaddedBatchLoader(db, batch_size=4, pad_multiple=64, seed=3)
    seen = []
    for batch in loader:
        seen.extend(batch.video_names)
        # bucketing keeps padding waste bounded
        assert batch.feats.shape[1] >= batch.num_frames.max()
    assert sorted(seen) == sorted(db.file_names)
    # next epoch: different order (shuffled), same coverage
    seen2 = [n for b in loader for n in b.video_names]
    assert sorted(seen2) == sorted(seen)


def test_loader_bucketing_reduces_padding(synth_cfg):
    db = handel_dataset(synth_cfg, train=True)
    bucketed = PaddedBatchLoader(
        db, batch_size=4, pad_multiple=16, bucket_by_length=True, prefetch=0
    )
    waste_bucketed = 0
    for b in bucketed:
        waste_bucketed += int(np.sum(b.feats.shape[1] - b.num_frames))
    # sanity: waste is bounded by the theoretical worst case
    assert waste_bucketed < len(db) * 700


def test_materialize_idempotent(tmp_path):
    r1 = materialize_synthetic_dataset(tmp_path / "d", num_videos=3, feat_dim=8)
    files = sorted((r1 / "features").glob("*.npy"))
    r2 = materialize_synthetic_dataset(tmp_path / "d", num_videos=3, feat_dim=8)
    assert sorted((r2 / "features").glob("*.npy")) == files


def test_loader_fixed_batches(synth_cfg):
    from mucon_tpu.data import handel_dataset

    db = handel_dataset(synth_cfg, train=True)
    loader = PaddedBatchLoader(
        db, batch_size=4, pad_multiple=64, fixed_batches=True, prefetch=0
    )
    comp1 = sorted(tuple(b.video_names) for b in loader)
    comp2 = sorted(tuple(b.video_names) for b in loader)
    # batch composition frozen across epochs; coverage complete
    assert comp1 == comp2
    assert sorted(n for b in comp1 for n in b) == sorted(db.file_names)


def test_batch_divisor_keeps_divisible_remainder(tmp_path):
    """Divisible remainder batches are kept under a mesh divisor; only a
    non-divisible remainder is dropped, with a warning."""
    import warnings
    from mucon_tpu.config import get_cfg_defaults
    from mucon_tpu.data import handel_dataset
    from mucon_tpu.data.batching import PaddedBatchLoader

    cfg = get_cfg_defaults()
    cfg.dataset.name = "synthetic"
    cfg.dataset.root = str(tmp_path)
    cfg.dataset.synthetic.num_videos = 8  # 6 train videos
    cfg.dataset.synthetic.num_classes = 5
    cfg.dataset.synthetic.feat_dim = 8
    cfg.dataset.synthetic.min_len = 60
    cfg.dataset.synthetic.max_len = 120
    db = handel_dataset(cfg, train=True)
    assert len(db) == 6

    # 6 videos, bs=4, divisor 2: batches of 4 and 2 -> both kept
    loader = PaddedBatchLoader(db, batch_size=4, pad_multiple=16,
                               shuffle=False, batch_divisor=2)
    sizes = sorted(b.batch_size for b in loader)
    assert sizes == [2, 4]

    # 6 videos, bs=4, divisor 4: the 2-video remainder is dropped + warned
    loader = PaddedBatchLoader(db, batch_size=4, pad_multiple=16,
                               shuffle=False, batch_divisor=4)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        sizes = [b.batch_size for b in loader]
    assert sizes == [4]
    assert any("dropping 2 video" in str(x.message) for x in w)
