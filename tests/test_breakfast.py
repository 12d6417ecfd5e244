"""Breakfast disk-contract smoke test (reference tests/core/test_breakfast.py):
skipped unless the real dataset is present."""

from pathlib import Path

import pytest

from mucon_tpu.config import get_cfg_defaults
from mucon_tpu.data import handel_dataset

cfg = get_cfg_defaults()
_root = Path(cfg.dataset.root) / "breakfast_i3d"

pytestmark = pytest.mark.skipif(
    not _root.exists(), reason="Breakfast dataset not on disk"
)


def test_breakfast_files_exist():
    db = handel_dataset(cfg, train=True)
    assert db.get_num_classes() == 48
    assert db.eos_token_id == 48 and db.sos_token_id == 49
    for paths in (db.feat_file_paths, db.gt_file_paths, db.tr_file_paths):
        for p in paths:
            assert p.exists(), p
