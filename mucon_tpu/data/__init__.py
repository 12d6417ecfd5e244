from mucon_tpu.data.batching import PaddedBatch, PaddedBatchLoader, collate_padded
from mucon_tpu.data.breakfast import (
    create_breakfast_dataset,
    create_fully_supervised_breakfast_dataset,
    create_mixed_supervision_breakfast_dataset,
)
from mucon_tpu.data.general_dataset import (
    FullySupervisedSample,
    GeneralDataset,
    GeneralFullySupervisedDataset,
    GeneralMixedSupervisionDataset,
    MixedSupervisionSample,
    Sample,
)
from mucon_tpu.data.synthetic import (
    create_fully_supervised_synthetic_dataset,
    create_mixed_supervision_synthetic_dataset,
    create_synthetic_dataset,
    materialize_synthetic_dataset,
)


def handel_dataset(cfg, train: bool) -> GeneralDataset:
    """Dataset dispatch (name kept, typo and all, for parity with the
    reference API — src/core/datasets/__init__.py:16-21)."""
    name = cfg.dataset.name
    if name == "breakfast":
        return create_breakfast_dataset(cfg=cfg, train=train)
    if name == "synthetic":
        return create_synthetic_dataset(cfg=cfg, train=train)
    raise Exception(f"Invalid dataset name. ({name})")


# correctly-spelled alias
handle_dataset = handel_dataset


def handel_fully_supervised_dataset(cfg, train: bool):
    if cfg.dataset.name == "breakfast":
        return create_fully_supervised_breakfast_dataset(cfg=cfg, train=train)
    if cfg.dataset.name == "synthetic":
        return create_fully_supervised_synthetic_dataset(cfg=cfg, train=train)
    raise Exception("Invalid dataset name.")


def handel_mixed_supervision_dataset(cfg, train: bool):
    if cfg.dataset.name == "breakfast":
        return create_mixed_supervision_breakfast_dataset(cfg=cfg, train=train)
    if cfg.dataset.name == "synthetic":
        return create_mixed_supervision_synthetic_dataset(cfg=cfg, train=train)
    raise Exception("Invalid dataset name.")


__all__ = [
    "PaddedBatch",
    "PaddedBatchLoader",
    "collate_padded",
    "GeneralDataset",
    "GeneralFullySupervisedDataset",
    "GeneralMixedSupervisionDataset",
    "Sample",
    "FullySupervisedSample",
    "MixedSupervisionSample",
    "create_breakfast_dataset",
    "create_fully_supervised_breakfast_dataset",
    "create_mixed_supervision_breakfast_dataset",
    "create_synthetic_dataset",
    "create_fully_supervised_synthetic_dataset",
    "create_mixed_supervision_synthetic_dataset",
    "materialize_synthetic_dataset",
    "handel_dataset",
    "handle_dataset",
    "handel_fully_supervised_dataset",
    "handel_mixed_supervision_dataset",
]
