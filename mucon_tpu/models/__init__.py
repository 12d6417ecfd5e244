from mucon_tpu.models.masks import (
    create_masks,
    create_masks_padded,
    project_lengths_softmax,
)
from mucon_tpu.models.model import (
    MuConFullySupervisedModel,
    MuConMixedSupervisionModel,
    MuConModel,
    batch_to_arrays,
    create_fully_supervised_model,
    create_mixed_supervision_model,
    create_model,
)
from mucon_tpu.models.mucon import MuConNet, build_model
from mucon_tpu.models.outputs import (
    MuConForwardOut,
    MuConFullySupervisedLoss,
    MuConLoss,
    MuConPredictOut,
)

__all__ = [
    "MuConModel",
    "MuConFullySupervisedModel",
    "MuConMixedSupervisionModel",
    "MuConNet",
    "MuConForwardOut",
    "MuConLoss",
    "MuConFullySupervisedLoss",
    "MuConPredictOut",
    "batch_to_arrays",
    "build_model",
    "create_model",
    "create_fully_supervised_model",
    "create_mixed_supervision_model",
    "create_masks",
    "create_masks_padded",
    "project_lengths_softmax",
]
