from mucon_tpu.harness.checkpoint import load_checkpoint, save_checkpoint
from mucon_tpu.harness.evaluator import (
    MuConAlignmentEvaluator,
    MuConEvaluator,
    MuConEvaluatorResult,
)
from mucon_tpu.harness.logging import RunLogger, StepTimer
from mucon_tpu.harness.metrics_store import MetricSeries, MetricStore
from mucon_tpu.harness.optim import (
    MultiStepScheduler,
    PlateauScheduler,
    Scheduler,
    create_optimizer,
    create_scheduler,
)
from mucon_tpu.harness.trainer import SimpleTrainer, TrainerForTFExperiments

__all__ = [
    "SimpleTrainer",
    "TrainerForTFExperiments",
    "MuConEvaluator",
    "MuConAlignmentEvaluator",
    "MuConEvaluatorResult",
    "MetricStore",
    "MetricSeries",
    "RunLogger",
    "StepTimer",
    "Scheduler",
    "MultiStepScheduler",
    "PlateauScheduler",
    "create_optimizer",
    "create_scheduler",
    "save_checkpoint",
    "load_checkpoint",
]
