"""Training runtime: optimizer, metrics, jitted steps, checkpointing."""

from mgnns_tpu.engine.optim import make_optimizer, label_params
from mgnns_tpu.engine.metrics import (
    confusion_update,
    metrics_from_confusion,
    classification_report,
)
from mgnns_tpu.engine.train import Engine, TrainState

__all__ = [
    "make_optimizer",
    "label_params",
    "confusion_update",
    "metrics_from_confusion",
    "classification_report",
    "Engine",
    "TrainState",
]
