"""L4 — training systems."""

from diffmst_tpu.train.param_system import (
    ParameterEstimationSystem,
    ParamTrainState,
    Remixer,
    band_split_separator,
)
from diffmst_tpu.train.system import (
    Batch,
    EffectFlags,
    System,
    SystemConfig,
    TrainState,
)
from diffmst_tpu.train.trainer import Trainer

__all__ = [
    "Batch",
    "EffectFlags",
    "System",
    "SystemConfig",
    "TrainState",
    "Trainer",
    "ParameterEstimationSystem",
    "ParamTrainState",
    "Remixer",
    "band_split_separator",
]
