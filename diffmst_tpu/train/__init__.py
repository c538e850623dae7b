"""L4 — training systems."""

from diffmst_tpu.train.system import (
    Batch,
    EffectFlags,
    System,
    SystemConfig,
    TrainState,
)

__all__ = ["Batch", "EffectFlags", "System", "SystemConfig", "TrainState"]
