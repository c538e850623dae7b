"""L8 — observability callbacks."""

from diffmst_tpu.callbacks.audio import LogAudioCallback, LogReferenceMix
from diffmst_tpu.callbacks.metrics import CSVLogger, WandbLogger

__all__ = ["LogAudioCallback", "LogReferenceMix", "CSVLogger", "WandbLogger"]
