"""L8 — observability callbacks."""

from diffmst_tpu.callbacks.audio import LogAudioCallback, LogReferenceMix
from diffmst_tpu.callbacks.metrics import CSVLogger, WandbLogger
from diffmst_tpu.callbacks.plotting import (
    fig2img,
    plot_confusion_matrix,
    plot_spectrograms,
)

__all__ = [
    "LogAudioCallback", "LogReferenceMix", "CSVLogger", "WandbLogger",
    "plot_spectrograms", "plot_confusion_matrix", "fig2img",
]
