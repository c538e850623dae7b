"""L6 — host-side data pipeline."""

from diffmst_tpu.data.audio_io import audio_info, read_audio, write_audio
from diffmst_tpu.data.dataset import (
    MixDataModule,
    MixDataset,
    MultitrackDataModule,
    MultitrackDataset,
    TrackExample,
)

__all__ = [
    "audio_info",
    "read_audio",
    "write_audio",
    "MixDataModule",
    "MixDataset",
    "MultitrackDataModule",
    "MultitrackDataset",
    "TrackExample",
]
