"""L2 — reference-mix generators."""

from diffmst_tpu.mixing.knowledge import (
    instrument_metadata,
    knowledge_engineering_mix,
)
from diffmst_tpu.mixing.naive import NaiveRandomMix, naive_random_mix

__all__ = [
    "NaiveRandomMix",
    "naive_random_mix",
    "knowledge_engineering_mix",
    "instrument_metadata",
]
