"""L7/L9 — utilities: audio ops, inference, config registry, checkpoints."""

from diffmst_tpu.utils.audio import (
    batch_stereo_peak_normalize,
    causal_crop,
    center_crop,
    fade_in_and_fade_out,
)
from diffmst_tpu.utils.config import instantiate, load_config
from diffmst_tpu.utils.inference import overlap_add_render, run_diffmst

__all__ = [
    "batch_stereo_peak_normalize",
    "causal_crop",
    "center_crop",
    "fade_in_and_fade_out",
    "instantiate",
    "load_config",
    "overlap_add_render",
    "run_diffmst",
]
