"""L1 — differentiable mix consoles."""

from diffmst_tpu.console.console import (
    AdvancedMixConsole,
    BasicMixConsole,
    ConsoleOutput,
)
from diffmst_tpu.console.ranges import (
    NUM_FX_BUS_PARAMS,
    NUM_MASTER_BUS_PARAMS,
    NUM_TRACK_PARAMS,
    advanced_param_ranges,
    basic_param_ranges,
    denormalize,
    denormalize_parameters,
    normalize,
    split_fx_bus_params,
    split_master_bus_params,
    split_track_params,
    validate_normalized,
)

__all__ = [
    "AdvancedMixConsole",
    "BasicMixConsole",
    "ConsoleOutput",
    "NUM_FX_BUS_PARAMS",
    "NUM_MASTER_BUS_PARAMS",
    "NUM_TRACK_PARAMS",
    "advanced_param_ranges",
    "basic_param_ranges",
    "denormalize",
    "denormalize_parameters",
    "normalize",
    "split_fx_bus_params",
    "split_master_bus_params",
    "split_track_params",
    "validate_normalized",
]
