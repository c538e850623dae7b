"""Pallas TPU kernels for the hot console ops."""

from diffmst_tpu.kernels.comp_fused import compressor_fused_gain
from diffmst_tpu.kernels.iir_fused import sosfilt_pallas
from diffmst_tpu.kernels.scan1p import (
    minscan_core,
    onepole_core,
    onepole_scan,
    onepole_scan_tv,
    release_min_scan,
)

__all__ = [
    "onepole_core",
    "onepole_scan",
    "onepole_scan_tv",
    "minscan_core",
    "release_min_scan",
    "compressor_fused_gain",
    "sosfilt_pallas",
]
