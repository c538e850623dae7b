"""Pallas TPU kernels for the hot console ops."""

from diffmst_tpu.kernels.comp_fused import compressor_fused_gain
from diffmst_tpu.kernels.scan1p import onepole_core, onepole_scan, onepole_scan_tv

__all__ = ["onepole_core", "onepole_scan", "onepole_scan_tv", "compressor_fused_gain"]
