"""Pallas TPU kernels for the hot console ops."""

from diffmst_tpu.kernels.scan1p import onepole_core, onepole_scan, onepole_scan_tv

__all__ = ["onepole_core", "onepole_scan", "onepole_scan_tv"]
