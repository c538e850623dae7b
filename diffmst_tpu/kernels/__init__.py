"""Pallas TPU kernels for the hot console ops."""

from diffmst_tpu.kernels.scan1p import onepole_core, onepole_scan

__all__ = ["onepole_core", "onepole_scan"]
