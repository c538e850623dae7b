"""Biquad coefficient builders (RBJ Audio-EQ-Cookbook forms).

Produces normalized second-order section (SOS) coefficients for the shelving
and peaking filters that make up the 6-band parametric EQ of the mix console
(parameter layout pinned by /root/reference/mst/modules.py:124-143,357-375).

Coefficients are computed fully vectorized — any leading batch shape — so a
(batch*tracks, 6)-section cascade is one fused elementwise computation on the
VPU, followed by FFT-domain application (see ops/eq.py).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp

__all__ = ["biquad", "sos_frequency_response", "LOW_SHELF", "HIGH_SHELF", "PEAKING"]

LOW_SHELF = "low_shelf"
HIGH_SHELF = "high_shelf"
PEAKING = "peaking"


def biquad(
    gain_db: jnp.ndarray,
    cutoff_freq: jnp.ndarray,
    q_factor: jnp.ndarray,
    sample_rate: float,
    filter_type: str,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compute biquad (b, a) coefficients, normalized so a0 == 1.

    Args:
      gain_db / cutoff_freq / q_factor: arrays of identical shape (...,).
      sample_rate: audio sample rate in Hz (static).
      filter_type: one of "low_shelf", "high_shelf", "peaking".

    Returns:
      (b, a): each with shape (..., 3), float32, a[..., 0] == 1.
    """
    A = jnp.power(10.0, gain_db / 40.0)
    w0 = 2.0 * math.pi * (cutoff_freq / sample_rate)
    cos_w0 = jnp.cos(w0)
    alpha = jnp.sin(w0) / (2.0 * q_factor)
    sqrt_A = jnp.sqrt(A)

    if filter_type == PEAKING:
        b0 = 1.0 + alpha * A
        b1 = -2.0 * cos_w0
        b2 = 1.0 - alpha * A
        a0 = 1.0 + alpha / A
        a1 = -2.0 * cos_w0
        a2 = 1.0 - alpha / A
    elif filter_type == LOW_SHELF:
        b0 = A * ((A + 1.0) - (A - 1.0) * cos_w0 + 2.0 * sqrt_A * alpha)
        b1 = 2.0 * A * ((A - 1.0) - (A + 1.0) * cos_w0)
        b2 = A * ((A + 1.0) - (A - 1.0) * cos_w0 - 2.0 * sqrt_A * alpha)
        a0 = (A + 1.0) + (A - 1.0) * cos_w0 + 2.0 * sqrt_A * alpha
        a1 = -2.0 * ((A - 1.0) + (A + 1.0) * cos_w0)
        a2 = (A + 1.0) + (A - 1.0) * cos_w0 - 2.0 * sqrt_A * alpha
    elif filter_type == HIGH_SHELF:
        b0 = A * ((A + 1.0) + (A - 1.0) * cos_w0 + 2.0 * sqrt_A * alpha)
        b1 = -2.0 * A * ((A - 1.0) + (A + 1.0) * cos_w0)
        b2 = A * ((A + 1.0) + (A - 1.0) * cos_w0 - 2.0 * sqrt_A * alpha)
        a0 = (A + 1.0) - (A - 1.0) * cos_w0 + 2.0 * sqrt_A * alpha
        a1 = 2.0 * ((A - 1.0) - (A + 1.0) * cos_w0)
        a2 = (A + 1.0) - (A - 1.0) * cos_w0 - 2.0 * sqrt_A * alpha
    else:
        raise ValueError(f"unknown filter_type: {filter_type!r}")

    b = jnp.stack([b0, b1, b2], axis=-1) / a0[..., None]
    a = jnp.stack([a0, a1, a2], axis=-1) / a0[..., None]
    return b, a


def sos_frequency_response(
    b: jnp.ndarray, a: jnp.ndarray, n_fft: int
) -> jnp.ndarray:
    """Complex frequency response of a cascade of biquads on an rFFT grid.

    H(e^{jw_k}) = prod_s  B_s(e^{jw_k}) / A_s(e^{jw_k}),  w_k = 2 pi k / n_fft.

    Evaluated as the ratio of length-``n_fft`` rFFTs of the (zero-padded)
    numerator/denominator polynomials — the frequency-sampling method; this is
    how the reference's DSP dependency approximates IIR filtering, and it maps
    onto TPU as a pair of batched small FFTs plus an elementwise product-reduce.

    Args:
      b, a: coefficients with shape (..., n_sections, 3).
      n_fft: FFT size (number of rFFT bins = n_fft // 2 + 1).

    Returns:
      H with shape (..., n_fft // 2 + 1), complex64.
    """
    B = jnp.fft.rfft(b, n=n_fft, axis=-1)
    A = jnp.fft.rfft(a, n=n_fft, axis=-1)
    return jnp.prod(B / A, axis=-2)
