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

import jax
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

    Evaluated by direct polynomial evaluation at z = e^{-jw_k} — bit-for-bit
    the same quantity as the frequency-sampling method's rFFT of the
    zero-padded 3-tap numerator/denominator (a 3-term DFT IS the polynomial
    evaluated on the grid), without materializing the padding. The earlier
    rfft formulation zero-padded each (..., n_sections, 3) coefficient row to
    the full segment length (2 x 201 MB at the flagship shape) and spent real
    device time on pad + FFT layout copies (measured 16 ms/step pad plus a
    share of 34 ms/step data formatting, logs/train_step_top_ops.json); the
    direct form is one fused elementwise kernel over the output bins. The
    section product runs as a static Python loop so XLA fuses the whole
    cascade without a (..., n_sections, bins) intermediate.

    Args:
      b, a: coefficients with shape (..., n_sections, 3).
      n_fft: FFT size (number of rFFT bins = n_fft // 2 + 1).

    Returns:
      H with shape (..., n_fft // 2 + 1), complex64.
    """
    # Evaluate each 3-tap polynomial multiplied through by e^{jw} (the factor
    # cancels in the B/A ratio):  P(e^{-jw}) e^{jw} = p1 + (p0+p2) cos w
    # + j (p0-p2) sin w.  Writing the real part as (p0+p1+p2) + (p0+p2)
    # (cos w - 1) with cos w - 1 = -2 sin^2(w/2) keeps low-frequency bins
    # well-conditioned in float32 (no 1 - cos w cancellation) and needs no
    # double-angle terms.
    k = jnp.arange(n_fft // 2 + 1, dtype=jnp.float32)
    half_w = (math.pi / n_fft) * k
    sin_half = jnp.sin(half_w)
    cos_m1 = -2.0 * sin_half * sin_half  # cos w - 1
    sin_w = jnp.sin(2.0 * half_w)
    H = None
    for s in range(b.shape[-2]):
        b0, b1, b2 = b[..., s, 0:1], b[..., s, 1:2], b[..., s, 2:3]
        a0, a1, a2 = a[..., s, 0:1], a[..., s, 1:2], a[..., s, 2:3]
        num = jax.lax.complex(
            (b0 + b1 + b2) + (b0 + b2) * cos_m1, (b0 - b2) * sin_w
        )
        den = jax.lax.complex(
            (a0 + a1 + a2) + (a0 + a2) * cos_m1, (a0 - a2) * sin_w
        )
        H = num / den if H is None else H * (num / den)
    return H
