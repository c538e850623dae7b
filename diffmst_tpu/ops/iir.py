"""Exact time-domain IIR filtering as parallel scans (sosfilt for TPU).

The console's EQ applies its biquad cascade with the frequency-sampling
method (ops/eq.py) — the reference's numerical method (circular
convolution). This module provides the *causal, exact* alternative in
**transposed direct form II**, whose recurrence

    y[n]  = b0 x[n] + s1[n-1]
    s1[n] = (b1 - a1 b0) x[n] - a1 s1[n-1] + s2[n-1]
    s2[n] = (b2 - a2 b0) x[n] - a2 s1[n-1]

is a first-order affine recurrence on the state v = (s1, s2):

    v[n] = M v[n-1] + u[n],  M = [[-a1, 1], [-a2, 0]],
    u[n] = ((b1 - a1 b0) x[n], (b2 - a2 b0) x[n])

Affine maps (M, u) compose associatively, so the section runs in O(log T)
depth with ``jax.lax.associative_scan`` — no FFT, no sequential loop.
TDF2 is the numerically robust topology for float32: unlike direct form II
(whose internal state grows like 1/(1-r)^2 and destroys low-frequency
shelving filters in f32), the TDF2 state stays at output scale. A cascade
applies sections in series; the Pallas kernel (kernels/iir_fused.py)
streams all sections through VMEM in ONE HBM pass, with this module as its
reference/autodiff twin and CPU path.

Matches ``scipy.signal.sosfilt`` (zero initial state, TDF2 — scipy's own
topology) — tested. Not bit-equal to the frequency-sampling EQ by
construction (causal vs circular); shipped as the opt-in
``parametric_eq(..., method="scan")``.

f32 envelope: parallel-scan IIR error scales like eps / (1 - r)^2 with the
pole radius r. Measured: <=1e-5 vs float64 scipy at r <= 0.994, ~2e-3 at
r ~ 0.9988, O(1) at r ~ 0.9996 (a 30 Hz high-Q shelf). The default
frequency-sampling EQ has no such limit — that is why it remains the
default and the scan methods are opt-in.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["biquad_scan", "sosfilt_scan"]


def _affine_combine(left, right):
    """(M, t) affine-map composition: right ∘ left (left applied first)."""
    A11, A12, A21, A22, t1, t2 = left
    B11, B12, B21, B22, s1, s2 = right
    # B @ A
    C11 = B11 * A11 + B12 * A21
    C12 = B11 * A12 + B12 * A22
    C21 = B21 * A11 + B22 * A21
    C22 = B21 * A12 + B22 * A22
    # B @ t + s
    u1 = B11 * t1 + B12 * t2 + s1
    u2 = B21 * t1 + B22 * t2 + s2
    return C11, C12, C21, C22, u1, u2


def biquad_scan(x: jnp.ndarray, b: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """One biquad (TDF2), causal, zero initial state.

    Args:
      x: (B, T) signals.
      b, a: (B, 3) normalized coefficients (a[:, 0] == 1).

    Returns:
      Filtered (B, T).
    """
    bs, t = x.shape
    a1 = a[:, 1:2]
    a2 = a[:, 2:3]
    b0 = b[:, 0:1]
    zeros = jnp.zeros((bs, t), x.dtype)
    elems = (
        jnp.broadcast_to(-a1, (bs, t)),  # A11
        jnp.ones((bs, t), x.dtype),      # A12
        jnp.broadcast_to(-a2, (bs, t)),  # A21
        zeros,                           # A22
        (b[:, 1:2] - a1 * b0) * x,       # u1
        (b[:, 2:3] - a2 * b0) * x,       # u2
    )
    _, _, _, _, s1, _ = jax.lax.associative_scan(_affine_combine, elems, axis=-1)
    s1_prev = jnp.concatenate([jnp.zeros_like(s1[:, :1]), s1[:, :-1]], axis=-1)
    return b0 * x + s1_prev


def sosfilt_scan(x: jnp.ndarray, sos_b: jnp.ndarray, sos_a: jnp.ndarray) -> jnp.ndarray:
    """Cascade of second-order sections, causal, zero initial state.

    Args:
      x: (B, T).
      sos_b, sos_a: (B, S, 3) per-section normalized coefficients.

    Returns:
      Filtered (B, T) — scipy.signal.sosfilt semantics.
    """
    y = x
    for s in range(sos_b.shape[1]):
        y = biquad_scan(y, sos_b[:, s], sos_a[:, s])
    return y
