"""Differentiable feed-forward dynamic range compressor.

Reimplements the compressor used by the reference console
(/root/reference/mst/modules.py:245-254 track chain with lookahead 2048,
modules.py:300-305 master bus with lookahead 1024; parameter ranges at
modules.py:144-151). The design follows the standard feed-forward digital
compressor (Giannoulis et al., "Digital dynamic range compressor design — a
tutorial and analysis", JAES 2012): dB-domain level detector, soft-knee static
curve, gain computer, one-pole ballistics, lookahead, makeup gain.

Three interchangeable ballistics smoothers, all pure JAX:

  * ``"fsm"`` (default; reference-compatible): a single one-pole smoother
    using the *attack* coefficient only, applied via the frequency-sampling
    method (circular FFT). This reproduces the reference's observable
    behavior — its release parameter is a dummy (see
    /root/reference/tests/test_comp.py:28, "dummy parameter") and its smoother
    is a full-segment FFT approximation. Fully parallel over time.

  * ``"scan"``: the same attack-only one-pole but evaluated *causally and
    exactly* as a first-order linear recurrence with
    ``jax.lax.associative_scan`` — no circular wrap-around artifacts,
    O(log T) depth on TPU.

  * ``"ballistics"``: true attack/release branching ballistics
    (attack coefficient while gain reduction deepens, release while it
    recovers) via ``jax.lax.scan``. Exact but sequential over time; used as
    the golden model in tests and for offline high-quality rendering.

Kernel-backed variants (diffmst_tpu/kernels/scan1p.py — a Pallas TPU kernel
that streams the recurrence through VMEM in one HBM pass, with custom VJPs):

  * ``"scan_pallas"``: numerically identical to ``"scan"``, TPU-fast.
  * ``"decoupled"``: attack/release smoothing with a working release, fully
    parallel. The decoupled peak smoother (Giannoulis et al. §IV-C) in
    gain-reduction form:
        y1[n] = min(g[n], ar*y1[n-1] + (1-ar)*g[n])   (release stage)
        y[n]  = aa*y[n-1] + (1-aa)*y1[n]              (attack one-pole)
    The release stage looks nonlinear, but transfer functions
    f(y) = min(c, a*y + d) are closed under composition —
    (a, d, c) composes associatively — so it is an
    ``associative_scan`` too. Unlike the state-dependent ``"ballistics"``
    branching (inherently sequential), this runs in O(log T) depth and is
    the recommended high-quality mode for full-song rendering.
  * ``"auto"``: resolves to ``"scan"`` — measured fastest exact-causal
    fwd+bwd on TPU v5e (scripts/microbench_tpu.py; the Pallas kernel's
    custom VJP is slower to differentiate than XLA's native scan).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["compressor", "compressor_gain_db"]

_LOG9 = math.log(9.0)


def _ballistics_coeff(time_ms: jnp.ndarray, sample_rate: float) -> jnp.ndarray:
    """One-pole coefficient for a 10%-90% rise time of ``time_ms``."""
    time_samples = sample_rate * (time_ms / 1e3)
    return jnp.exp(-_LOG9 / jnp.maximum(time_samples, 1.0))


def _static_gain_db(
    x_db: jnp.ndarray,
    threshold_db: jnp.ndarray,
    ratio: jnp.ndarray,
    knee_db: jnp.ndarray,
) -> jnp.ndarray:
    """Soft-knee static curve output minus input: the raw gain in dB (<= 0)."""
    over = x_db - threshold_db
    # Quadratic soft-knee interpolation within +-knee/2 of the threshold.
    knee = jnp.maximum(knee_db, 1e-3)
    in_knee = (1.0 / ratio - 1.0) * jnp.square(over + knee / 2.0) / (2.0 * knee)
    above = (1.0 / ratio - 1.0) * over
    g = jnp.where(over <= -knee / 2.0, 0.0, jnp.where(over >= knee / 2.0, above, in_knee))
    return g


def _smooth_fsm(g_db: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """One-pole smoother applied via frequency sampling (circular FFT).

    H(z) = (1 - a) / (1 - a z^-1), evaluated on the length-T rFFT grid.
    g_db: (B, T), alpha: (B,).
    """
    n = g_db.shape[-1]
    k = jnp.fft.rfftfreq(n)  # cycles/sample
    z_inv = jnp.exp(-2j * math.pi * k)[None, :]
    a = alpha[:, None]
    H = (1.0 - a) / (1.0 - a * z_inv)
    G = jnp.fft.rfft(g_db, n=n, axis=-1)
    return jnp.fft.irfft(G * H, n=n, axis=-1)


def _smooth_scan(g_db: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Exact causal one-pole y[n] = a*y[n-1] + (1-a)*g[n] via associative scan."""
    a = jnp.broadcast_to(alpha[:, None], g_db.shape)
    b = (1.0 - a) * g_db

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 * a2, a2 * b1 + b2

    _, y = jax.lax.associative_scan(combine, (a, b), axis=-1)
    return y


def _smooth_scan_tv(g_db: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Time-varying y[n] = a[n]*y[n-1] + (1-a[n])*g[n] via associative scan."""
    b = (1.0 - a) * g_db

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 * a2, a2 * b1 + b2

    _, y = jax.lax.associative_scan(combine, (a, b), axis=-1)
    return y


def _release_min_scan(g_db: jnp.ndarray, alpha_r: jnp.ndarray) -> jnp.ndarray:
    """y1[n] = min(g[n], ar*y1[n-1] + (1-ar)*g[n]) via associative scan.

    Transfer maps f(y) = min(c, a*y + d) compose as
        (f2 . f1)(y) = min(min(c2, a2*c1 + d2), (a1*a2)*y + (a2*d1 + d2))
    so the triple (a, d, c) is an associative monoid element; the state
    entering the segment is 0 dB (no reduction), giving y1 = min(C, D).
    """
    a = jnp.broadcast_to(alpha_r[:, None], g_db.shape)
    d = (1.0 - a) * g_db
    c = g_db

    def combine(left, right):
        a1, d1, c1 = left
        a2, d2, c2 = right
        return a1 * a2, a2 * d1 + d2, jnp.minimum(c2, a2 * c1 + d2)

    _, D, C = jax.lax.associative_scan(combine, (a, d, c), axis=-1)
    return jnp.minimum(C, D)


def _smooth_decoupled(
    g_db: jnp.ndarray, alpha_a: jnp.ndarray, alpha_r: jnp.ndarray,
    use_pallas: bool = False, interpret: bool = False,
) -> jnp.ndarray:
    """Decoupled attack/release smoother — release min-scan then attack pole."""
    if use_pallas:
        from diffmst_tpu.kernels.scan1p import onepole_scan, release_min_scan

        y1 = release_min_scan(g_db, alpha_r, interpret=interpret)
        return onepole_scan(y1, alpha_a, interpret=interpret)
    y1 = _release_min_scan(g_db, alpha_r)
    return _smooth_scan(y1, alpha_a)


def _smooth_ballistics(
    g_db: jnp.ndarray, alpha_a: jnp.ndarray, alpha_r: jnp.ndarray
) -> jnp.ndarray:
    """Exact branching attack/release smoother (sequential lax.scan).

    Attack coefficient while the (negative) gain dips below the state,
    release coefficient while it recovers toward 0 dB.
    """

    def step(y_prev, g_t):
        a = jnp.where(g_t < y_prev, alpha_a, alpha_r)
        y_t = a * y_prev + (1.0 - a) * g_t
        return y_t, y_t

    y0 = jnp.zeros(g_db.shape[:-1], g_db.dtype)
    _, y = jax.lax.scan(step, y0, jnp.moveaxis(g_db, -1, 0))
    return jnp.moveaxis(y, 0, -1)


def compressor_gain_db(
    x: jnp.ndarray,
    sample_rate: float,
    threshold_db: jnp.ndarray,
    ratio: jnp.ndarray,
    attack_ms: jnp.ndarray,
    release_ms: jnp.ndarray,
    knee_db: jnp.ndarray,
    smoother: str = "fsm",
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Smoothed gain-reduction envelope in dB for flat (B, T) input."""
    x_db = 20.0 * jnp.log10(jnp.maximum(jnp.abs(x), eps))
    g_c = _static_gain_db(
        x_db, threshold_db[:, None], ratio[:, None], knee_db[:, None]
    )
    alpha_a = _ballistics_coeff(attack_ms, sample_rate)
    if smoother == "auto":
        # Measured on TPU v5e (scripts/microbench_tpu.py, 8 x 262,144):
        # XLA associative_scan beats the Pallas kernel on fwd+bwd
        # (7.6 ms vs 9.6 ms) with identical numerics — XLA's native scan
        # differentiation is cheaper than the kernel's custom VJP. The
        # kernel remains available as "scan_pallas".
        smoother = "scan"
    if smoother == "fsm":
        return _smooth_fsm(g_c, alpha_a)
    if smoother == "scan":
        return _smooth_scan(g_c, alpha_a)
    if smoother in ("scan_pallas", "scan_pallas_interpret"):
        from diffmst_tpu.kernels.scan1p import onepole_scan

        return onepole_scan(
            g_c, alpha_a, interpret=smoother.endswith("interpret")
        )
    if smoother in ("decoupled", "decoupled_pallas", "decoupled_pallas_interpret"):
        alpha_r = _ballistics_coeff(release_ms, sample_rate)
        return _smooth_decoupled(
            g_c, alpha_a, alpha_r,
            use_pallas=smoother != "decoupled",
            interpret=smoother.endswith("interpret"),
        )
    if smoother == "ballistics":
        alpha_r = _ballistics_coeff(release_ms, sample_rate)
        return _smooth_ballistics(g_c, alpha_a, alpha_r)
    raise ValueError(f"unknown smoother: {smoother!r}")


def compressor(
    x: jnp.ndarray,
    sample_rate: float,
    threshold_db: jnp.ndarray,
    ratio: jnp.ndarray,
    attack_ms: jnp.ndarray,
    release_ms: jnp.ndarray,
    knee_db: jnp.ndarray,
    makeup_gain_db: jnp.ndarray,
    lookahead_samples: int = 0,
    smoother: str = "fsm",
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Feed-forward compressor over (batch, channels, time) audio.

    Channels are compressed independently (folded into the batch axis, as the
    reference does); parameters have shape (batch,) — shared across channels —
    or (batch, channels). With ``lookahead_samples > 0`` the signal is delayed
    relative to the detector so gain reduction anticipates transients (the
    reference uses a circular roll; reproduced here).
    """
    bs, chs, seq_len = x.shape

    def bc(p):
        return jnp.broadcast_to(p.reshape(bs, -1), (bs, chs)).reshape(bs * chs)

    flat = x.reshape(bs * chs, seq_len)
    if smoother in ("fused_pallas", "fused_pallas_interpret"):
        # single-pass Pallas kernel: detector + knee + scan + gain application
        # (kernels/comp_fused.py); numerics == the "scan" path.
        from diffmst_tpu.kernels.comp_fused import compressor_fused_gain

        delayed = (
            jnp.roll(flat, lookahead_samples, axis=-1)
            if lookahead_samples > 0
            else flat
        )
        y = compressor_fused_gain(
            flat,
            delayed,
            bc(threshold_db),
            bc(ratio),
            bc(knee_db),
            _ballistics_coeff(bc(attack_ms), sample_rate),
            bc(makeup_gain_db),
            512,
            eps,
            smoother.endswith("interpret"),
        )
        return y.reshape(bs, chs, seq_len).astype(x.dtype)
    g_s = compressor_gain_db(
        flat,
        sample_rate,
        bc(threshold_db),
        bc(ratio),
        bc(attack_ms),
        bc(release_ms),
        bc(knee_db),
        smoother=smoother,
        eps=eps,
    )
    gain_lin = jnp.power(10.0, (g_s + bc(makeup_gain_db)[:, None]) / 20.0)
    if lookahead_samples > 0:
        flat = jnp.roll(flat, lookahead_samples, axis=-1)
    y = flat * gain_lin
    return y.reshape(bs, chs, seq_len).astype(x.dtype)
