"""Six-band parametric EQ applied with the frequency-sampling method.

Reimplements the behavior of the reference console's per-track/master EQ
(low shelf + 4 peaking bands + high shelf; 18 parameters — see
/root/reference/mst/modules.py:357-375 for the layout and param ranges at
modules.py:124-143). The IIR cascade is approximated by sampling its frequency
response on an rFFT grid of the full segment length and multiplying in the
frequency domain (circular convolution) — exactly the numerical method the
reference inherits from its DSP dependency, and the natural TPU formulation:
one batched rFFT, an elementwise complex multiply, one irFFT.
"""

from __future__ import annotations

import jax.numpy as jnp

from diffmst_tpu.ops.biquad import (
    HIGH_SHELF,
    LOW_SHELF,
    PEAKING,
    biquad as _make_biquad,
    sos_frequency_response,
)

__all__ = ["parametric_eq", "parametric_eq_response"]


def _eq_sos(
    sample_rate: float,
    low_shelf_gain_db: jnp.ndarray,
    low_shelf_cutoff_freq: jnp.ndarray,
    low_shelf_q_factor: jnp.ndarray,
    band0_gain_db: jnp.ndarray,
    band0_cutoff_freq: jnp.ndarray,
    band0_q_factor: jnp.ndarray,
    band1_gain_db: jnp.ndarray,
    band1_cutoff_freq: jnp.ndarray,
    band1_q_factor: jnp.ndarray,
    band2_gain_db: jnp.ndarray,
    band2_cutoff_freq: jnp.ndarray,
    band2_q_factor: jnp.ndarray,
    band3_gain_db: jnp.ndarray,
    band3_cutoff_freq: jnp.ndarray,
    band3_q_factor: jnp.ndarray,
    high_shelf_gain_db: jnp.ndarray,
    high_shelf_cutoff_freq: jnp.ndarray,
    high_shelf_q_factor: jnp.ndarray,
):
    """Stack the 6 biquad sections: (b, a) each with shape (..., 6, 3)."""
    gains = jnp.stack(
        [
            low_shelf_gain_db,
            band0_gain_db,
            band1_gain_db,
            band2_gain_db,
            band3_gain_db,
            high_shelf_gain_db,
        ],
        axis=-1,
    )
    freqs = jnp.stack(
        [
            low_shelf_cutoff_freq,
            band0_cutoff_freq,
            band1_cutoff_freq,
            band2_cutoff_freq,
            band3_cutoff_freq,
            high_shelf_cutoff_freq,
        ],
        axis=-1,
    )
    qs = jnp.stack(
        [
            low_shelf_q_factor,
            band0_q_factor,
            band1_q_factor,
            band2_q_factor,
            band3_q_factor,
            high_shelf_q_factor,
        ],
        axis=-1,
    )
    # The three filter types share identical algebra up to the branch on
    # shelf/peak form; compute each family on its slice and restack.
    b_ls, a_ls = _make_biquad(
        gains[..., 0], freqs[..., 0], qs[..., 0], sample_rate, LOW_SHELF
    )
    b_pk, a_pk = _make_biquad(
        gains[..., 1:5], freqs[..., 1:5], qs[..., 1:5], sample_rate, PEAKING
    )
    b_hs, a_hs = _make_biquad(
        gains[..., 5], freqs[..., 5], qs[..., 5], sample_rate, HIGH_SHELF
    )
    b = jnp.concatenate([b_ls[..., None, :], b_pk, b_hs[..., None, :]], axis=-2)
    a = jnp.concatenate([a_ls[..., None, :], a_pk, a_hs[..., None, :]], axis=-2)
    return b, a


def parametric_eq_response(
    sample_rate: float, n_fft: int, **eq_params: jnp.ndarray
) -> jnp.ndarray:
    """Complex cascade response on an rFFT grid; shape (..., n_fft//2+1)."""
    b, a = _eq_sos(sample_rate, **eq_params)
    return sos_frequency_response(b, a, n_fft)


def parametric_eq(
    x: jnp.ndarray,
    sample_rate: float,
    linear_gain: jnp.ndarray | None = None,
    method: str = "fs",
    **eq_params: jnp.ndarray,
) -> jnp.ndarray:
    """Apply the 6-band parametric EQ to audio.

    Args:
      x: audio with shape (batch, channels, time).
      sample_rate: sample rate in Hz (static).
      linear_gain: optional per-batch linear gain folded into the frequency
        response — a fader in series with the EQ costs no extra HBM pass
        (the console folds the input fader here; a time-domain pre-multiply
        cannot fuse into the FFT library call).
      method: "fs" (default) — frequency sampling: circular convolution over
        the full segment, the reference's numerical method; "scan" — exact
        causal IIR via associative scans (ops/iir.py); "scan_pallas" — the
        same cascade fused into one streaming Pallas kernel
        (kernels/iir_fused.py). The causal methods are opt-in deviations
        (no circular wrap-in), same policy as the compressor smoothers.
      **eq_params: the 18 named band parameters, each with shape (batch,)
        (one filter per batch item, shared across channels — matching the
        reference call sites modules.py:237-241 and modules.py:293-297).

    Returns:
      Filtered audio, same shape as ``x``.
    """
    n = x.shape[-1]
    if method in ("scan", "scan_pallas", "scan_pallas_interpret"):
        bs, chs, _ = x.shape
        b, a = _eq_sos(sample_rate, **eq_params)  # (bs, 6, 3)
        b = jnp.repeat(b, chs, axis=0)
        a = jnp.repeat(a, chs, axis=0)
        flat = x.reshape(bs * chs, n)
        if linear_gain is not None:
            flat = flat * jnp.repeat(linear_gain, chs)[:, None]
        if method == "scan":
            from diffmst_tpu.ops.iir import sosfilt_scan

            y = sosfilt_scan(flat, b, a)
        else:
            from diffmst_tpu.kernels.iir_fused import sosfilt_pallas

            y = sosfilt_pallas(
                flat, b, a, 256, method.endswith("interpret")
            )
        return y.reshape(bs, chs, n).astype(x.dtype)
    H = parametric_eq_response(sample_rate, n, **eq_params)  # (batch, bins)
    if linear_gain is not None:
        H = H * linear_gain[:, None].astype(H.real.dtype)
    X = jnp.fft.rfft(x, n=n, axis=-1)
    y = jnp.fft.irfft(X * H[:, None, :], n=n, axis=-1)
    return y.astype(x.dtype)
