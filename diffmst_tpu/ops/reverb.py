"""Noise-shaped artificial reverberation (12-band filtered-noise IR).

Reimplements the FX-bus reverb of the reference console
(/root/reference/mst/modules.py:277-283: ``noise_shaped_reverberation`` with
num_samples=65536, num_bandpass_taps=1023; 12 band gains + 12 band decays +
wet/dry mix, ranges at modules.py:152-178).

Method: white noise is split into 12 octave bands with a windowed-sinc FIR
filterbank, each band is shaped by an exponentially decaying envelope whose
rate is the (scaled) band decay parameter, the bands are averaged into a
stereo impulse response, and the IR is convolved with the input via FFT.
Everything is batched FFT + elementwise work — no sequential state — so it
maps directly onto the TPU VPU/FFT path.

JAX requires explicit randomness: pass ``key`` for reproducible noise. The
reference draws fresh torch noise per call; thread a fresh key per step for
equivalent behavior.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["octave_band_filterbank", "noise_shaped_reverberation", "fft_convolve"]


@functools.lru_cache(maxsize=8)
def octave_band_filterbank(num_taps: int, sample_rate: float) -> np.ndarray:
    """12-band windowed-sinc FIR filterbank: lowpass, 10 octave bandpasses, highpass.

    Octave center frequencies 31.5 Hz .. 16 kHz; band edges at +-1/2 octave.
    Returns a static (12, num_taps) float32 array (host-computed constant).
    """
    centers = [31.5, 63.0, 125.0, 250.0, 500.0, 1000.0, 2000.0, 4000.0, 8000.0, 16000.0]
    n = np.arange(num_taps) - (num_taps - 1) / 2.0
    window = np.hanning(num_taps)

    def sinc_lowpass(fc: float) -> np.ndarray:
        wc = 2.0 * fc / sample_rate
        h = wc * np.sinc(wc * n)
        return h * window

    filters = []
    # Band 0: lowpass below the lowest octave's lower edge.
    low_edge = centers[0] / math.sqrt(2.0)
    filters.append(sinc_lowpass(low_edge))
    # Bands 1-10: octave bandpasses (difference of lowpasses).
    for fc in centers:
        f_lo = fc / math.sqrt(2.0)
        f_hi = min(fc * math.sqrt(2.0), sample_rate / 2.0 * 0.999)
        filters.append(sinc_lowpass(f_hi) - sinc_lowpass(f_lo))
    # Band 11: highpass above the highest octave's upper edge (spectral inversion).
    hi_edge = min(centers[-1] * math.sqrt(2.0), sample_rate / 2.0 * 0.999)
    hp = -sinc_lowpass(hi_edge)
    hp[(num_taps - 1) // 2] += 1.0
    filters.append(hp)
    return np.stack(filters).astype(np.float32)


def next_fast_len(n: int) -> int:
    """Smallest 5-smooth (2^a 3^b 5^c) integer >= n.

    XLA:TPU lowers FFTs whose length contains a large prime factor to a dense
    DFT matmul (observed: length 327679 -> an 18 GB f32[67580, 67580]
    allocation). Always padding convolutions to a 5-smooth length keeps the
    FFT on the fast path.
    """
    if n <= 1:
        return 1
    best = 1 << (n - 1).bit_length()  # next power of two is an upper bound
    p5 = 1
    while p5 < best:
        p35 = p5
        while p35 < best:
            # smallest power-of-two multiple of p35 that is >= n
            q = p35 * max(1, 1 << max(0, (n + p35 - 1) // p35 - 1).bit_length())
            while q < n:
                q *= 2
            while q // 2 >= n and q % 2 == 0:
                q //= 2
            if n <= q < best:
                best = q
            p35 *= 3
        p5 *= 5
    return best


def fft_convolve(x: jnp.ndarray, h: jnp.ndarray, mode: str = "causal") -> jnp.ndarray:
    """Linear convolution along the last axis via FFT.

    Args:
      x: signal (..., T).
      h: kernel (..., K), broadcastable against x's leading dims.
      mode: "causal" returns the first T samples of the full convolution
        (y[n] = sum_m h[m] x[n-m]); "full" returns T+K-1; "valid" returns the
        fully-overlapped T-K+1 region starting at lag K-1.

    Returns:
      Convolved signal.
    """
    t, k = x.shape[-1], h.shape[-1]
    n_min = t + k - 1
    n = next_fast_len(n_min)
    X = jnp.fft.rfft(x, n=n, axis=-1)
    Hf = jnp.fft.rfft(h, n=n, axis=-1)
    y = jnp.fft.irfft(X * Hf, n=n, axis=-1)[..., :n_min]
    if mode == "full":
        return y
    if mode == "causal":
        return y[..., :t]
    if mode == "valid":
        return y[..., k - 1 : t]
    raise ValueError(f"unknown mode: {mode!r}")


def noise_shaped_reverberation(
    x: jnp.ndarray,
    sample_rate: float,
    band0_gain: jnp.ndarray,
    band1_gain: jnp.ndarray,
    band2_gain: jnp.ndarray,
    band3_gain: jnp.ndarray,
    band4_gain: jnp.ndarray,
    band5_gain: jnp.ndarray,
    band6_gain: jnp.ndarray,
    band7_gain: jnp.ndarray,
    band8_gain: jnp.ndarray,
    band9_gain: jnp.ndarray,
    band10_gain: jnp.ndarray,
    band11_gain: jnp.ndarray,
    band0_decay: jnp.ndarray,
    band1_decay: jnp.ndarray,
    band2_decay: jnp.ndarray,
    band3_decay: jnp.ndarray,
    band4_decay: jnp.ndarray,
    band5_decay: jnp.ndarray,
    band6_decay: jnp.ndarray,
    band7_decay: jnp.ndarray,
    band8_decay: jnp.ndarray,
    band9_decay: jnp.ndarray,
    band10_decay: jnp.ndarray,
    band11_decay: jnp.ndarray,
    mix: jnp.ndarray,
    num_samples: int = 65536,
    num_bandpass_taps: int = 1023,
    key: jax.Array | None = None,
) -> jnp.ndarray:
    """Apply stereo noise-shaped reverberation.

    Args:
      x: stereo bus with shape (batch, 2, time).
      band*_gain / band*_decay: per-band parameters in [0, 1], shape (batch,).
      mix: wet/dry mix in [0, 1], shape (batch,) (forced to 1.0 by the
        reference console at modules.py:420).
      key: PRNG key for the noise IR; defaults to a fixed key (deterministic).

    Returns:
      Reverberated stereo bus, shape (batch, 2, time).
    """
    bs, chs, seq_len = x.shape
    if key is None:
        key = jax.random.PRNGKey(0)

    gains = jnp.stack(
        [band0_gain, band1_gain, band2_gain, band3_gain, band4_gain, band5_gain,
         band6_gain, band7_gain, band8_gain, band9_gain, band10_gain, band11_gain],
        axis=-1,
    )  # (bs, 12)
    decays = jnp.stack(
        [band0_decay, band1_decay, band2_decay, band3_decay, band4_decay, band5_decay,
         band6_decay, band7_decay, band8_decay, band9_decay, band10_decay, band11_decay],
        axis=-1,
    )  # (bs, 12)

    filters = jnp.asarray(octave_band_filterbank(num_bandpass_taps, sample_rate))

    # Per-channel white noise, filtered into bands with a 'valid' convolution
    # so every IR sample sees a fully-formed bandpass response.
    pad = num_bandpass_taps - 1
    noise = jax.random.normal(key, (bs, chs, 12, num_samples + pad), dtype=x.dtype)
    band_noise = fft_convolve(noise, filters[None, None, :, :], mode="valid")

    # Exponential band envelopes: decay in [0,1] -> rate in [1, 11] over the IR.
    t = jnp.linspace(0.0, 1.0, num_samples, dtype=x.dtype)
    rate = decays * 10.0 + 1.0  # (bs, 12)
    env = jnp.exp(-rate[..., None] * t[None, None, :])  # (bs, 12, T_ir)
    shaped = band_noise * (env * gains[..., None])[:, None, :, :]

    ir = jnp.mean(shaped, axis=2)  # (bs, chs, T_ir)

    wet = fft_convolve(x, ir, mode="causal")
    m = mix.reshape(bs, 1, 1)
    return ((1.0 - m) * x + m * wet).astype(x.dtype)
