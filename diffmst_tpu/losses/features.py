"""Audio-feature loss (AFLoss) and its differentiable feature transforms.

Rebuild of /root/reference/mst/loss.py:62-260: weighted MSE over five
features of predicted vs target stereo mixes — RMS, crest factor, stereo
width, stereo imbalance, and a 24-band Bark spectrum (32768-point STFT,
mid-side by default). Shipped weights: [0.1, 0.001, 1.0, 1.0, 0.1]
(configs/models/naive+feat.yaml:63-69).

Returns a dict of named weighted losses like the reference; the training
step sums the values.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp

from diffmst_tpu.losses.filterbank import barkscale_fbanks
from diffmst_tpu.ops.stft import stft as _stft_fn

__all__ = [
    "compute_rms",
    "compute_crest_factor",
    "compute_stereo_width",
    "compute_stereo_imbalance",
    "compute_barkspectrum",
    "compute_melspectrum",
    "AudioFeatureLoss",
]


def compute_rms(x: jnp.ndarray, **kwargs) -> jnp.ndarray:
    """Root-mean-square energy per channel: (bs, chs, T) -> (bs, chs)."""
    return jnp.sqrt(jnp.maximum(jnp.mean(jnp.square(x), axis=-1), 1e-8))


def compute_crest_factor(x: jnp.ndarray, **kwargs) -> jnp.ndarray:
    """Peak-to-RMS ratio in dB: (bs, chs, T) -> (bs, chs)."""
    num = jnp.max(jnp.abs(x), axis=-1)
    den = jnp.maximum(compute_rms(x), 1e-8)
    return 20.0 * jnp.log10(jnp.maximum(num / den, 1e-8))


def compute_stereo_width(x: jnp.ndarray, **kwargs) -> jnp.ndarray:
    """Sum/difference energy ratio: (bs, 2, T) -> (bs,)."""
    x_sum = x[:, 0, :] + x[:, 1, :]
    x_diff = x[:, 0, :] - x[:, 1, :]
    sum_energy = jnp.mean(jnp.square(x_sum), axis=-1)
    diff_energy = jnp.mean(jnp.square(x_diff), axis=-1)
    return diff_energy / jnp.maximum(sum_energy, 1e-8)


def compute_stereo_imbalance(x: jnp.ndarray, **kwargs) -> jnp.ndarray:
    """L/R energy imbalance: (bs, 2, T) -> (bs,)."""
    left = jnp.mean(jnp.square(x[:, 0, :]), axis=-1)
    right = jnp.mean(jnp.square(x[:, 1, :]), axis=-1)
    return (right - left) / jnp.maximum(right + left, 1e-8)


def compute_barkspectrum(
    x: jnp.ndarray,
    fft_size: int = 32768,
    n_bands: int = 24,
    sample_rate: int = 44100,
    f_min: float = 20.0,
    f_max: float = 20000.0,
    mode: str = "mid-side",
    **kwargs,
) -> jnp.ndarray:
    """Log Bark-band spectrum: (bs, 2, T) -> (bs, n_bands, n_signals).

    mode: "mono" (channel mean), "stereo" (L, R), "mid-side" (L+R, L-R;
    the reference default, loss.py:69).
    """
    fb = jnp.asarray(
        barkscale_fbanks(fft_size // 2 + 1, f_min, f_max, n_bands, int(sample_rate))
    ).T  # (n_barks, n_freqs)

    if mode == "mono":
        signals = [jnp.mean(x, axis=1)]
    elif mode == "stereo":
        signals = [x[:, 0, :], x[:, 1, :]]
    elif mode == "mid-side":
        signals = [x[:, 0, :] + x[:, 1, :], x[:, 0, :] - x[:, 1, :]]
    else:
        raise ValueError(f"invalid mode {mode}")

    outs = []
    for s in signals:
        X = _stft_fn(s, fft_size, fft_size // 4)  # (bs, bins, frames)
        X = jnp.abs(X).mean(axis=-1, keepdims=True)  # mean over time
        B = jnp.matmul(fb[None], X)  # (bs, n_barks, 1)
        outs.append(jnp.log(B + 1e-8))
    return jnp.concatenate(outs, axis=-1)


def compute_melspectrum(
    x: jnp.ndarray,
    sample_rate: int = 44100,
    fft_size: int = 32768,
    n_bins: int = 128,
    **kwargs,
) -> jnp.ndarray:
    """Mel variant (defined but not in the reference's active transform list;
    uses a slaney-style mel filterbank computed on host)."""
    import functools

    import numpy as np

    @functools.lru_cache(maxsize=4)
    def _mel_fb(sr, nfft, nb):
        def hz_to_mel(f):
            return 2595.0 * np.log10(1.0 + f / 700.0)

        def mel_to_hz(m):
            return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

        m_pts = np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2), nb + 2)
        f_pts = mel_to_hz(m_pts)
        all_freqs = np.linspace(0, sr / 2, nfft // 2 + 1)
        f_diff = f_pts[1:] - f_pts[:-1]
        slopes = f_pts[None, :] - all_freqs[:, None]
        down = -slopes[:, :-2] / f_diff[:-1]
        up = slopes[:, 2:] / f_diff[1:]
        return np.maximum(0, np.minimum(down, up)).astype(np.float32).T

    fb = jnp.asarray(_mel_fb(int(sample_rate), fft_size, n_bins))
    xm = jnp.mean(x, axis=1)  # mono
    X = jnp.abs(jnp.fft.rfft(xm, n=fft_size, axis=-1))[:, :, None]
    return jnp.log(jnp.matmul(fb[None], X) + 1e-8)


_TRANSFORMS = {
    "rms": compute_rms,
    "crest_factor": compute_crest_factor,
    "stereo_width": compute_stereo_width,
    "stereo_imbalance": compute_stereo_imbalance,
    "barkspectrum": compute_barkspectrum,
}


@dataclasses.dataclass(frozen=True)
class AudioFeatureLoss:
    """Weighted MSE over the five mix features; returns a named-loss dict."""

    weights: Sequence[float] = (0.1, 0.001, 1.0, 1.0, 0.1)
    sample_rate: int = 44100
    stem_separation: bool = False  # accepted for config parity (unused, as in ref)
    use_clap: bool = False  # stale reference option; must stay False
    barkspectrum_fft_size: int = 32768

    def __post_init__(self):
        if len(self.weights) != len(_TRANSFORMS):
            raise ValueError(
                f"expected {len(_TRANSFORMS)} weights, got {len(self.weights)}"
            )
        if self.use_clap:
            raise NotImplementedError(
                "CLAP loss was removed from the reference (StereoCLAPLoss is "
                "undefined there); not supported."
            )

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray):
        """(bs, 2, T) pred/target -> dict of weighted scalar losses."""
        losses = {}
        for (name, fn), w in zip(_TRANSFORMS.items(), self.weights):
            kwargs = {"sample_rate": self.sample_rate}
            if name == "barkspectrum":
                kwargs["fft_size"] = self.barkspectrum_fft_size
            p = fn(pred, **kwargs)
            t = fn(target, **kwargs)
            losses[f"mix-{name}"] = w * jnp.mean(jnp.square(p - t))
        return losses
