"""Source separation for the Remixer (drums / bass / vocals / other).

The reference separates with torchaudio's pretrained HDEMUCS_HIGH_MUSDB_PLUS
(/root/reference/mst/modules.py:496-500). Pretrained weights cannot be
downloaded in this environment, so two real separators are provided behind
the Remixer's pluggable ``(bs, 2, T) -> (bs, 4, 2, T)`` interface:

  * ``hpss_separator`` — unsupervised spectral-mask separation that works
    with no weights: harmonic/percussive decomposition by median filtering
    (Fitzgerald, "Harmonic/percussive separation using median filtering",
    DAFx 2010) gives the drum stem; the harmonic part is split into bass
    (low band), vocals (center-panned mid content in the vocal band) and
    other. The four soft masks sum to 1 per TF bin, so the stems sum back
    to the input exactly (up to STFT round trip). This is the default
    Remixer separator on real music.

  * ``UNetSeparator`` — a trainable Flax spectrogram U-Net emitting a
    per-stem softmax mask over the mix STFT. Weight-loadable (orbax or the
    torch-porting utilities) for learned separation; random-initialized it
    is only an architecture, so the Remixer does not default to it.

Stems order follows HDEMUCS: (drums, bass, other, vocals).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffmst_tpu.ops.stft import istft, stft

__all__ = ["hpss_separator", "median_filter", "UNetSeparator"]


def median_filter(x: jnp.ndarray, size: int, axis: int) -> jnp.ndarray:
    """Running median along ``axis`` (odd ``size``, edge-padded).

    Materializes the ``size`` shifted views and takes a median over them —
    static shapes, no sorting networks in Python; XLA lowers the median to a
    single sort along the new axis.
    """
    assert size % 2 == 1
    half = size // 2
    axis = axis % x.ndim
    pad = [(0, 0)] * x.ndim
    pad[axis] = (half, half)
    xp = jnp.pad(x, pad, mode="edge")
    idx = [slice(None)] * x.ndim
    shifts = []
    for k in range(size):
        idx[axis] = slice(k, k + x.shape[axis])
        shifts.append(xp[tuple(idx)])
    return jnp.median(jnp.stack(shifts, axis=0), axis=0)


def hpss_separator(
    x: jnp.ndarray,
    sample_rate: float = 44100.0,
    n_fft: int = 2048,
    hop: int = 512,
    kernel: int = 17,
    power: float = 2.0,
    bass_cutoff_hz: float = 250.0,
    vocal_band_hz: Sequence[float] = (200.0, 12000.0),
) -> jnp.ndarray:
    """Mask-based 4-stem separation of a stereo mix: (bs, 2, T) -> (bs, 4, 2, T).

    Masks per TF bin (they sum to exactly 1):
      drums  = percussive soft mask (time-median vs freq-median energies)
      bass   = harmonic mask x lowpass band
      vocals = harmonic mask x high band x center-dominance
      other  = the remainder
    """
    bs, chs, t = x.shape
    X = stft(x, n_fft, hop)  # (bs, 2, bins, frames)
    mag = jnp.abs(X)

    # Fitzgerald HPSS: harmonic energy is smooth in time (median across
    # time), percussive energy is smooth in frequency (median across bins).
    harm = median_filter(mag, kernel, axis=-1) ** power
    perc = median_filter(mag, kernel, axis=-2) ** power
    denom = harm + perc + 1e-10
    m_perc = perc / denom  # drums
    m_harm = harm / denom

    freqs = jnp.fft.rfftfreq(n_fft, 1.0 / sample_rate)
    low = (freqs < bass_cutoff_hz).astype(mag.dtype)[None, None, :, None]
    m_bass = m_harm * low

    # Center dominance from the mid/side magnitude ratio, shared by both
    # channels (vocals sit center-panned in the vocal band).
    mid = jnp.abs(X[:, 0:1] + X[:, 1:2]) / 2.0
    side = jnp.abs(X[:, 0:1] - X[:, 1:2]) / 2.0
    center = jnp.clip((mid - side) / (mid + side + 1e-10), 0.0, 1.0)
    vband = (
        (freqs >= vocal_band_hz[0]) & (freqs < vocal_band_hz[1])
    ).astype(mag.dtype)[None, None, :, None]
    m_voc = m_harm * (1.0 - low) * vband * center

    m_other = 1.0 - m_perc - m_bass - m_voc

    stems = []
    for m in (m_perc, m_bass, m_other, m_voc):  # HDEMUCS stem order
        stems.append(istft(X * m, n_fft, hop, length=t))
    return jnp.stack(stems, axis=1)  # (bs, 4, 2, t)


class UNetSeparator(nn.Module):
    """Spectrogram U-Net emitting softmax masks for ``num_stems`` sources.

    (bs, 2, T) -> (bs, num_stems, 2, T). Compact by design (the Remixer only
    needs plausible stems); channels double per level. Trainable /
    weight-loadable; complements ``hpss_separator``.
    """

    num_stems: int = 4
    base_width: int = 16
    levels: int = 4
    n_fft: int = 2048
    hop: int = 512

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        bs, chs, t = x.shape
        X = stft(x, self.n_fft, self.hop)  # (bs, 2, bins, frames)
        mag = jnp.log1p(jnp.abs(X))
        bins, frames = mag.shape[-2:]
        # NHWC with stereo as input channels; crop to pool-friendly sizes
        h = jnp.moveaxis(mag, 1, -1)  # (bs, bins, frames, 2)
        div = 2 ** self.levels
        h = h[:, : bins - bins % div, : frames - frames % div, :]
        crop_b, crop_f = h.shape[1], h.shape[2]

        skips = []
        w = self.base_width
        for _ in range(self.levels):
            h = nn.Conv(w, (3, 3), padding="SAME")(h)
            h = nn.gelu(h)
            skips.append(h)
            h = nn.Conv(w, (3, 3), strides=(2, 2), padding="SAME")(h)
            h = nn.gelu(h)
            w *= 2
        for skip in reversed(skips):
            w //= 2
            h = nn.ConvTranspose(w, (3, 3), strides=(2, 2), padding="SAME")(h)
            h = nn.gelu(h)
            h = jnp.concatenate([h, skip], axis=-1)
            h = nn.Conv(w, (3, 3), padding="SAME")(h)
            h = nn.gelu(h)
        logits = nn.Conv(self.num_stems, (1, 1))(h)  # (bs, b', f', stems)
        logits = jnp.pad(
            logits,
            ((0, 0), (0, bins - crop_b), (0, frames - crop_f), (0, 0)),
        )
        masks = jax.nn.softmax(logits, axis=-1)
        masks = jnp.moveaxis(masks, -1, 1)[:, :, None]  # (bs, stems, 1, b, f)
        stems = istft(
            X[:, None] * masks, self.n_fft, self.hop, length=t
        )  # (bs, stems, 2, t)
        return stems
