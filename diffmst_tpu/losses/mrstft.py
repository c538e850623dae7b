"""Multi-resolution STFT loss (auraloss-compatible semantics).

Rebuild of the loss the reference trains Method 1 with:
``auraloss.freq.MultiResolutionSTFTLoss(fft_sizes=[512, 2048, 8192],
hop_sizes=[256, 1024, 4096], win_lengths=[512, 2048, 8192], w_sc=0,
w_lin_mag=1, w_log_mag=1)`` — constructed at
/root/reference/mst/system.py:61-69 and configs/models/naive.yaml:54-68.

Per resolution: spectral-convergence, log-magnitude L1, and linear-magnitude
L1 terms, weighted and summed; resolutions are averaged. Channels fold into
the batch. Everything is three batched rFFT sweeps — ideal TPU shape.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp

from diffmst_tpu.ops.stft import stft as _stft_fn

__all__ = ["MultiResolutionSTFTLoss", "stft_loss"]


def _mag(x: jnp.ndarray, n_fft: int, hop: int, win: int, eps: float) -> jnp.ndarray:
    X = _stft_fn(x, n_fft, hop, win_length=win)
    # auraloss: sqrt(clamp(|X|^2, min=eps))
    return jnp.sqrt(jnp.maximum(jnp.real(X) ** 2 + jnp.imag(X) ** 2, eps))


def stft_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    n_fft: int,
    hop: int,
    win: int,
    w_sc: float = 0.0,
    w_log_mag: float = 1.0,
    w_lin_mag: float = 1.0,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Single-resolution STFT loss over (..., T) signals (channels pre-folded)."""
    pm = _mag(pred, n_fft, hop, win, eps)
    tm = _mag(target, n_fft, hop, win, eps)
    loss = 0.0
    if w_sc:
        num = jnp.linalg.norm((tm - pm).reshape(-1))
        den = jnp.linalg.norm(tm.reshape(-1)) + eps
        loss = loss + w_sc * (num / den)
    if w_log_mag:
        loss = loss + w_log_mag * jnp.mean(jnp.abs(jnp.log(tm) - jnp.log(pm)))
    if w_lin_mag:
        loss = loss + w_lin_mag * jnp.mean(jnp.abs(tm - pm))
    return loss


@dataclasses.dataclass(frozen=True)
class MultiResolutionSTFTLoss:
    fft_sizes: Sequence[int] = (512, 2048, 8192)
    hop_sizes: Sequence[int] = (256, 1024, 4096)
    win_lengths: Sequence[int] = (512, 2048, 8192)
    w_sc: float = 0.0
    w_log_mag: float = 1.0
    w_lin_mag: float = 1.0
    w_phs: float = 0.0  # accepted for config parity; phase term unused (as in ref)
    sample_rate: float | None = None

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        """Loss over (bs, chs, T) stereo mixes (channels folded into batch)."""
        if pred.ndim == 3:
            pred = pred.reshape(-1, pred.shape[-1])
            target = target.reshape(-1, target.shape[-1])
        total = 0.0
        for n_fft, hop, win in zip(self.fft_sizes, self.hop_sizes, self.win_lengths):
            total = total + stft_loss(
                pred, target, n_fft, hop, win,
                self.w_sc, self.w_log_mag, self.w_lin_mag,
            )
        return total / len(self.fft_sizes)
