"""Elementwise console primitives: gain, constant-power panner, stereo bus.

TPU-native replacements for the dasp-pytorch ops consumed by the reference
console (see /root/reference/mst/modules.py:7-14 for the imported surface and
modules.py:230-276 for the call sites that define the contracts below).

All functions are pure, jit/vmap-clean, static-shape, and broadcast their
(0-d per batch item) parameters over channels/time.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

__all__ = ["db_to_linear", "gain", "stereo_panner", "stereo_bus", "mono_to_stereo"]


def db_to_linear(gain_db: jnp.ndarray) -> jnp.ndarray:
    """Convert decibels to a linear amplitude ratio."""
    return jnp.power(10.0, gain_db / 20.0)


def gain(x: jnp.ndarray, sample_rate: float, gain_db: jnp.ndarray) -> jnp.ndarray:
    """Apply a scalar gain (fader) to a signal.

    Args:
      x: audio with shape (batch, channels, time).
      sample_rate: unused; kept for a uniform processor signature.
      gain_db: gain in dB with shape (batch,) — broadcast over channels — or
        (batch, channels) for per-channel gains. (Call sites in the reference
        console: per-track fader at modules.py:231 and master fader at
        modules.py:288/308.)

    Returns:
      Scaled audio, same shape as ``x``.
    """
    del sample_rate
    b = x.shape[0]
    g = db_to_linear(gain_db.reshape(b, -1))
    return x * g[:, :, None]


_HALF_PI = math.pi / 2.0
_TWO_OVER_PI = 2.0 / math.pi


def stereo_panner(
    x: jnp.ndarray, sample_rate: float, pan: jnp.ndarray
) -> jnp.ndarray:
    """Pan mono tracks across the stereo field with a constant-power law.

    The -4.5 dB compromise pan law (the law used by the reference's DSP
    dependency; behavior pinned by /root/reference/tests/test_panner.py):
        theta   = pan * pi/2
        left(t) = sqrt((pi/2 - theta) * (2/pi) * cos(theta))
        right(t)= sqrt(theta * (2/pi) * sin(theta))
    pan=0 -> hard left, pan=0.5 -> center (-4.5 dB per side), pan=1 -> hard right.

    Args:
      x: mono tracks with shape (batch, num_tracks, time).
      sample_rate: unused; uniform processor signature.
      pan: pan positions in [0, 1] with shape (batch, num_tracks).

    Returns:
      Stereo tracks with shape (batch, 2, num_tracks, time).
    """
    del sample_rate
    theta = pan * _HALF_PI
    left = jnp.sqrt((_HALF_PI - theta) * _TWO_OVER_PI * jnp.cos(theta))
    right = jnp.sqrt(theta * _TWO_OVER_PI * jnp.sin(theta))
    # (batch, 2, num_tracks) gain matrix applied to broadcast mono tracks
    gains = jnp.stack([left, right], axis=1)
    return x[:, None, :, :] * gains[:, :, :, None]


def mono_to_stereo(x: jnp.ndarray) -> jnp.ndarray:
    """Duplicate mono tracks (batch, num_tracks, time) to both stereo channels.

    Used when the panner is bypassed (reference console modules.py:269).
    """
    return jnp.broadcast_to(x[:, None, :, :], (x.shape[0], 2) + x.shape[1:])


def stereo_bus(
    x: jnp.ndarray, sample_rate: float, send_db: jnp.ndarray
) -> jnp.ndarray:
    """Sum panned tracks into a stereo bus with per-track send gains.

    Args:
      x: panned tracks with shape (batch, 2, num_tracks, time).
      sample_rate: unused; uniform processor signature.
      send_db: per-track send level in dB with shape (batch, num_tracks).

    Returns:
      Stereo bus with shape (batch, 2, time). (Reference call site:
      modules.py:276; shape contract demo tests/test_bus.py:22-29.)
    """
    del sample_rate
    send_lin = db_to_linear(send_db)
    return jnp.einsum("bcnt,bn->bct", x, send_lin)
