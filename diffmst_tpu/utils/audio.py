"""Audio utilities (normalization, cropping, fades).

Rebuilds of /root/reference/mst/utils.py:14-29 (batch_stereo_peak_normalize),
:275-312 (crops), :335-352 (fades).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "batch_stereo_peak_normalize",
    "center_crop",
    "causal_crop",
    "fade_in_and_fade_out",
]


def batch_stereo_peak_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """Normalize each batch item by its max |peak| across channels/time."""
    peak = jnp.max(jnp.abs(x), axis=(-2, -1), keepdims=True)
    return x / jnp.maximum(peak, 1e-8)


def center_crop(x: jnp.ndarray, length: int) -> jnp.ndarray:
    if x.shape[-1] == length:
        return x
    start = (x.shape[-1] - length) // 2
    return x[..., start : start + length]


def causal_crop(x: jnp.ndarray, length: int) -> jnp.ndarray:
    if x.shape[-1] == length:
        return x
    stop = x.shape[-1] - 1
    return x[..., stop - length : stop]


def fade_in_and_fade_out(
    x: jnp.ndarray, fade_ms: float = 10.0, sample_rate: float = 44100.0
) -> jnp.ndarray:
    n = int(fade_ms * 1e-3 * sample_rate)
    ramp_in = jnp.linspace(0.0, 1.0, n)
    ramp_out = jnp.linspace(1.0, 0.0, n)
    x = x.at[..., :n].multiply(ramp_in)
    x = x.at[..., -n:].multiply(ramp_out)
    return x
