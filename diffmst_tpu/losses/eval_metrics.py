"""Evaluation-only audio metrics: SI-SDR and MRSTFT distance.

The reference constructs SISDR and an eval MRSTFT instrument in its System
(/root/reference/mst/system.py:60-69) but the logging that would use them is
commented out (system.py:367-389). Implemented here as working functions and
consumed by the eval scripts' CSVs.
"""

from __future__ import annotations

import jax.numpy as jnp

from diffmst_tpu.losses.mrstft import MultiResolutionSTFTLoss

__all__ = ["si_sdr", "mrstft_distance"]


def si_sdr(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Scale-invariant SDR in dB over the last axis, averaged over the rest.

    Standard definition (Le Roux et al. 2019): project the estimate onto the
    target, compare projected-signal to residual energies.
    """
    pred = pred - jnp.mean(pred, axis=-1, keepdims=True)
    target = target - jnp.mean(target, axis=-1, keepdims=True)
    dot = jnp.sum(pred * target, axis=-1, keepdims=True)
    energy = jnp.sum(jnp.square(target), axis=-1, keepdims=True)
    s_target = dot / jnp.maximum(energy, eps) * target
    e_noise = pred - s_target
    ratio = jnp.sum(jnp.square(s_target), axis=-1) / jnp.maximum(
        jnp.sum(jnp.square(e_noise), axis=-1), eps
    )
    return jnp.mean(10.0 * jnp.log10(jnp.maximum(ratio, eps)))


_EVAL_MRSTFT = MultiResolutionSTFTLoss()


def mrstft_distance(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """MRSTFT distance at the training resolutions ([512, 2048, 8192])."""
    return _EVAL_MRSTFT(pred, target)
