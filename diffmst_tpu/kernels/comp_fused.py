"""Fused Pallas TPU compressor kernel: detector -> knee -> scan -> gain, one pass.

The unfused compressor (ops/compressor.py) materializes x_db, the static-curve
gain g_c, the smoothed envelope g_s and the linear gain in HBM — four extra
(B, T) round trips around the scan. This kernel streams each (chunk, 128)
time-block once through VMEM: level detection (log10), the quadratic
soft-knee static curve, the causal one-pole smoothing (Hillis-Steele scan
with a VMEM carry, as in scan1p.py) and the final gain application to the
lookahead-delayed signal all happen in-register. HBM traffic = read x +
read x_delayed + write y — the streaming optimum.

Numerics match ops.compressor(smoother="scan") exactly (same equations, same
scan). The custom VJP recomputes the backward pass through the plain-XLA
formulation — forward speed is what the console/inference hot path needs,
and the recompute keeps gradients exactly consistent with the unfused op.

Reference behavior being accelerated: /root/reference/mst/modules.py:245-254
(track chain, lookahead 2048) and modules.py:300-305 (master bus, 1024).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["compressor_fused_gain"]

_LANES = 128
_LN10 = math.log(10.0)


def _fused_kernel(chunk: int, eps: float):
    def kernel(p_ref, x_ref, xd_ref, out_ref, carry_ref):
        step = pl.program_id(1)

        @pl.when(step == 0)
        def _():
            carry_ref[...] = jnp.zeros_like(carry_ref)

        thr = p_ref[0:1, :]
        inv_ratio_m1 = p_ref[1:2, :]  # (1/ratio - 1)
        knee = p_ref[2:3, :]
        alpha = p_ref[3:4, :]
        makeup = p_ref[4:5, :]

        x = x_ref[...]  # (chunk, 128)
        # level detector (dB) + quadratic soft-knee static curve
        x_db = (20.0 / _LN10) * jnp.log(jnp.maximum(jnp.abs(x), eps))
        over = x_db - thr
        in_knee = inv_ratio_m1 * jnp.square(over + knee * 0.5) / (2.0 * knee)
        above = inv_ratio_m1 * over
        g_c = jnp.where(
            over <= -knee * 0.5,
            jnp.zeros_like(over),
            jnp.where(over >= knee * 0.5, above, in_knee),
        )
        # causal one-pole y[n] = a y[n-1] + (1-a) g[n]: Hillis-Steele in VMEM
        A = jnp.broadcast_to(alpha, g_c.shape)
        B = (1.0 - A) * g_c
        d = 1
        while d < chunk:
            A_prev = jnp.concatenate(
                [jnp.ones((d, B.shape[1]), A.dtype), A[:-d]], axis=0
            )
            B_prev = jnp.concatenate(
                [jnp.zeros((d, B.shape[1]), B.dtype), B[:-d]], axis=0
            )
            B = A * B_prev + B
            A = A * A_prev
            d *= 2
        g_s = B + A * carry_ref[...]
        carry_ref[...] = g_s[-1:, :]
        # linear gain onto the delayed signal
        gain = jnp.exp((_LN10 / 20.0) * (g_s + makeup))
        out_ref[...] = xd_ref[...] * gain

    return kernel


def _fused_core(x, x_delayed, params_rows, chunk, eps, interpret):
    bs, t = x.shape
    b_pad = (-bs) % _LANES
    t_pad = (-t) % chunk
    xt = jnp.pad(x, ((0, b_pad), (0, t_pad))).T  # (T', B')
    xdt = jnp.pad(x_delayed, ((0, b_pad), (0, t_pad))).T
    # rows: [thr, 1/ratio-1, knee, alpha, makeup] each (B,) -> (5, B')
    p = jnp.pad(params_rows, ((0, 0), (0, b_pad)))
    # padded lanes: knee must stay nonzero (division); 1.0 is harmless
    if b_pad:
        p = p.at[2, bs:].set(1.0)
    tp, bp = xt.shape
    grid = (bp // _LANES, tp // chunk)
    y = pl.pallas_call(
        _fused_kernel(chunk, eps),
        out_shape=jax.ShapeDtypeStruct((tp, bp), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((5, _LANES), lambda j, i: (0, j)),
            pl.BlockSpec((chunk, _LANES), lambda j, i: (i, j)),
            pl.BlockSpec((chunk, _LANES), lambda j, i: (i, j)),
        ],
        out_specs=pl.BlockSpec((chunk, _LANES), lambda j, i: (i, j)),
        scratch_shapes=[pltpu.VMEM((1, _LANES), x.dtype)],
        interpret=interpret,
    )(p, xt, xdt)
    return y.T[:bs, :t]


def _ref_gain(x, x_delayed, threshold_db, ratio, knee_db, alpha, makeup_db, eps):
    """Plain-XLA twin of the kernel (used for the VJP recompute)."""
    x_db = (20.0 / _LN10) * jnp.log(jnp.maximum(jnp.abs(x), eps))
    over = x_db - threshold_db[:, None]
    knee = knee_db[:, None]
    irm1 = (1.0 / ratio - 1.0)[:, None]
    in_knee = irm1 * jnp.square(over + knee * 0.5) / (2.0 * knee)
    above = irm1 * over
    g_c = jnp.where(over <= -knee * 0.5, 0.0, jnp.where(over >= knee * 0.5, above, in_knee))
    a = jnp.broadcast_to(alpha[:, None], g_c.shape)
    b = (1.0 - a) * g_c

    def combine(l, r):
        a1, b1 = l
        a2, b2 = r
        return a1 * a2, a2 * b1 + b2

    _, g_s = jax.lax.associative_scan(combine, (a, b), axis=-1)
    return x_delayed * jnp.exp((_LN10 / 20.0) * (g_s + makeup_db[:, None]))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def compressor_fused_gain(
    x: jnp.ndarray,
    x_delayed: jnp.ndarray,
    threshold_db: jnp.ndarray,
    ratio: jnp.ndarray,
    knee_db: jnp.ndarray,
    alpha: jnp.ndarray,
    makeup_db: jnp.ndarray,
    chunk: int = 512,
    eps: float = 1e-8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused compressed output: x (B, T) detector signal, x_delayed the
    lookahead-rolled signal the gain is applied to; per-signal params (B,).
    Equals ops.compressor's "scan" smoother path numerically."""
    knee = jnp.maximum(knee_db, 1e-3)
    rows = jnp.stack(
        [threshold_db, 1.0 / ratio - 1.0, knee, alpha, makeup_db], axis=0
    )
    return _fused_core(x, x_delayed, rows, chunk, eps, interpret)


def _fwd(x, x_delayed, threshold_db, ratio, knee_db, alpha, makeup_db,
         chunk, eps, interpret):
    y = compressor_fused_gain(
        x, x_delayed, threshold_db, ratio, knee_db, alpha, makeup_db,
        chunk, eps, interpret,
    )
    return y, (x, x_delayed, threshold_db, ratio, knee_db, alpha, makeup_db)


def _bwd(chunk, eps, interpret, res, dy):
    x, x_delayed, thr, ratio, knee, alpha, makeup = res
    knee_c = jnp.maximum(knee, 1e-3)
    _, vjp = jax.vjp(
        lambda *a: _ref_gain(*a, eps=eps),
        x, x_delayed, thr, ratio, knee_c, alpha, makeup,
    )
    dx, dxd, dthr, dratio, dknee_c, dalpha, dmakeup = vjp(dy)
    dknee = jnp.where(knee > 1e-3, dknee_c, 0.0)
    return dx, dxd, dthr, dratio, dknee, dalpha, dmakeup


compressor_fused_gain.defvjp(_fwd, _bwd)
