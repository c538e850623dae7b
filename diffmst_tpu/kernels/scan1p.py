"""Pallas TPU kernel: first-order linear recurrence (one-pole) scan.

Computes y[n] = a * y[n-1] + b[n] along time for a batch of signals — the
compressor's ballistics smoother (ops/compressor.py) and the building block
for exact IIR on TPU.

Why a kernel: XLA's ``associative_scan`` runs log2(T) (~18 for T=262144)
elementwise passes with HBM round-trips between them. This kernel streams
the signal once: the grid walks time-chunks sequentially (TPU grids execute
in order), each chunk does a Hillis-Steele scan entirely in VMEM (log2(C)
register passes), and a (1, lanes) carry in VMEM scratch links chunks. HBM
traffic = read b + write y — optimal.

Layout: time on sublanes, batch on lanes — (T, B) blocks of (CHUNK, 128).

The public ``onepole_scan(g, alpha)`` computes the smoother form
y[n] = a y[n-1] + (1-a) g[n] with a custom VJP (the adjoint of a one-pole is
the same one-pole run backwards in time, so the backward pass reuses the
kernel; d alpha accumulates sum_n s[n] * (y[n-1] - g[n])).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["onepole_core", "onepole_scan"]

_LANES = 128


def _scan_kernel(chunk: int, time_varying: bool):
    """Kernel: one (chunk, 128) time-block of y[n] = a[n]*y[n-1] + b[n]."""

    def kernel(a_ref, b_ref, out_ref, carry_ref):
        # grid = (groups, time_chunks): time is the minor axis so all chunks
        # of one lane-group run consecutively; reset the carry per group.
        step = pl.program_id(1)

        @pl.when(step == 0)
        def _():
            carry_ref[...] = jnp.zeros_like(carry_ref)

        b = b_ref[...]  # (chunk, 128)
        # per-row transition A[i] (constant (1,128) row or full (chunk,128)
        # time-varying block) and load B[i] = b[i]
        if time_varying:
            A = a_ref[...]
        else:
            A = jnp.broadcast_to(a_ref[...], b.shape)
        B = b
        # Hillis-Steele inclusive scan of (A, B) composition down the sublanes
        d = 1
        while d < chunk:
            # left-shifted-by-d predecessors; identity element (A=1, B=0) fills
            A_prev = jnp.concatenate(
                [jnp.ones((d, b.shape[1]), A.dtype), A[:-d]], axis=0
            )
            B_prev = jnp.concatenate(
                [jnp.zeros((d, b.shape[1]), B.dtype), B[:-d]], axis=0
            )
            B = A * B_prev + B
            A = A * A_prev
            d *= 2
        # inject the carry (state entering this chunk): y = B + A * y_in
        y = B + A * carry_ref[...]
        out_ref[...] = y
        carry_ref[...] = y[-1:, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def onepole_core(
    b: jnp.ndarray,
    alpha: jnp.ndarray,
    chunk: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """y[n] = alpha[n] * y[n-1] + b[n] over the last axis.

    b: (B, T); alpha: (B,) for a constant coefficient per signal, or (B, T)
    for a time-varying first-order linear recurrence (the general form —
    input-switched attack/release ballistics use this).
    """
    bs, t = b.shape
    time_varying = alpha.ndim == 2
    # lanes = batch (padded to 128), sublanes = time
    b_pad = (-bs) % _LANES
    t_pad = (-t) % chunk
    x = jnp.pad(b, ((0, b_pad), (0, t_pad))).T  # (T', B')
    if time_varying:
        # pad alpha with 1s in time so padded tail carries state through
        # (irrelevant to the unpadded output but keeps the scan benign)
        a = jnp.pad(alpha, ((0, b_pad), (0, t_pad))).T  # (T', B')
    else:
        a = jnp.pad(alpha, (0, b_pad))[None, :]  # (1, B')
    tp, bp = x.shape

    groups = bp // _LANES
    grid = (groups, tp // chunk)
    a_spec = (
        pl.BlockSpec((chunk, _LANES), lambda j, i: (i, j))
        if time_varying
        else pl.BlockSpec((1, _LANES), lambda j, i: (0, j))
    )
    y = pl.pallas_call(
        _scan_kernel(chunk, time_varying),
        out_shape=jax.ShapeDtypeStruct((tp, bp), x.dtype),
        grid=grid,
        in_specs=[
            a_spec,
            pl.BlockSpec((chunk, _LANES), lambda j, i: (i, j)),
        ],
        out_specs=pl.BlockSpec((chunk, _LANES), lambda j, i: (i, j)),
        scratch_shapes=[pltpu.VMEM((1, _LANES), x.dtype)],
        interpret=interpret,
    )(a, x)
    return y.T[:bs, :t]


# ------------------------------------------------------------- smoother VJP


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def onepole_scan(
    g: jnp.ndarray, alpha: jnp.ndarray, chunk: int = 512, interpret: bool = False
) -> jnp.ndarray:
    """Smoother y[n] = a y[n-1] + (1-a) g[n] with a kernel-backed VJP."""
    return onepole_core((1.0 - alpha)[:, None] * g, alpha, chunk, interpret)


def _fwd(g, alpha, chunk, interpret):
    y = onepole_core((1.0 - alpha)[:, None] * g, alpha, chunk, interpret)
    return y, (g, alpha, y)


def _bwd(chunk, interpret, res, dy):
    g, alpha, y = res
    # adjoint state: s[n] = dy[n] + a * s[n+1]  (reverse-time one-pole)
    s = onepole_core(dy[:, ::-1], alpha, chunk, interpret)[:, ::-1]
    dg = (1.0 - alpha)[:, None] * s
    # dalpha = sum_n s[n] * (y[n-1] - g[n])
    y_prev = jnp.concatenate([jnp.zeros_like(y[:, :1]), y[:, :-1]], axis=1)
    dalpha = jnp.sum(s * (y_prev - g), axis=-1)
    return dg, dalpha


onepole_scan.defvjp(_fwd, _bwd)


# ------------------------------------------------- time-varying smoother VJP


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def onepole_scan_tv(
    g: jnp.ndarray, alpha: jnp.ndarray, chunk: int = 512, interpret: bool = False
) -> jnp.ndarray:
    """Time-varying smoother y[n] = a[n] y[n-1] + (1-a[n]) g[n].

    g, alpha: (B, T). The general first-order linear recurrence — used for
    input-switched attack/release ballistics (a[n] picked per sample).
    """
    return onepole_core((1.0 - alpha) * g, alpha, chunk, interpret)


def _fwd_tv(g, alpha, chunk, interpret):
    y = onepole_core((1.0 - alpha) * g, alpha, chunk, interpret)
    return y, (g, alpha, y)


def _bwd_tv(chunk, interpret, res, dy):
    g, alpha, y = res
    # adjoint: s[n] = dy[n] + a[n+1] s[n+1]. Reversed in time this is a
    # tv one-pole with the coefficient sequence shifted by one; the m=0
    # coefficient multiplies zero state, so its value is irrelevant.
    a_rev = alpha[:, ::-1]
    a_hat = jnp.concatenate([jnp.ones_like(a_rev[:, :1]), a_rev[:, :-1]], axis=1)
    s = onepole_core(dy[:, ::-1], a_hat, chunk, interpret)[:, ::-1]
    dg = (1.0 - alpha) * s
    y_prev = jnp.concatenate([jnp.zeros_like(y[:, :1]), y[:, :-1]], axis=1)
    dalpha = s * (y_prev - g)
    return dg, dalpha


onepole_scan_tv.defvjp(_fwd_tv, _bwd_tv)


# ------------------------------------------------------- min-affine scan

def _minscan_kernel(chunk: int):
    """Kernel: y[n] = min(c[n], a*y[n-1] + d[n]) — the decoupled compressor's
    release stage. Transfer maps f(y) = min(c, a*y + d) compose as
    (A, D, C) -> (a1*a2, a2*d1 + d2, min(c2, a2*c1 + d2)), an associative
    triple, so the same Hillis-Steele pattern as the linear kernel applies.
    """

    def kernel(a_ref, d_ref, c_ref, out_ref, carry_ref):
        step = pl.program_id(1)

        @pl.when(step == 0)
        def _():
            # entering state = 0 dB (no gain reduction)
            carry_ref[...] = jnp.zeros_like(carry_ref)

        d = d_ref[...]
        c = c_ref[...]
        A = jnp.broadcast_to(a_ref[...], d.shape)
        D = d
        C = c
        s = 1
        while s < chunk:
            pad_a = jnp.ones((s, D.shape[1]), A.dtype)
            pad_d = jnp.zeros((s, D.shape[1]), D.dtype)
            pad_c = jnp.full((s, D.shape[1]), jnp.inf, C.dtype)
            A_prev = jnp.concatenate([pad_a, A[:-s]], axis=0)
            D_prev = jnp.concatenate([pad_d, D[:-s]], axis=0)
            C_prev = jnp.concatenate([pad_c, C[:-s]], axis=0)
            # compose: prev (earlier) then current
            C = jnp.minimum(C, A * C_prev + D)
            D = A * D_prev + D
            A = A * A_prev
            s *= 2
        y = jnp.minimum(C, A * carry_ref[...] + D)
        out_ref[...] = y
        carry_ref[...] = y[-1:, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def minscan_core(
    g: jnp.ndarray,
    alpha: jnp.ndarray,
    chunk: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """y[n] = min(g[n], alpha*y[n-1] + (1-alpha)*g[n]). g: (B, T), alpha: (B,)."""
    bs, t = g.shape
    b_pad = (-bs) % _LANES
    t_pad = (-t) % chunk
    # pad time with zeros: g<=0 in dB gain domain, y stays <= 0; padded tail
    # is discarded anyway.
    c = jnp.pad(g, ((0, b_pad), (0, t_pad))).T  # (T', B')
    a_row = jnp.pad(alpha, (0, b_pad))[None, :]
    d = jnp.pad((1.0 - alpha)[:, None] * g, ((0, b_pad), (0, t_pad))).T
    tp, bp = c.shape
    grid = (bp // _LANES, tp // chunk)
    y = pl.pallas_call(
        _minscan_kernel(chunk),
        out_shape=jax.ShapeDtypeStruct((tp, bp), c.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _LANES), lambda j, i: (0, j)),
            pl.BlockSpec((chunk, _LANES), lambda j, i: (i, j)),
            pl.BlockSpec((chunk, _LANES), lambda j, i: (i, j)),
        ],
        out_specs=pl.BlockSpec((chunk, _LANES), lambda j, i: (i, j)),
        scratch_shapes=[pltpu.VMEM((1, _LANES), c.dtype)],
        interpret=interpret,
    )(a_row, d, c)
    return y.T[:bs, :t]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def release_min_scan(
    g: jnp.ndarray, alpha: jnp.ndarray, chunk: int = 512, interpret: bool = False
) -> jnp.ndarray:
    """Kernel-backed decoupled release stage with an XLA-recompute VJP."""
    return minscan_core(g, alpha, chunk, interpret)


def _minscan_ref(g, alpha):
    a = jnp.broadcast_to(alpha[:, None], g.shape)
    d = (1.0 - a) * g

    def combine(l, r):
        a1, d1, c1 = l
        a2, d2, c2 = r
        return a1 * a2, a2 * d1 + d2, jnp.minimum(c2, a2 * c1 + d2)

    _, D, C = jax.lax.associative_scan(combine, (a, d, g), axis=-1)
    return jnp.minimum(C, D)


def _fwd_ms(g, alpha, chunk, interpret):
    return minscan_core(g, alpha, chunk, interpret), (g, alpha)


def _bwd_ms(chunk, interpret, res, dy):
    g, alpha = res
    _, vjp = jax.vjp(_minscan_ref, g, alpha)
    return vjp(dy)


release_min_scan.defvjp(_fwd_ms, _bwd_ms)
