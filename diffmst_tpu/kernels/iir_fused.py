"""Fused Pallas TPU kernel: a whole biquad cascade in one HBM pass.

The frequency-sampling EQ costs one rfft + response multiply + irfft per
call (3+ full-signal HBM round trips and two FFT library calls). This
kernel evaluates the *causal* cascade exactly instead: for each
second-order section the direct-form-II state recurrence

    v[n] = M v[n-1] + (x[n], 0),  M = [[-a1, -a2], [1, 0]],
    y[n] = b0 w[n] + b1 w[n-1] + b2 w[n-2]

is Hillis-Steele-scanned over affine maps (M, t) inside VMEM, all S
sections chained in-register, with a (2S, lanes) carry linking time chunks
(TPU grids execute in order). HBM traffic = read x + write y — the
streaming optimum; no FFT anywhere.

Semantics = scipy.signal.sosfilt (zero state), i.e. ops/iir.py's
``sosfilt_scan``, which also serves as the VJP recompute path. Consumed by
``ops.parametric_eq(..., method="scan_pallas")`` for the opt-in causal EQ
(see PERF.md "If FFT proves to be the bottleneck").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffmst_tpu.ops.iir import sosfilt_scan

__all__ = ["sosfilt_pallas"]

_LANES = 128


def _cascade_kernel(chunk: int, num_sections: int, sub: int = 32):
    """One (chunk, 128) block through all sections.

    Within a section the chunk is processed as chunk/sub sub-blocks of
    ``sub`` samples: Hillis-Steele scans span at most ``sub`` positions, so
    the composed 2x2 matrices (whose norms grow with span for poles near
    the unit circle) stay well-conditioned in f32 — and O(n log sub) work
    beats O(n log chunk).
    """

    def kernel(coef_ref, x_ref, out_ref, carry_ref):
        step = pl.program_id(1)

        @pl.when(step == 0)
        def _():
            carry_ref[...] = jnp.zeros_like(carry_ref)

        sig = x_ref[...]  # (chunk, 128)
        lanes = sig.shape[1]
        for s in range(num_sections):
            a1 = coef_ref[5 * s + 0 : 5 * s + 1, :]
            a2 = coef_ref[5 * s + 1 : 5 * s + 2, :]
            b0 = coef_ref[5 * s + 2 : 5 * s + 3, :]
            b1 = coef_ref[5 * s + 3 : 5 * s + 4, :]
            b2 = coef_ref[5 * s + 4 : 5 * s + 5, :]

            # TDF2 (see ops/iir.py): v = (s1, s2) state at output scale —
            # robust in f32 where direct form II blows up on low-frequency
            # shelves. y[n] = b0 x[n] + s1[n-1].
            c1 = carry_ref[2 * s : 2 * s + 1, :]  # s1[-1]
            c2 = carry_ref[2 * s + 1 : 2 * s + 2, :]  # s2[-1]
            g1 = b1 - a1 * b0
            g2 = b2 - a2 * b0
            outs = []
            for k in range(chunk // sub):
                x_sub = sig[k * sub : (k + 1) * sub, :]
                zeros = jnp.zeros_like(x_sub)
                A11 = jnp.broadcast_to(-a1, x_sub.shape)
                A12 = jnp.ones_like(x_sub)
                A21 = jnp.broadcast_to(-a2, x_sub.shape)
                A22 = zeros
                t1 = g1 * x_sub
                t2 = g2 * x_sub
                d = 1
                while d < sub:
                    def sh(m, fill):
                        return jnp.concatenate(
                            [jnp.full((d, lanes), fill, m.dtype), m[:-d]],
                            axis=0,
                        )

                    P11, P12 = sh(A11, 0.0), sh(A12, 0.0)
                    P21, P22 = sh(A21, 0.0), sh(A22, 0.0)
                    eye = jax.lax.broadcasted_iota(jnp.int32, x_sub.shape, 0) < d
                    P11 = jnp.where(eye, 1.0, P11)
                    P22 = jnp.where(eye, 1.0, P22)
                    q1, q2 = sh(t1, 0.0), sh(t2, 0.0)
                    n11 = A11 * P11 + A12 * P21
                    n12 = A11 * P12 + A12 * P22
                    n21 = A21 * P11 + A22 * P21
                    n22 = A21 * P12 + A22 * P22
                    u1 = A11 * q1 + A12 * q2 + t1
                    u2 = A21 * q1 + A22 * q2 + t2
                    A11, A12, A21, A22, t1, t2 = n11, n12, n21, n22, u1, u2
                    d *= 2

                s1 = t1 + A11 * c1 + A12 * c2
                s1_prev = jnp.concatenate(
                    [jnp.broadcast_to(c1, (1, lanes)), s1[:-1]], axis=0
                )
                outs.append(b0 * x_sub + s1_prev)
                s2_last = t2[-1:, :] + A21[-1:, :] * c1 + A22[-1:, :] * c2
                c1, c2 = s1[-1:, :], s2_last
            carry_ref[2 * s : 2 * s + 1, :] = c1
            carry_ref[2 * s + 1 : 2 * s + 2, :] = c2
            sig = jnp.concatenate(outs, axis=0)

        out_ref[...] = sig

    return kernel


def _core(x, coef_rows, num_sections, chunk, interpret):
    bs, t = x.shape
    b_pad = (-bs) % _LANES
    t_pad = (-t) % chunk
    xt = jnp.pad(x, ((0, b_pad), (0, t_pad))).T  # (T', B')
    coef = jnp.pad(coef_rows, ((0, 0), (0, b_pad)))
    tp, bp = xt.shape
    grid = (bp // _LANES, tp // chunk)
    y = pl.pallas_call(
        _cascade_kernel(chunk, num_sections),
        out_shape=jax.ShapeDtypeStruct((tp, bp), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((5 * num_sections, _LANES), lambda j, i: (0, j)),
            pl.BlockSpec((chunk, _LANES), lambda j, i: (i, j)),
        ],
        out_specs=pl.BlockSpec((chunk, _LANES), lambda j, i: (i, j)),
        scratch_shapes=[pltpu.VMEM((2 * num_sections, _LANES), x.dtype)],
        interpret=interpret,
    )(coef, xt)
    return y.T[:bs, :t]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def sosfilt_pallas(
    x: jnp.ndarray,
    sos_b: jnp.ndarray,
    sos_a: jnp.ndarray,
    chunk: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Causal biquad cascade, kernel-backed. x (B, T); sos_b/a (B, S, 3)."""
    num_sections = sos_b.shape[1]
    rows = []
    for s in range(num_sections):
        rows.extend([
            sos_a[:, s, 1], sos_a[:, s, 2],
            sos_b[:, s, 0], sos_b[:, s, 1], sos_b[:, s, 2],
        ])
    coef = jnp.stack(rows, axis=0)  # (5S, B)
    return _core(x, coef, num_sections, chunk, interpret)


def _fwd(x, sos_b, sos_a, chunk, interpret):
    return sosfilt_pallas(x, sos_b, sos_a, chunk, interpret), (x, sos_b, sos_a)


def _bwd(chunk, interpret, res, dy):
    x, sos_b, sos_a = res
    _, vjp = jax.vjp(sosfilt_scan, x, sos_b, sos_a)
    return vjp(dy)


sosfilt_pallas.defvjp(_fwd, _bwd)
