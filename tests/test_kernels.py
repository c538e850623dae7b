"""Pallas kernel tests (interpret mode on CPU; compiled on TPU in bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffmst_tpu.kernels import onepole_core, onepole_scan


def _ref_onepole(b, alpha):
    y = np.zeros_like(b)
    for i in range(b.shape[0]):
        acc = 0.0
        for n in range(b.shape[1]):
            acc = alpha[i] * acc + b[i, n]
            y[i, n] = acc
    return y


@pytest.mark.smoke
def test_onepole_core_matches_sequential():
    rng = np.random.default_rng(0)
    b = rng.normal(size=(3, 1000)).astype(np.float32)
    alpha = np.array([0.9, 0.5, 0.99], np.float32)
    y = np.asarray(
        onepole_core(jnp.asarray(b), jnp.asarray(alpha), chunk=128, interpret=True)
    )
    ref = _ref_onepole(b, alpha)
    np.testing.assert_allclose(y, ref, atol=2e-4)


def test_onepole_core_multi_chunk_carry():
    """State must propagate across chunk boundaries exactly."""
    rng = np.random.default_rng(1)
    b = rng.normal(size=(1, 2048)).astype(np.float32)
    alpha = np.array([0.995], np.float32)
    y_small = np.asarray(
        onepole_core(jnp.asarray(b), jnp.asarray(alpha), chunk=128, interpret=True)
    )
    y_big = np.asarray(
        onepole_core(jnp.asarray(b), jnp.asarray(alpha), chunk=1024, interpret=True)
    )
    np.testing.assert_allclose(y_small, y_big, atol=2e-4)
    np.testing.assert_allclose(y_small, _ref_onepole(b, alpha), atol=5e-4)


def test_onepole_core_many_lanes():
    rng = np.random.default_rng(2)
    b = rng.normal(size=(130, 256)).astype(np.float32)  # spans two lane groups
    alpha = rng.uniform(0.3, 0.99, size=130).astype(np.float32)
    y = np.asarray(
        onepole_core(jnp.asarray(b), jnp.asarray(alpha), chunk=64, interpret=True)
    )
    np.testing.assert_allclose(y, _ref_onepole(b, alpha), atol=2e-4)


def test_onepole_scan_matches_ops_smoother():
    """Kernel smoother == ops.compressor's associative-scan smoother."""
    from diffmst_tpu.ops.compressor import _smooth_scan

    rng = np.random.default_rng(3)
    g = rng.normal(size=(4, 512)).astype(np.float32) * 10
    alpha = np.array([0.9, 0.99, 0.5, 0.8], np.float32)
    y_kernel = np.asarray(
        onepole_scan(jnp.asarray(g), jnp.asarray(alpha), 128, True)
    )
    y_ops = np.asarray(_smooth_scan(jnp.asarray(g), jnp.asarray(alpha)))
    np.testing.assert_allclose(y_kernel, y_ops, atol=2e-4)


def test_onepole_scan_grad_matches_autodiff():
    """Custom VJP == autodiff through the associative-scan reference."""
    from diffmst_tpu.ops.compressor import _smooth_scan

    rng = np.random.default_rng(4)
    g = jnp.asarray(rng.normal(size=(2, 300)).astype(np.float32))
    alpha = jnp.asarray(np.array([0.9, 0.7], np.float32))

    def loss_kernel(g, a):
        return jnp.sum(jnp.square(onepole_scan(g, a, 64, True)))

    def loss_ref(g, a):
        return jnp.sum(jnp.square(_smooth_scan(g, a)))

    gk, ak = jax.grad(loss_kernel, argnums=(0, 1))(g, alpha)
    gr, ar = jax.grad(loss_ref, argnums=(0, 1))(g, alpha)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(ak), np.asarray(ar), rtol=2e-3, atol=1e-2)


@pytest.mark.smoke
def test_onepole_scan_tv_matches_sequential():
    """Time-varying kernel path == per-sample sequential reference."""
    from diffmst_tpu.kernels import onepole_scan_tv

    rng = np.random.default_rng(4)
    g = rng.normal(size=(2, 700)).astype(np.float32)
    a = rng.uniform(0.3, 0.999, size=(2, 700)).astype(np.float32)
    y = np.asarray(
        onepole_scan_tv(jnp.asarray(g), jnp.asarray(a), chunk=128, interpret=True)
    )
    ref = np.zeros_like(g)
    for i in range(2):
        acc = 0.0
        for n in range(g.shape[1]):
            acc = a[i, n] * acc + (1.0 - a[i, n]) * g[i, n]
            ref[i, n] = acc
    np.testing.assert_allclose(y, ref, atol=2e-4)


def test_onepole_scan_tv_grad_matches_autodiff():
    """Custom VJP of the tv kernel == autodiff of the associative-scan form."""
    from diffmst_tpu.kernels import onepole_scan_tv
    from diffmst_tpu.ops.compressor import _smooth_scan_tv

    rng = np.random.default_rng(5)
    g = jnp.asarray(rng.normal(size=(2, 300)).astype(np.float32))
    a = jnp.asarray(rng.uniform(0.5, 0.99, size=(2, 300)).astype(np.float32))

    def loss_kernel(g, a):
        y = onepole_scan_tv(g, a, 128, True)
        return jnp.sum(jnp.sin(y) * y)

    def loss_ref(g, a):
        y = _smooth_scan_tv(g, a)
        return jnp.sum(jnp.sin(y) * y)

    gk = jax.grad(loss_kernel, argnums=(0, 1))(g, a)
    gr = jax.grad(loss_ref, argnums=(0, 1))(g, a)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gr[0]), atol=3e-4)
    np.testing.assert_allclose(np.asarray(gk[1]), np.asarray(gr[1]), atol=3e-4)


def test_compressor_scan_pallas_backend_matches_scan():
    """ops.compressor smoother='scan_pallas' == 'scan' (kernel wired in)."""
    from diffmst_tpu import ops

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(2, 1, 4096)).astype(np.float32) * 0.25)
    kw = dict(
        threshold_db=jnp.array([-24.0, -18.0]),
        ratio=jnp.array([4.0, 2.0]),
        attack_ms=jnp.array([10.0, 30.0]),
        release_ms=jnp.array([100.0, 60.0]),
        knee_db=jnp.array([6.0, 3.0]),
        makeup_gain_db=jnp.array([0.0, 2.0]),
        lookahead_samples=256,
    )
    y_scan = ops.compressor(x, 44100.0, smoother="scan", **kw)
    y_pl = ops.compressor(x, 44100.0, smoother="scan_pallas_interpret", **kw)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_scan), atol=2e-5)


@pytest.mark.smoke
def test_decoupled_release_min_scan_matches_sequential():
    """The associative min-affine scan == the sequential release recurrence."""
    from diffmst_tpu.ops.compressor import _release_min_scan

    rng = np.random.default_rng(7)
    g = np.minimum(0.0, rng.normal(size=(3, 900)) * 8.0).astype(np.float32)
    ar = np.array([0.999, 0.99, 0.9], np.float32)
    got = np.asarray(_release_min_scan(jnp.asarray(g), jnp.asarray(ar)))
    ref = np.zeros_like(g)
    for i in range(3):
        y1 = 0.0
        for n in range(g.shape[1]):
            y1 = min(g[i, n], ar[i] * y1 + (1.0 - ar[i]) * g[i, n])
            ref[i, n] = y1
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_compressor_decoupled_has_working_release():
    """The decoupled smoother releases with the release time constant (the
    attack-only 'scan'/'fsm' smoothers never do — reference behavior), and
    both decoupled paths (XLA scan / Pallas attack pole) agree."""
    from diffmst_tpu.ops.compressor import (
        _ballistics_coeff,
        _smooth_decoupled,
        _smooth_scan,
    )

    sr = 44100.0
    t = np.arange(32768)
    x_db = np.where((t > 2000) & (t < 9000), -1.0, -34.0).astype(np.float32)[None]
    g = jnp.asarray(np.minimum(0.0, (-24.0 - x_db) * (1 - 1 / 4)))

    aa = _ballistics_coeff(jnp.array([10.0]), sr)
    ar = _ballistics_coeff(jnp.array([80.0]), sr)

    dec = np.asarray(_smooth_decoupled(g, aa, ar))
    dec_pl = np.asarray(
        _smooth_decoupled(g, aa, ar, use_pallas=True, interpret=True)
    )
    np.testing.assert_allclose(dec_pl, dec, atol=2e-4)

    attack_only = np.asarray(_smooth_scan(g, aa))
    # after the burst ends the release constant applies: the coefficient is
    # parameterized as 10-90% rise in release_ms (exp(-ln9/T) per sample), so
    # one release_ms after the end ~1/9 of the reduction remains; the
    # attack-only smoother recovers with the (8x faster) attack constant and
    # is fully released there.
    n_end = 9000
    n_probe = n_end + int(80e-3 * sr)  # one release constant later
    depth = float(g[0, 5000])  # steady-state reduction during the burst
    assert abs(float(dec[0, 8000]) - depth) < 0.5  # attack settled
    rec_dec = float(dec[0, n_probe]) / depth  # fraction still reduced
    rec_att = float(attack_only[0, n_probe]) / depth
    assert rec_att < 0.001  # attack-only: recovery long done (wrong)
    assert 0.05 < rec_dec < 0.25  # decoupled: ~1/9 remains (right)


def test_compressor_decoupled_backend_grads_finite():
    from diffmst_tpu import ops

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(2, 1, 2048)).astype(np.float32) * 0.3)

    def loss(thr):
        y = ops.compressor(
            x, 44100.0,
            threshold_db=thr,
            ratio=jnp.array([4.0, 3.0]),
            attack_ms=jnp.array([10.0, 20.0]),
            release_ms=jnp.array([80.0, 120.0]),
            knee_db=jnp.array([6.0, 6.0]),
            makeup_gain_db=jnp.array([0.0, 0.0]),
            smoother="decoupled",
        )
        return jnp.sum(jnp.square(y))

    grad = jax.grad(loss)(jnp.array([-24.0, -18.0]))
    assert np.isfinite(np.asarray(grad)).all()


def test_compressor_fused_pallas_matches_scan():
    """Fused kernel (detector+knee+scan+gain in one pass) == 'scan' path,
    values and gradients."""
    from diffmst_tpu import ops

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(2, 2, 4096)).astype(np.float32) * 0.3)
    kw = dict(
        threshold_db=jnp.array([-24.0, -15.0]),
        ratio=jnp.array([4.0, 2.5]),
        attack_ms=jnp.array([12.0, 40.0]),
        release_ms=jnp.array([100.0, 60.0]),
        knee_db=jnp.array([6.0, 3.0]),
        makeup_gain_db=jnp.array([1.0, 0.0]),
        lookahead_samples=512,
    )
    y_scan = np.asarray(ops.compressor(x, 44100.0, smoother="scan", **kw))
    y_fused = np.asarray(
        ops.compressor(x, 44100.0, smoother="fused_pallas_interpret", **kw)
    )
    np.testing.assert_allclose(y_fused, y_scan, atol=3e-5)

    def loss(smoother):
        def f(thr, xx):
            y = ops.compressor(
                xx, 44100.0, smoother=smoother,
                **{**kw, "threshold_db": thr},
            )
            return jnp.sum(jnp.square(y))
        return f

    g_scan = jax.grad(loss("scan"), argnums=(0, 1))(kw["threshold_db"], x)
    g_fused = jax.grad(loss("fused_pallas_interpret"), argnums=(0, 1))(
        kw["threshold_db"], x
    )
    np.testing.assert_allclose(
        np.asarray(g_fused[0]), np.asarray(g_scan[0]), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(g_fused[1]), np.asarray(g_scan[1]), rtol=1e-4, atol=1e-4
    )


def test_minscan_kernel_matches_sequential():
    """Pallas min-affine scan == the sequential decoupled release stage,
    across chunk boundaries and lane groups; grads flow via the recompute
    VJP and match autodiff of the associative form."""
    from diffmst_tpu.kernels import release_min_scan
    from diffmst_tpu.ops.compressor import _release_min_scan

    rng = np.random.default_rng(11)
    g = np.minimum(0.0, rng.normal(size=(3, 1500)) * 8.0).astype(np.float32)
    ar = np.array([0.999, 0.98, 0.9], np.float32)
    got = np.asarray(
        release_min_scan(jnp.asarray(g), jnp.asarray(ar), 128, True)
    )
    want = np.asarray(_release_min_scan(jnp.asarray(g), jnp.asarray(ar)))
    np.testing.assert_allclose(got, want, atol=2e-4)

    def loss_k(g, a):
        return jnp.sum(jnp.sin(release_min_scan(g, a, 128, True)))

    def loss_r(g, a):
        return jnp.sum(jnp.sin(_release_min_scan(g, a)))

    gk = jax.grad(loss_k, argnums=(0, 1))(jnp.asarray(g), jnp.asarray(ar))
    gr = jax.grad(loss_r, argnums=(0, 1))(jnp.asarray(g), jnp.asarray(ar))
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gr[0]), atol=3e-4)
    np.testing.assert_allclose(np.asarray(gk[1]), np.asarray(gr[1]), rtol=2e-3, atol=1e-2)


def test_compressor_decoupled_pallas_backend():
    """'decoupled_pallas' (both stages kernel-backed) == 'decoupled' (XLA)."""
    from diffmst_tpu import ops

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(size=(2, 1, 4096)).astype(np.float32) * 0.3)
    kw = dict(
        threshold_db=jnp.array([-24.0, -18.0]),
        ratio=jnp.array([4.0, 2.0]),
        attack_ms=jnp.array([10.0, 30.0]),
        release_ms=jnp.array([100.0, 60.0]),
        knee_db=jnp.array([6.0, 3.0]),
        makeup_gain_db=jnp.array([0.0, 2.0]),
        lookahead_samples=256,
    )
    y_x = ops.compressor(x, 44100.0, smoother="decoupled", **kw)
    y_p = ops.compressor(x, 44100.0, smoother="decoupled_pallas_interpret", **kw)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), atol=2e-5)


def test_sosfilt_scan_matches_scipy():
    """Causal EQ cascade via associative scan == scipy.sosfilt (f32 vs f64)."""
    import scipy.signal as sps

    from diffmst_tpu.console.ranges import advanced_param_ranges
    from diffmst_tpu.ops.eq import _eq_sos
    from diffmst_tpu.ops.iir import sosfilt_scan

    SR = 44100.0
    rng = np.random.default_rng(0)
    B, T = 4, 8192
    x = jnp.asarray((rng.normal(size=(B, T)) * 0.1).astype(np.float32))
    R = advanced_param_ranges(SR)["parametric_eq"]
    params = {
        k: jnp.asarray(
            np.random.default_rng(i).uniform(lo, hi, B).astype(np.float32)
        )
        for i, (k, (lo, hi)) in enumerate(R.items())
    }
    b, a = _eq_sos(SR, **params)
    y = np.asarray(sosfilt_scan(x, b, a))
    bn, an = np.asarray(b, np.float64), np.asarray(a, np.float64)
    for i in range(B):
        sos = np.concatenate([bn[i], an[i]], axis=-1)
        ref = sps.sosfilt(sos, np.asarray(x)[i].astype(np.float64))
        assert np.abs(y[i] - ref).max() < 1e-3  # f32 recursion vs f64


def test_sosfilt_pallas_kernel_parity():
    """Fused cascade kernel (interpret) == sosfilt_scan across chunk
    boundaries + padding; grad plumbing via the recompute VJP works.
    (Interpret mode is slow -> small sizes; the math is size-independent.)"""
    from diffmst_tpu.kernels.iir_fused import sosfilt_pallas
    from diffmst_tpu.ops.iir import sosfilt_scan

    rng = np.random.default_rng(1)
    B, T, S = 2, 330, 3  # 330 % 128 != 0 -> padding; 3 chunks
    x = jnp.asarray((rng.normal(size=(B, T)) * 0.3).astype(np.float32))
    # stable random biquads: poles at radius <= 0.99
    r = rng.uniform(0.6, 0.99, (B, S))
    th = rng.uniform(0.05, 3.0, (B, S))
    a1 = (-2 * r * np.cos(th)).astype(np.float32)
    a2 = (r * r).astype(np.float32)
    sos_a = jnp.asarray(np.stack([np.ones_like(a1), a1, a2], axis=-1))
    sos_b = jnp.asarray(rng.normal(size=(B, S, 3)).astype(np.float32) * 0.5)

    y_scan = np.asarray(sosfilt_scan(x, sos_b, sos_a))
    y_pl = np.asarray(sosfilt_pallas(x, sos_b, sos_a, 128, True))
    np.testing.assert_allclose(y_pl, y_scan, atol=1e-4)

    def loss(x, b):
        return jnp.sum(jnp.square(sosfilt_pallas(x, b, sos_a, 128, True)))

    def loss_ref(x, b):
        return jnp.sum(jnp.square(sosfilt_scan(x, b, sos_a)))

    gx, gb = jax.grad(loss, argnums=(0, 1))(x, sos_b)
    rx, rb = jax.grad(loss_ref, argnums=(0, 1))(x, sos_b)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=2e-3, atol=2e-3)
