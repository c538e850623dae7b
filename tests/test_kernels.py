"""Pallas kernel tests (interpret mode on CPU; compiled on TPU in bench)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffmst_tpu.kernels import onepole_core, onepole_scan


def _ref_onepole(b, alpha):
    y = np.zeros_like(b)
    for i in range(b.shape[0]):
        acc = 0.0
        for n in range(b.shape[1]):
            acc = alpha[i] * acc + b[i, n]
            y[i, n] = acc
    return y


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
