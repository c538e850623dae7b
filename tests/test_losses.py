"""Loss tests: MRSTFT vs auraloss semantics (and torch parity when available),
feature values on constructed signals, AFLoss dict contract, bark filterbank.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffmst_tpu import losses

SR = 44100


def _stereo(key, bs=2, t=32768, scale=0.1):
    return jax.random.normal(jax.random.PRNGKey(key), (bs, 2, t)) * scale


# ------------------------------------------------------------------ MRSTFT
def test_mrstft_zero_for_identical():
    x = _stereo(0)
    loss = losses.MultiResolutionSTFTLoss()(x, x)
    assert float(loss) == 0.0


def test_mrstft_positive_and_ordered():
    x = _stereo(0)
    y_close = x + 0.01 * _stereo(1)
    y_far = x + 0.2 * _stereo(2)
    mr = losses.MultiResolutionSTFTLoss()
    l_close, l_far = float(mr(y_close, x)), float(mr(y_far, x))
    assert 0 < l_close < l_far


def test_mrstft_grad_finite():
    x = _stereo(0, t=16384)
    y = _stereo(1, t=16384)
    mr = losses.MultiResolutionSTFTLoss(fft_sizes=(512,), hop_sizes=(256,), win_lengths=(512,))
    g = jax.grad(lambda p: mr(p, x))(y)
    assert np.isfinite(np.asarray(g)).all()


def test_mrstft_matches_auraloss_formula_torch():
    """Cross-check against a minimal torch reimplementation of auraloss STFTLoss."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    p = rng.normal(size=(2, 2, 16384)).astype(np.float32) * 0.1
    t = rng.normal(size=(2, 2, 16384)).astype(np.float32) * 0.1

    def torch_stft_loss(pred, targ, n_fft, hop):
        pred = torch.from_numpy(pred).reshape(-1, pred.shape[-1])
        targ = torch.from_numpy(targ).reshape(-1, targ.shape[-1])
        w = torch.hann_window(n_fft)
        P = torch.stft(pred, n_fft, hop, window=w, return_complex=True)
        T = torch.stft(targ, n_fft, hop, window=w, return_complex=True)
        Pm = torch.sqrt(torch.clamp(P.abs() ** 2, min=1e-8))
        Tm = torch.sqrt(torch.clamp(T.abs() ** 2, min=1e-8))
        log_l = torch.nn.functional.l1_loss(torch.log(Tm), torch.log(Pm))
        lin_l = torch.nn.functional.l1_loss(Tm, Pm)
        return (log_l + lin_l).item()

    ref = np.mean([torch_stft_loss(p, t, n, n // 2) for n in (512, 2048)])
    ours = float(
        losses.MultiResolutionSTFTLoss(
            fft_sizes=(512, 2048), hop_sizes=(256, 1024), win_lengths=(512, 2048)
        )(jnp.asarray(p), jnp.asarray(t))
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-3)


# ----------------------------------------------------------------- features
def test_rms_and_crest_on_sine():
    t = np.arange(SR) / SR
    x = np.sin(2 * np.pi * 100 * t, dtype=np.float32)
    X = jnp.asarray(np.stack([x, 0.5 * x])[None])  # (1, 2, T)
    rms = np.asarray(losses.compute_rms(X))
    np.testing.assert_allclose(rms[0, 0], 1 / np.sqrt(2), rtol=1e-3)
    np.testing.assert_allclose(rms[0, 1], 0.5 / np.sqrt(2), rtol=1e-3)
    cf = np.asarray(losses.compute_crest_factor(X))
    np.testing.assert_allclose(cf, 20 * np.log10(np.sqrt(2)), rtol=1e-2)


def test_stereo_width_extremes():
    x = _stereo(0)[:, :1]
    mono = jnp.concatenate([x, x], axis=1)  # identical channels -> width 0
    anti = jnp.concatenate([x, -x], axis=1)  # anti-phase -> large width
    w_mono = np.asarray(losses.compute_stereo_width(mono))
    w_anti = np.asarray(losses.compute_stereo_width(anti))
    np.testing.assert_allclose(w_mono, 0.0, atol=1e-6)
    assert (w_anti > 100).all()


def test_stereo_imbalance_sign():
    x = np.zeros((1, 2, 1000), dtype=np.float32)
    x[0, 1] = 1.0  # all energy right
    v = float(losses.compute_stereo_imbalance(jnp.asarray(x))[0])
    assert v == pytest.approx(1.0, abs=1e-5)
    x2 = x[:, ::-1]
    v2 = float(losses.compute_stereo_imbalance(jnp.asarray(np.ascontiguousarray(x2)))[0])
    assert v2 == pytest.approx(-1.0, abs=1e-5)


def test_barkspectrum_shape_and_sensitivity():
    x = _stereo(0, t=65536)
    B = losses.compute_barkspectrum(x, sample_rate=SR)
    assert B.shape == (2, 24, 2)  # (bs, bands, mid+side)
    y = x * 2.0
    B2 = losses.compute_barkspectrum(y, sample_rate=SR)
    # doubling amplitude shifts log spectrum by log(2)
    np.testing.assert_allclose(np.asarray(B2 - B), np.log(2), atol=1e-2)


def test_bark_fbanks_shape():
    fb = losses.barkscale_fbanks(16385, 20.0, 20000.0, 24, SR)
    assert fb.shape == (16385, 24)
    assert fb.min() >= 0
    # each frequency bin's filter weights are bounded
    assert fb.max() <= 1.0 + 1e-6


def test_afloss_dict_contract_and_zero():
    x = _stereo(0, t=65536)
    af = losses.AudioFeatureLoss(sample_rate=SR)
    d = af(x, x)
    assert set(d) == {
        "mix-rms", "mix-crest_factor", "mix-stereo_width",
        "mix-stereo_imbalance", "mix-barkspectrum",
    }
    for v in d.values():
        assert float(v) == 0.0
    d2 = af(x * 1.5, x)
    total = sum(float(v) for v in d2.values())
    assert total > 0


def test_afloss_grad_finite():
    x = _stereo(0, t=32768)
    y = _stereo(1, t=32768)
    af = losses.AudioFeatureLoss(sample_rate=SR)

    def total(p):
        return sum(af(p, x).values())

    g = jax.grad(total)(y)
    assert np.isfinite(np.asarray(g)).all()


def test_afloss_rejects_clap():
    with pytest.raises(NotImplementedError):
        losses.AudioFeatureLoss(weights=(1, 1, 1, 1, 1), use_clap=True)


@pytest.mark.smoke
def test_si_sdr_properties():
    """SI-SDR: +inf-ish for scaled copies, low for noise, known value for
    a constructed target+noise mixture."""
    from diffmst_tpu.losses import si_sdr

    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.normal(size=(1, 2, 8192)).astype(np.float32))
    assert float(si_sdr(3.0 * t, t)) > 60.0  # scale-invariant
    noise = jnp.asarray(rng.normal(size=(1, 2, 8192)).astype(np.float32))
    assert float(si_sdr(noise, t)) < 1.0
    # target + noise at exactly -10 dB SNR (orthogonalized noise)
    n = noise - jnp.sum(noise * t, -1, keepdims=True) / jnp.sum(t * t, -1, keepdims=True) * t
    n = n / jnp.sqrt(jnp.sum(n * n, -1, keepdims=True))
    scale = jnp.sqrt(jnp.sum(t * t, -1, keepdims=True)) * 10 ** (-10 / 20)
    got = float(si_sdr(t + scale * n, t))
    assert abs(got - 10.0) < 0.2, got
