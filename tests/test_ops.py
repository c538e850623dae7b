"""Asserting property tests for the DSP ops layer.

The reference ships only print-and-plot smoke scripts (see SURVEY.md §4);
these tests turn each probe into a real assertion: pan-law power sums, EQ
magnitude responses within tolerance, compressor static curve and attack time
constants, bus summing, reverb shape/decay, STFT parity vs torch.stft, and
BS.1770 loudness sanity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal as sps

from diffmst_tpu import ops


SR = 44100.0


# ---------------------------------------------------------------- gain / pan
@pytest.mark.smoke
def test_gain_db_scaling():
    x = jnp.ones((2, 1, 16))
    y = ops.gain(x, SR, jnp.array([6.0, -6.0]))
    np.testing.assert_allclose(y[0], 10 ** (6 / 20), rtol=1e-5)
    np.testing.assert_allclose(y[1], 10 ** (-6 / 20), rtol=1e-5)


@pytest.mark.smoke
def test_gain_per_channel():
    x = jnp.ones((1, 2, 8))
    y = ops.gain(x, SR, jnp.array([[0.0, -20.0]]))
    np.testing.assert_allclose(y[0, 0], 1.0, rtol=1e-5)
    np.testing.assert_allclose(y[0, 1], 0.1, rtol=1e-5)


@pytest.mark.smoke
def test_panner_extremes_and_center():
    x = jnp.ones((1, 3, 4))
    pan = jnp.array([[0.0, 0.5, 1.0]])
    y = ops.stereo_panner(x, SR, pan)
    assert y.shape == (1, 2, 3, 4)
    # hard left: all energy left
    np.testing.assert_allclose(y[0, 0, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(y[0, 1, 0], 0.0, atol=1e-6)
    # hard right
    np.testing.assert_allclose(y[0, 0, 2], 0.0, atol=1e-6)
    np.testing.assert_allclose(y[0, 1, 2], 1.0, atol=1e-6)
    # center: equal, -4.5 dB compromise law => amp sqrt(pi/4*cos(pi/4))... equal L/R
    np.testing.assert_allclose(y[0, 0, 1], y[0, 1, 1], rtol=1e-5)


def test_panner_power_curve_monotonic():
    # left gain decreases, right increases monotonically in pan
    pans = jnp.linspace(0, 1, 33)[None, :]
    x = jnp.ones((1, 33, 1))
    y = np.asarray(ops.stereo_panner(x, SR, pans))[0, :, :, 0]
    assert np.all(np.diff(y[0]) < 1e-7)  # left monotonically non-increasing
    assert np.all(np.diff(y[1]) > -1e-7)  # right monotonically non-decreasing


def test_stereo_bus_send_gains():
    bs, n, t = 2, 4, 16
    x = jnp.ones((bs, 2, n, t))
    send_db = jnp.zeros((bs, n))
    y = ops.stereo_bus(x, SR, send_db)
    assert y.shape == (bs, 2, t)
    np.testing.assert_allclose(y, n * 1.0, rtol=1e-5)
    y2 = ops.stereo_bus(x, SR, jnp.full((bs, n), -20.0))
    np.testing.assert_allclose(y2, n * 0.1, rtol=1e-5)


# ---------------------------------------------------------------------- EQ
def _eq_flat_params(bs):
    """All gains 0 dB -> identity response."""
    names = ["low_shelf", "band0", "band1", "band2", "band3", "high_shelf"]
    freqs = [100.0, 200.0, 3000.0, 9000.0, 13000.0, 10000.0]
    p = {}
    for nm, f in zip(names, freqs):
        p[f"{nm}_gain_db"] = jnp.zeros(bs)
        p[f"{nm}_cutoff_freq"] = jnp.full(bs, f)
        p[f"{nm}_q_factor"] = jnp.full(bs, 0.707)
    return p


def test_eq_flat_is_identity():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 1, 4096))
    y = ops.parametric_eq(x, SR, **_eq_flat_params(2))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)


def test_eq_peaking_band_boost_response():
    """A +12 dB peaking band at 1 kHz must boost ~12 dB at center frequency."""
    p = _eq_flat_params(1)
    p["band0_gain_db"] = jnp.array([12.0])
    p["band0_cutoff_freq"] = jnp.array([1000.0])
    p["band0_q_factor"] = jnp.array([2.0])
    H = ops.parametric_eq_response(SR, 8192, **p)
    freqs = np.fft.rfftfreq(8192, 1 / SR)
    mag_db = 20 * np.log10(np.abs(np.asarray(H)[0]))
    k = np.argmin(np.abs(freqs - 1000.0))
    assert abs(mag_db[k] - 12.0) < 0.3
    # far away the response returns to ~0 dB
    k10 = np.argmin(np.abs(freqs - 10000.0))
    assert abs(mag_db[k10]) < 0.5


def test_eq_response_matches_scipy_sosfreqz():
    """Cascade response equals scipy's analytic evaluation of the same SOS."""
    rng = np.random.default_rng(3)
    p = _eq_flat_params(1)
    for nm in ["low_shelf", "band1", "high_shelf"]:
        p[f"{nm}_gain_db"] = jnp.array([rng.uniform(-12, 12)])
    from diffmst_tpu.ops.eq import _eq_sos

    b, a = _eq_sos(SR, **p)
    sos = np.concatenate([np.asarray(b)[0], np.asarray(a)[0]], axis=-1)
    # evaluate scipy on the exact rFFT grid (2 pi k / n_fft, k=0..n/2,
    # endpoint INCLUSIVE) — integer worN would give pi*k/worN endpoint-
    # exclusive, a mismatched grid that only slipped under the tolerance
    # because the responses are smooth
    grid = 2.0 * np.pi * np.arange(2049) / 4096
    _, h_ref = sps.sosfreqz(sos, worN=grid)
    H = ops.parametric_eq_response(SR, 4096, **p)
    np.testing.assert_allclose(np.abs(np.asarray(H)[0]), np.abs(h_ref), rtol=1e-3, atol=1e-5)


def test_eq_grad_finite():
    p = _eq_flat_params(1)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 2048))

    def loss(g):
        q = dict(p)
        q["band0_gain_db"] = g
        return jnp.sum(jnp.square(ops.parametric_eq(x, SR, **q)))

    g = jax.grad(loss)(jnp.array([6.0]))
    assert np.isfinite(np.asarray(g)).all()


# --------------------------------------------------------------- compressor
def _comp_params(bs, **over):
    p = dict(
        threshold_db=jnp.full(bs, -20.0),
        ratio=jnp.full(bs, 4.0),
        attack_ms=jnp.full(bs, 10.0),
        release_ms=jnp.full(bs, 100.0),
        knee_db=jnp.full(bs, 3.0),
        makeup_gain_db=jnp.zeros(bs),
    )
    p.update({k: jnp.asarray(v) for k, v in over.items()})
    return p


def test_compressor_static_gain_above_threshold():
    """Constant 0 dBFS envelope above threshold is reduced per the ratio."""
    x = np.ones((1, 1, 2 ** 15), dtype=np.float32)
    x[..., 1::2] = -1.0  # alternating full-scale: |x| == 1 everywhere
    p = _comp_params(1, threshold_db=[-20.0], ratio=[4.0], knee_db=[3.0])
    y = ops.compressor(jnp.asarray(x), SR, **p, smoother="scan")
    # steady state: out_db = thresh + (in_db - thresh)/ratio = -20 + 20/4 = -15
    out_db = 20 * np.log10(np.abs(np.asarray(y))[..., 8000:].max())
    assert abs(out_db - (-15.0)) < 0.5


def test_compressor_below_threshold_transparent():
    t = np.arange(2 ** 14) / SR
    x = 0.01 * jnp.asarray(np.sin(2 * np.pi * 500 * t, dtype=np.float32))[None, None, :]
    p = _comp_params(1)
    y = ops.compressor(x, SR, **p, smoother="scan")
    np.testing.assert_allclose(np.asarray(y)[..., 2000:], np.asarray(x)[..., 2000:], atol=2e-4)


def test_compressor_attack_time_constant():
    """Step input: gain reaches 90% of final reduction after ~attack_ms."""
    seq = 2 ** 15
    x = np.zeros((1, 1, seq), dtype=np.float32)
    x[..., 100:] = 1.0  # 0 dBFS step
    attack_ms = 50.0
    p = _comp_params(1, attack_ms=[attack_ms], knee_db=[3.0])
    g = ops.compressor_gain_db(
        jnp.asarray(x).reshape(1, seq), SR,
        p["threshold_db"], p["ratio"], p["attack_ms"], p["release_ms"],
        p["knee_db"], smoother="scan",
    )
    g = np.asarray(g)[0]
    g_final = g[-1]
    # time (after step) where gain reduction reaches 90% of final value
    idx = np.argmax(g <= 0.9 * g_final)  # g is negative
    t90_ms = (idx - 100) / SR * 1e3
    assert abs(t90_ms - attack_ms) < attack_ms * 0.2


def test_compressor_scan_matches_ballistics_when_attack_only():
    """With equal attack/release the branching smoother equals the one-pole."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 4096)) * 0.5
    p = _comp_params(2, attack_ms=[20.0, 20.0], release_ms=[20.0, 20.0])
    y1 = ops.compressor(x, SR, **p, smoother="scan")
    y2 = ops.compressor(x, SR, **p, smoother="ballistics")
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-4)


def test_compressor_fsm_close_to_scan_interior():
    """FSM (circular) smoother ~= causal scan away from segment boundaries."""
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 2 ** 15)) * 0.5
    p = _comp_params(1, attack_ms=[5.0])
    y1 = np.asarray(ops.compressor(x, SR, **p, smoother="fsm"))
    y2 = np.asarray(ops.compressor(x, SR, **p, smoother="scan"))
    interior = slice(8192, -8192)
    err = np.abs(y1[..., interior] - y2[..., interior]).max()
    assert err < 5e-3


def test_compressor_lookahead_delays_signal():
    x = np.zeros((1, 1, 8192), dtype=np.float32)
    x[..., 4000] = 0.01  # quiet click, no compression triggered
    p = _comp_params(1)
    y = ops.compressor(jnp.asarray(x), SR, **p, lookahead_samples=128, smoother="scan")
    assert np.abs(np.asarray(y)[0, 0, 4128]) > 0.005


def test_compressor_grad_finite():
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 2048)) * 0.5

    def loss(th):
        p = _comp_params(1, threshold_db=th)
        return jnp.sum(jnp.square(ops.compressor(x, SR, **p, smoother="scan")))

    g = jax.grad(loss)(jnp.array([-20.0]))
    assert np.isfinite(np.asarray(g)).all()


# ------------------------------------------------------------------- reverb
def _reverb_params(bs, gain=1.0, decay=0.5, mix=1.0):
    p = {}
    for i in range(12):
        p[f"band{i}_gain"] = jnp.full(bs, gain)
        p[f"band{i}_decay"] = jnp.full(bs, decay)
    p["mix"] = jnp.full(bs, mix)
    return p


def test_reverb_shapes_and_dry_passthrough():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 8192))
    p = _reverb_params(1, mix=0.0)
    y = ops.noise_shaped_reverberation(
        x, SR, **p, num_samples=1024, num_bandpass_taps=255, key=jax.random.PRNGKey(1)
    )
    assert y.shape == x.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_reverb_adds_tail():
    x = np.zeros((1, 2, 8192), dtype=np.float32)
    x[..., 100] = 1.0
    p = _reverb_params(1, mix=1.0, decay=0.2)
    y = np.asarray(
        ops.noise_shaped_reverberation(
            jnp.asarray(x), SR, **p, num_samples=2048, num_bandpass_taps=255,
            key=jax.random.PRNGKey(1),
        )
    )
    # energy must exist well after the impulse (tail), and be causal (none before)
    assert np.abs(y[..., 1500:4000]).max() > 1e-4
    assert np.abs(y[..., :90]).max() < 1e-6


def test_octave_filterbank_partitions_spectrum():
    fb = ops.octave_band_filterbank(1023, SR)
    assert fb.shape == (12, 1023)
    H = np.abs(np.fft.rfft(fb, n=8192, axis=-1))
    total = H.sum(axis=0)
    freqs = np.fft.rfftfreq(8192, 1 / SR)
    band = (freqs > 50) & (freqs < 15000)
    # bands approximately tile the audible spectrum (sum of responses ~ 1)
    assert np.all(total[band] > 0.5) and np.all(total[band] < 1.6)


# --------------------------------------------------------------------- STFT
def test_stft_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(0).normal(size=(3, 8192)).astype(np.float32)
    n_fft, hop = 1024, 256
    ours = np.asarray(ops.stft(jnp.asarray(x), n_fft, hop))
    ref = torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        window=torch.hann_window(n_fft),
        return_complex=True,
    ).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_frame_signal_shape():
    x = jnp.arange(100.0)[None]
    f = ops.frame_signal(x, 16, 8)
    assert f.shape == (1, 16, 11)
    np.testing.assert_allclose(np.asarray(f[0, :, 1]), np.arange(8.0, 24.0))


# ----------------------------------------------------------------- loudness
def test_integrated_loudness_sine_calibration():
    """A 997 Hz, -20 dBFS RMS stereo sine ~= -20 LUFS (mid-band K-weight ~ 0 dB)."""
    t = np.arange(int(SR * 3)) / SR
    amp = 10 ** (-20 / 20) * np.sqrt(2)
    x = (amp * np.sin(2 * np.pi * 997 * t)).astype(np.float32)
    lufs = ops.integrated_loudness(np.stack([x, x], 1), SR)
    # stereo sum doubles power: +3.01 dB vs mono
    assert abs(lufs - (-20.0 + 3.01)) < 0.7


def test_integrated_loudness_gain_linearity():
    rng = np.random.default_rng(0)
    x = rng.normal(size=int(SR * 2)).astype(np.float32) * 0.05
    l1 = ops.integrated_loudness(x, SR)
    l2 = ops.integrated_loudness(2.0 * x, SR)
    assert abs((l2 - l1) - 6.02) < 0.1


def test_integrated_loudness_silence():
    assert ops.integrated_loudness(np.zeros(44100), SR) == float("-inf")


def test_loudness_jax_close_to_host():
    rng = np.random.default_rng(1)
    x = (rng.normal(size=(2, 2, int(SR * 2))) * 0.05).astype(np.float32)
    host = np.array([ops.integrated_loudness(np.moveaxis(x[i], 0, 1), SR) for i in range(2)])
    dev = np.asarray(ops.integrated_loudness_jax(jnp.asarray(x), SR))
    np.testing.assert_allclose(dev, host, atol=0.3)


def test_loudness_normalize_hits_target():
    rng = np.random.default_rng(2)
    x = rng.normal(size=int(SR * 2)).astype(np.float32) * 0.3
    y = ops.loudness_normalize(x, SR, -24.0)
    assert abs(ops.integrated_loudness(y, SR) - (-24.0)) < 0.05


def test_parametric_eq_scan_method_matches_fs_response():
    """The causal ('scan') EQ matches the frequency-sampling EQ away from
    the wrap-in region for well-conditioned filters. f32 parallel-scan IIR
    carries a conditioning factor ~eps/(1-r)^2 (r = pole radius), so the
    check applies to items with r <= 0.999 — extreme low-frequency high-Q
    shelves (r ~ 0.9996 -> error O(1)) are out of the opt-in mode's f32
    envelope (documented in ops/iir.py)."""
    key = jax.random.PRNGKey(0)
    bs, t = 4, 16384
    x = jax.random.normal(key, (bs, 2, t)) * 0.1
    from diffmst_tpu.console.ranges import advanced_param_ranges
    from diffmst_tpu.ops.eq import _eq_sos

    p = {}
    for i, (k, (lo, hi)) in enumerate(
        advanced_param_ranges(SR)["parametric_eq"].items()
    ):
        p[k] = jax.random.uniform(jax.random.fold_in(key, i), (bs,), None, lo, hi)
    g = jnp.array([0.5, 2.0, 1.0, 1.0])

    y_fs = np.asarray(ops.parametric_eq(x, SR, linear_gain=g, **p))
    y_scan = np.asarray(
        ops.parametric_eq(x, SR, linear_gain=g, method="scan", **p)
    )
    assert np.isfinite(y_scan).all()

    b, a = _eq_sos(SR, **p)
    an = np.asarray(a, np.float64)
    checked = 0
    for i in range(bs):
        r = max(
            np.abs(np.roots(an[i, s])).max() for s in range(an.shape[1])
        )
        if r > 0.999:
            continue  # outside the f32 scan envelope
        checked += 1
        peak = np.abs(y_fs[i]).max()
        # skip the wrap-in region: fs is circular, scan is causal
        d = np.abs(y_fs[i] - y_scan[i])[..., 4096:].max() / peak
        assert d < 1e-2, (i, d)
    assert checked >= 2  # the draw covers well-conditioned items
