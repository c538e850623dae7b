"""Console tests: shapes, NaN-freedom over random params, gradient flow,
effect toggles, padded-track silence, and naive_random_mix contract.

Replaces the reference's stale smoke script tests/test_mix.py (100-mix NaN
sweep) with asserting equivalents.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffmst_tpu.console import (
    AdvancedMixConsole,
    BasicMixConsole,
    split_track_params,
    split_fx_bus_params,
    split_master_bus_params,
    validate_normalized,
)
from diffmst_tpu.mixing import naive_random_mix

SR = 44100.0
BS, NT, T = 2, 4, 16384


@pytest.fixture(scope="module")
def tracks():
    key = jax.random.PRNGKey(0)
    return jax.random.normal(key, (BS, NT, T)) * 0.1


def _rand_params(key, console):
    k1, k2, k3 = jax.random.split(key, 3)
    tp = jax.random.uniform(k1, (BS, NT, console.num_track_control_params))
    fp = jax.random.uniform(k2, (BS, console.num_fx_bus_control_params))
    mp = jax.random.uniform(k3, (BS, console.num_master_bus_control_params))
    return tp, fp, mp


@pytest.mark.smoke
def test_param_layout_counts():
    c = AdvancedMixConsole(SR)
    assert c.num_track_control_params == 27
    assert c.num_fx_bus_control_params == 25
    assert c.num_master_bus_control_params == 26
    p = jnp.zeros((1, 27))
    d = split_track_params(p)
    assert set(d) == {"input_fader", "parametric_eq", "compressor", "stereo_panner", "fx_bus"}
    assert len(d["parametric_eq"]) == 18
    assert len(d["compressor"]) == 6
    f = split_fx_bus_params(jnp.zeros((1, 25)))
    assert len(f["reverberation"]) == 25
    np.testing.assert_allclose(np.asarray(f["reverberation"]["mix"]), 1.0)
    m = split_master_bus_params(jnp.zeros((1, 26)))
    assert len(m["parametric_eq"]) == 18 and len(m["compressor"]) == 6


def test_basic_console_shapes_and_mix(tracks):
    c = BasicMixConsole(SR)
    tp = jnp.full((BS, NT, 2), 0.5)
    out = c(tracks, tp)
    assert out.mixed_tracks.shape == (BS, 2, NT, T)
    assert out.mix.shape == (BS, 2, T)
    # gain 0.5 -> 0 dB; pan 0.5 -> equal power center
    np.testing.assert_allclose(
        np.asarray(out.mix[:, 0]), np.asarray(out.mix[:, 1]), rtol=1e-5
    )


def test_advanced_console_full_chain_shapes(tracks):
    c = AdvancedMixConsole(SR, reverb_num_samples=2048, reverb_num_taps=255)
    tp, fp, mp = _rand_params(jax.random.PRNGKey(1), c)
    out = c(tracks, tp, fp, mp, key=jax.random.PRNGKey(2))
    assert out.mixed_tracks.shape == (BS, 2, NT, T)
    assert out.mix.shape == (BS, 2, T)
    assert np.isfinite(np.asarray(out.mix)).all()


def test_advanced_console_nan_sweep(tracks):
    """The reference's test_mix.py NaN sweep, asserted: random params never NaN."""
    c = AdvancedMixConsole(SR, reverb_num_samples=1024, reverb_num_taps=255)

    @jax.jit
    def render(key, tracks):
        tp, fp, mp = _rand_params(key, c)
        out = c(tracks, tp, fp, mp, key=key)
        return out.mix

    for i in range(10):
        mix = render(jax.random.PRNGKey(i), tracks)
        assert np.isfinite(np.asarray(mix)).all(), f"NaN at sweep {i}"


@pytest.mark.smoke
def test_advanced_console_toggles(tracks):
    """Disabling every effect leaves only pan+sum of the raw tracks."""
    c = AdvancedMixConsole(SR)
    tp, fp, mp = _rand_params(jax.random.PRNGKey(3), c)
    out = c(
        tracks, tp, fp, mp,
        use_track_input_fader=False, use_track_eq=False,
        use_track_compressor=False, use_fx_bus=False,
        use_master_bus=False, use_output_fader=False,
    )
    pan = out.track_param_dict["stereo_panner"]["pan"]
    import diffmst_tpu.ops as ops

    expect = ops.stereo_panner(tracks, SR, pan).sum(axis=2)
    np.testing.assert_allclose(np.asarray(out.mix), np.asarray(expect), atol=1e-5)


@pytest.mark.smoke
def test_padded_tracks_stay_silent(tracks):
    """Zero-padded tracks must contribute silence through the full track chain
    except for compressor makeup gain applied to zero signal (still zero)."""
    c = AdvancedMixConsole(SR)
    t2 = tracks.at[:, -1, :].set(0.0)
    tp, fp, mp = _rand_params(jax.random.PRNGKey(4), c)
    out = c(t2, tp, fp, mp, use_fx_bus=False)
    stem = np.asarray(out.mixed_tracks)[:, :, -1, :]
    assert np.abs(stem).max() < 1e-6


def test_console_gradient_flows_to_params(tracks):
    c = AdvancedMixConsole(SR)
    tp, fp, mp = _rand_params(jax.random.PRNGKey(5), c)

    def loss(tp, mp):
        out = c(tracks, tp, fp, mp, use_fx_bus=False)
        return jnp.mean(jnp.square(out.mix))

    gtp, gmp = jax.grad(loss, argnums=(0, 1))(tp, mp)
    assert np.isfinite(np.asarray(gtp)).all()
    assert np.isfinite(np.asarray(gmp)).all()
    # every track parameter participates except release (dummy under fsm)
    g = np.abs(np.asarray(gtp)).sum(axis=(0, 1))
    active = np.ones(27, bool)
    active[22] = False  # release_ms is inert in the reference-compatible smoother
    active[26] = False  # fx send unused with use_fx_bus=False
    assert (g[active] > 0).all(), f"dead params: {np.where(g[active] == 0)}"


@pytest.mark.smoke
def test_validate_normalized_raises():
    with pytest.raises(ValueError):
        validate_normalized({"input_fader": {"gain_db": jnp.array([1.5])}})


def test_naive_random_mix_contract(tracks):
    c = AdvancedMixConsole(SR, reverb_num_samples=1024, reverb_num_taps=255)
    out = naive_random_mix(tracks, c, jax.random.PRNGKey(0), use_fx_bus=False)
    assert out.mix.shape == (BS, 2, T)
    assert out.track_params.shape == (BS, NT, 27)
    assert out.fx_bus_params.shape == (BS, 25)
    assert out.master_bus_params.shape == (BS, 26)
    assert np.isfinite(np.asarray(out.mix)).all()
    # stop_gradient: differentiating the mix w.r.t. tracks gives zeros
    def f(tr):
        return jnp.sum(naive_random_mix(tr, c, jax.random.PRNGKey(0), use_fx_bus=False).mix)

    g = jax.grad(f)(tracks)
    np.testing.assert_allclose(np.asarray(g), 0.0)


def test_naive_random_mix_deterministic_per_key(tracks):
    c = BasicMixConsole(SR)
    a = naive_random_mix(tracks, c, jax.random.PRNGKey(7))
    b = naive_random_mix(tracks, c, jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(a.mix), np.asarray(b.mix))
    c2 = naive_random_mix(tracks, c, jax.random.PRNGKey(8))
    assert np.abs(np.asarray(a.mix) - np.asarray(c2.mix)).max() > 1e-6


def test_fader_folded_into_eq_matches_series():
    """Folding the input fader into the EQ response == fader then EQ."""
    from diffmst_tpu import ops

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (3, 1, 8192)) * 0.1
    gains_db = jnp.array([-6.0, 0.0, 12.0])
    p = {}
    from diffmst_tpu.console.ranges import advanced_param_ranges

    for i, (k, (lo, hi)) in enumerate(
        advanced_param_ranges(SR)["parametric_eq"].items()
    ):
        p[k] = jax.random.uniform(jax.random.fold_in(key, i), (3,), None, lo, hi)

    series = ops.parametric_eq(ops.gain(x, SR, gains_db), SR, **p)
    folded = ops.parametric_eq(
        x, SR, linear_gain=ops.db_to_linear(gains_db), **p
    )
    np.testing.assert_allclose(
        np.asarray(folded), np.asarray(series), atol=2e-5
    )


def test_16track_fx_bus_full_chain():
    """BASELINE stretch config: 16-track chain with bus/reverb sends through
    the full console (per-track fader/EQ/comp -> pan -> sum; fx bus send ->
    12-band reverb; master EQ/comp/faders) — finite, correct shapes, and
    gradients flow into the fx-bus parameters."""
    console = AdvancedMixConsole(
        SR, reverb_num_samples=8192, reverb_num_taps=255
    )
    key = jax.random.PRNGKey(0)
    bs, nt, t = 1, 16, 32768
    tracks = jax.random.normal(key, (bs, nt, t)) * 10 ** (-36 / 20)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    tp = jax.random.uniform(k1, (bs, nt, 27))
    fp = jax.random.uniform(k2, (bs, 25))
    mp = jax.random.uniform(k3, (bs, 26))

    out = console(tracks, tp, fp, mp, use_fx_bus=True, key=k4)
    assert out.mix.shape == (bs, 2, t)
    assert out.mixed_tracks.shape == (bs, 2, nt, t)
    assert np.isfinite(np.asarray(out.mix)).all()

    def loss(fp):
        return jnp.sum(
            jnp.square(console(tracks, tp, fp, mp, use_fx_bus=True, key=k4).mix)
        )

    g = jax.grad(loss)(fp)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0  # reverb params actually participate


def test_console_causal_mode_runs():
    """Opt-in fully-causal console (scan EQ + scan compressor) renders
    finite audio close to the default console in the interior."""
    c_fs = AdvancedMixConsole(SR, comp_smoother="scan")
    c_causal = AdvancedMixConsole(SR, comp_smoother="scan", eq_method="scan")
    key = jax.random.PRNGKey(3)
    tracks = jax.random.normal(key, (1, 3, 16384)) * 10 ** (-24 / 20)
    k1, k2, k3 = jax.random.split(key, 3)
    tp = jax.random.uniform(k1, (1, 3, 27), minval=0.3, maxval=0.7)
    fp = jax.random.uniform(k2, (1, 25))
    mp = jax.random.uniform(k3, (1, 26), minval=0.3, maxval=0.7)

    m_fs = np.asarray(c_fs(tracks, tp, fp, mp, use_fx_bus=False).mix)
    m_ca = np.asarray(c_causal(tracks, tp, fp, mp, use_fx_bus=False).mix)
    assert np.isfinite(m_ca).all()
    peak = np.abs(m_fs).max()
    # mid-range normalized params keep every pole comfortably inside the
    # f32 scan envelope; interior agreement to ~1% of peak
    d = np.abs(m_fs - m_ca)[..., 4096:].max() / peak
    assert d < 2e-2, d
