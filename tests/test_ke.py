"""Knowledge-engineering mixing tests (synthetic KE dict, reference schema)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from diffmst_tpu.console import AdvancedMixConsole
from diffmst_tpu.mixing import knowledge_engineering_mix

SR = 44100.0


def _ke_dict():
    eq = {k: [0.0, 0.0] for k in [
        "eq_lowshelf_gain", "eq_band0_gain", "eq_band1_gain",
        "eq_band2_gain", "eq_band3_gain", "eq_highshelf_gain"]}
    eq.update({
        "eq_lowshelf_freq": [50, 200], "eq_lowshelf_q": [1.0, 2.0],
        "eq_band0_freq": [150, 500], "eq_band0_q": [1.0, 1.0],
        "eq_band1_freq": [2000, 8000], "eq_band1_q": [1.0, 5.0],
        "eq_band2_freq": [8000, 12000], "eq_band2_q": [1.0, 1.0],
        "eq_band3_freq": [12000, 12000], "eq_band3_q": [1.0, 5.0],
        "eq_highshelf_freq": [6000, 10000], "eq_highshelf_q": [1.0, 2.0],
    })
    comp = {"threshold_db": [-23.0, -20.0], "ratio": [1.0, 4.0],
            "attack_ms": [10.0, 100.0], "release_ms": [10.0, 100.0],
            "knee_db": [3.0, 5.0], "makeup_gain_db": [2.0, 5.0]}
    return {
        "bass_drum": {"instruments": ["kick", "bass drum"],
                      "gain": [-13.0, -11.0], "pan": [0.5, 0.5],
                      "eq": eq, "compressor": comp},
        "vox": {"instruments": ["vocals"], "gain": [-6.0, -6.0],
                "pan": [0.5, 0.5], "eq": eq, "compressor": comp},
        "fx_bus": {"instruments": ["fx_bus_console"],
                   "reverb_gain": {f"band_{i}": [0.0, 1.0] for i in range(12)},
                   "reverb_decay": {f"band_{i}": [0.0, 1.0] for i in range(12)},
                   "mix": [0.0, 1.0], "send_db": [-80.0, 12.0]},
        "master_bus": {"instruments": ["master_bus_console"], "eq": eq,
                       "compressor": comp,
                       "fader": {"gain_db": [-10.0, 0.0]}},
    }


def test_ke_mix_renders_and_params_in_range():
    console = AdvancedMixConsole(SR)
    bs, nt, t = 2, 4, 16384
    tracks = jax.random.normal(jax.random.PRNGKey(0), (bs, nt, t)) * 0.05
    name2id = {"kick": 1, "vocals": 2, "bass": 3}
    iid = np.array([[1, 2, 1, 2], [2, 1, 2, 1]])
    out = knowledge_engineering_mix(
        tracks, console,
        instrument_id=iid, stereo_id=np.zeros((bs, nt), int),
        instrument_number_file=name2id, ke_dict=_ke_dict(),
        use_fx_bus=False, seed=3,
    )
    assert out.mix.shape == (bs, 2, t)
    assert np.isfinite(np.asarray(out.mix)).all()
    for p in (out.track_params, out.fx_bus_params, out.master_bus_params):
        a = np.asarray(p)
        assert (a >= 0).all() and (a <= 1).all()
    # kick gain sampled within [-13, -11] dB -> check denormalized value
    g = np.asarray(out.track_param_dict["input_fader"]["gain_db"])
    kick_positions = iid == 1
    assert ((g[kick_positions] >= -13.01) & (g[kick_positions] <= -10.99)).all()


def test_ke_stereo_pair_mirrored_pan():
    console = AdvancedMixConsole(SR)
    bs, nt, t = 1, 4, 8192
    tracks = jax.random.normal(jax.random.PRNGKey(1), (bs, nt, t)) * 0.05
    ke = _ke_dict()
    ke["gtr"] = {"instruments": ["guitar"], "gain": [-9.0, -9.0],
                 "pan": [0.1, 0.4], "eq": ke["vox"]["eq"],
                 "compressor": ke["vox"]["compressor"]}
    name2id = {"guitar": 7}
    iid = np.full((bs, nt), 7)
    stereo = np.array([[1, 0, 0, 0]])  # tracks 0/1 form a stereo pair
    out = knowledge_engineering_mix(
        tracks, console, instrument_id=iid, stereo_id=stereo,
        instrument_number_file=name2id, ke_dict=ke, use_fx_bus=False, seed=0,
    )
    pan = np.asarray(out.track_param_dict["stereo_panner"]["pan"])[0]
    np.testing.assert_allclose(pan[0] + pan[1], 1.0, atol=1e-6)
    assert 0.1 <= pan[0] <= 0.4


@pytest.mark.smoke
def test_ke_unknown_instrument_uses_default():
    console = AdvancedMixConsole(SR)
    tracks = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 8192)) * 0.05
    out = knowledge_engineering_mix(
        tracks, console, instrument_id=np.array([[99, 99]]),
        stereo_id=np.zeros((1, 2), int),
        instrument_number_file={"theremin": 42}, ke_dict=_ke_dict(),
        use_fx_bus=False,
    )
    g = np.asarray(out.track_param_dict["input_fader"]["gain_db"])
    assert ((g >= -12.01) & (g <= -5.99)).all()


def test_ke_mix_uses_vendored_yaml_by_default():
    """With the reference metadata vendored, KE mixing needs no explicit
    ke_dict (real per-class ranges from data/knowledge_engineering.yaml)."""
    from diffmst_tpu.console import AdvancedMixConsole

    console = AdvancedMixConsole(44100.0)
    tracks = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 2, 16384)).astype(np.float32)
        * 0.01
    )
    out = knowledge_engineering_mix(
        tracks, console, use_fx_bus=False, key=jax.random.PRNGKey(0)
    )
    assert np.isfinite(np.asarray(out.mix)).all()
    assert out.mix.shape == (1, 2, 16384)


def test_ke_pan_uses_discrete_candidates():
    """Pan entries in the KE YAML are candidate VALUES, not a range — the
    reference draws them with random.choice (mixing.py:312). A class listing
    [1.0, 0.0] must produce both hard-left and hard-right pans (a range
    reading would freeze it at 1.0 forever), and a 4-candidate list must hit
    all four values."""
    from diffmst_tpu.mixing.knowledge import _choice, sample_ke_params

    rng = np.random.default_rng(0)
    draws = {_choice(rng, [1.0, 0.0], (0.3, 0.7)) for _ in range(64)}
    assert draws == {0.0, 1.0}
    draws4 = {_choice(rng, [0.3, 0.4, 0.6, 0.7], (0.3, 0.7)) for _ in range(256)}
    assert draws4 == {0.3, 0.4, 0.6, 0.7}

    console = AdvancedMixConsole(SR)
    ke = _ke_dict()
    ke["extreme"] = dict(ke["vox"], instruments=["perc"], pan=[1.0, 0.0])
    mdata = [["perc"] * 8]
    pans = set()
    for s in range(16):
        tp, _, _ = sample_ke_params(
            ke, mdata, np.zeros((1, 8), int), np.random.default_rng(s), console
        )
        pans.update(np.round(np.asarray(tp[0, :, 25]), 4).tolist())
    assert len(pans) == 2  # normalized images of exactly {0.0, 1.0}


def test_ke_mix_refuses_tracing():
    """Host-side by nature: tracing it into jit would freeze the sampled
    parameters as compile-time constants, so it must raise instead."""
    console = AdvancedMixConsole(SR)
    tracks = jnp.zeros((1, 2, 16384))

    @jax.jit
    def step(tr, key):
        return knowledge_engineering_mix(
            tr, console, key, ke_dict=_ke_dict(), use_fx_bus=False
        ).mix

    with pytest.raises(TypeError, match="host-side"):
        step(tracks, jax.random.PRNGKey(0))


def test_ke_key_varies_mix():
    """Without an explicit seed, the jax key drives the host RNG: distinct
    keys must give distinct parameter draws (the reference resamples its
    global random stream every call, mixing.py:296-312)."""
    console = AdvancedMixConsole(SR)
    tracks = jax.random.normal(jax.random.PRNGKey(9), (1, 2, 16384)) * 0.05
    kw = dict(ke_dict=_ke_dict(), use_fx_bus=False)
    a = knowledge_engineering_mix(tracks, console, jax.random.PRNGKey(1), **kw)
    b = knowledge_engineering_mix(tracks, console, jax.random.PRNGKey(2), **kw)
    c = knowledge_engineering_mix(tracks, console, jax.random.PRNGKey(1), **kw)
    assert not np.allclose(np.asarray(a.track_params), np.asarray(b.track_params))
    assert np.array_equal(np.asarray(a.track_params), np.asarray(c.track_params))
