"""Golden numerical parity: JAX float32 ops vs an independent torch/float64 oracle.

BASELINE.md demands <1e-4 max output deviation vs the reference DSP. The
reference's DSP package (dasp-pytorch==0.0.1) cannot be installed here (no
network egress — see PARITY.md), so each op is checked against
tests/torch_ref.py: an independent float64 PyTorch implementation of the same
documented algorithm, exercised at the console's call-site shapes and
parameter ranges (/root/reference/mst/modules.py:230-314, ranges at
modules.py:121-181). float64 + torch FFTs make the oracle a genuinely
different numerical path, so agreement bounds the JAX float32 implementation
error, not shared bugs in one FFT stack.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from diffmst_tpu import ops  # noqa: E402
from diffmst_tpu.console.ranges import advanced_param_ranges  # noqa: E402
from tests import torch_ref  # noqa: E402

SR = 44100.0
RANGES = advanced_param_ranges(SR)
TOL = 1e-4  # BASELINE.md: <1e-4 max deviation


def _uniform(key, lo, hi, shape):
    return jax.random.uniform(key, shape, jnp.float32, lo, hi)


def _draw(key, group: str, shape):
    """Draw each param of a range group uniformly over its physical range."""
    out = {}
    for i, (name, (lo, hi)) in enumerate(RANGES[group].items()):
        out[name] = _uniform(jax.random.fold_in(key, i), lo, hi, shape)
    return out


def _tracks(key, bs, ch, t, level_db=-12.0):
    x = jax.random.normal(key, (bs, ch, t), jnp.float32)
    return x * 10 ** (level_db / 20.0)


@pytest.mark.smoke
def test_gain_golden():
    key = jax.random.PRNGKey(0)
    x = _tracks(key, 8, 1, 4096)
    g = _uniform(key, *RANGES["input_fader"]["gain_db"], (8,))
    got = np.asarray(ops.gain(x, SR, g))
    want = torch_ref.gain(np.asarray(x), np.asarray(g))
    assert np.abs(got - want).max() < TOL


@pytest.mark.smoke
def test_panner_golden():
    key = jax.random.PRNGKey(1)
    x = _tracks(key, 2, 8, 4096)  # (bs, tracks, t)
    pan = _uniform(key, 0.0, 1.0, (2, 8))
    got = np.asarray(ops.stereo_panner(x, SR, pan))
    want = torch_ref.stereo_panner(np.asarray(x), np.asarray(pan))
    assert np.abs(got - want).max() < TOL


@pytest.mark.smoke
def test_stereo_bus_golden():
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (2, 2, 8, 4096), jnp.float32) * 0.1
    send = _uniform(key, *RANGES["fx_bus"]["send_db"], (2, 8))
    got = np.asarray(ops.stereo_bus(x, SR, send))
    want = torch_ref.stereo_bus(np.asarray(x), np.asarray(send))
    assert np.abs(got - want).max() < TOL


def test_parametric_eq_golden_track_shape():
    """Track chain call-site: (bs*tracks, 1, T) with per-item 18 params."""
    key = jax.random.PRNGKey(3)
    bs, t = 8, 65536
    x = _tracks(key, bs, 1, t, level_db=-24.0)
    params = _draw(key, "parametric_eq", (bs,))
    got = np.asarray(ops.parametric_eq(x, SR, **params))
    want = torch_ref.parametric_eq(
        np.asarray(x), SR, **{k: np.asarray(v) for k, v in params.items()}
    )
    scale = max(1.0, np.abs(want).max())
    assert np.abs(got - want).max() / scale < TOL


def test_parametric_eq_golden_master_shape():
    """Master bus call-site: (bs, 2, T) shared params across channels."""
    key = jax.random.PRNGKey(4)
    bs, t = 2, 262144  # full reference segment length
    x = _tracks(key, bs, 2, t, level_db=-24.0)
    params = _draw(key, "parametric_eq", (bs,))
    got = np.asarray(ops.parametric_eq(x, SR, **params))
    want = torch_ref.parametric_eq(
        np.asarray(x), SR, **{k: np.asarray(v) for k, v in params.items()}
    )
    scale = max(1.0, np.abs(want).max())
    assert np.abs(got - want).max() / scale < TOL


@pytest.mark.parametrize("lookahead", [2048, 1024])
def test_compressor_golden(lookahead):
    """Track (lookahead 2048) and master (1024) compressor call sites."""
    key = jax.random.PRNGKey(5)
    bs, ch, t = 4, 1 if lookahead == 2048 else 2, 65536
    x = _tracks(key, bs, ch, t, level_db=-18.0)
    p = _draw(key, "compressor", (bs,))
    got = np.asarray(
        ops.compressor(x, SR, lookahead_samples=lookahead, smoother="fsm", **p)
    )
    want = torch_ref.compressor(
        np.asarray(x), SR, lookahead_samples=lookahead,
        **{k: np.asarray(v) for k, v in p.items()},
    )
    scale = max(1.0, np.abs(want).max())
    assert np.abs(got - want).max() / scale < TOL


def test_reverb_golden():
    """FX bus reverb (modules.py:277-283) with shared noise + filterbank."""
    from diffmst_tpu.ops.reverb import octave_band_filterbank

    key = jax.random.PRNGKey(6)
    bs, t = 2, 65536
    num_samples, taps = 65536, 1023
    x = _tracks(key, bs, 2, t, level_db=-18.0)
    kg, kd, kn = jax.random.split(jax.random.PRNGKey(7), 3)
    gains = jax.random.uniform(kg, (bs, 12), jnp.float32)
    decays = jax.random.uniform(kd, (bs, 12), jnp.float32)
    mix = jnp.array([0.7, 1.0], jnp.float32)

    band_kwargs = {f"band{i}_gain": gains[:, i] for i in range(12)}
    band_kwargs.update({f"band{i}_decay": decays[:, i] for i in range(12)})
    got = np.asarray(
        ops.noise_shaped_reverberation(
            x, SR, mix=mix, num_samples=num_samples,
            num_bandpass_taps=taps, key=kn, **band_kwargs,
        )
    )

    noise = np.asarray(
        jax.random.normal(kn, (bs, 2, 12, num_samples + taps - 1), jnp.float32)
    )
    filters = octave_band_filterbank(taps, SR)
    want = torch_ref.noise_shaped_reverberation(
        np.asarray(x), np.asarray(gains), np.asarray(decays), np.asarray(mix),
        noise, filters, num_samples=num_samples,
    )
    scale = max(1.0, np.abs(want).max())
    assert np.abs(got - want).max() / scale < TOL


def test_console_golden_full_chain():
    """End-to-end console golden: the full AdvancedMixConsole render (fsm
    smoothers, fx bus off — the shipped training configuration) matches the
    float64 torch oracle of the same chain within BASELINE tolerance."""
    from diffmst_tpu.console import AdvancedMixConsole

    console = AdvancedMixConsole(SR, comp_smoother="fsm")
    key = jax.random.PRNGKey(10)
    bs, n, t = 2, 4, 65536
    tracks = _tracks(key, bs, n, t, level_db=-36.0).reshape(bs, n, t)
    k1, k2, k3 = jax.random.split(key, 3)
    tp = jax.random.uniform(k1, (bs, n, 27), jnp.float32)
    fp = jax.random.uniform(k2, (bs, 25), jnp.float32)
    mp = jax.random.uniform(k3, (bs, 26), jnp.float32)

    out = console(tracks, tp, fp, mp, use_fx_bus=False)
    got = np.asarray(out.mix)

    to_np = lambda d: {
        g: {k: np.asarray(v) for k, v in ps.items()} for g, ps in d.items()
    }
    want = torch_ref.advanced_console_mix(
        np.asarray(tracks),
        to_np(out.track_param_dict),
        to_np(out.master_bus_param_dict),
        SR,
    )
    scale = max(1.0, np.abs(want).max())
    assert np.abs(got - want).max() / scale < TOL
