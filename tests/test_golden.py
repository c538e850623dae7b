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


# --------------------------------------------------------------------------
# Gradient parity: jax.grad vs torch autograd on the float64 oracle.
#
# The product trains *through* this DSP (/root/reference/mst/system.py:274-292),
# so forward parity alone cannot catch a subtly wrong adjoint (fsm circular-
# wrap, knee boundary, reverb envelope). Each test takes the scalar
# L = sum(op(...) * w) for a fixed random cotangent w (a linear functional —
# exposes J^T w directly, no symmetric cancellation) and compares every
# d L / d param between frameworks, normalized by max(1, |grad|_inf).
#
# Tolerances: gradients traverse the same FFT stacks twice (forward + adjoint)
# in float32 vs float64, so per-op bounds are set ~10x above deviations
# measured across seeds (see PARITY.md gradient table) and still ~100x below
# any plausible algorithmic error (a wrong coefficient or boundary term moves
# gradients by O(1)).
# --------------------------------------------------------------------------


def _gdev(got, want) -> float:
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    return float(np.abs(got - want).max() / max(1.0, np.abs(want).max()))


def _torch_leaf(v):
    t = torch.tensor(np.asarray(v), dtype=torch.float64)
    t.requires_grad_(True)
    return t


def _torch_grads(loss, leaves):
    grads = torch.autograd.grad(loss, leaves, allow_unused=True)
    return [
        np.zeros(l.shape) if g is None else g.detach().numpy()
        for g, l in zip(grads, leaves)
    ]


@pytest.mark.smoke
def test_gain_grad_golden():
    key = jax.random.PRNGKey(20)
    x = _tracks(key, 4, 1, 4096)
    g = _uniform(key, *RANGES["input_fader"]["gain_db"], (4,))
    w = jax.random.normal(jax.random.fold_in(key, 9), (4, 1, 4096), jnp.float32)

    gx, gg = jax.grad(
        lambda x_, g_: jnp.sum(ops.gain(x_, SR, g_) * w), argnums=(0, 1)
    )(x, g)

    xt, gt = _torch_leaf(x), _torch_leaf(g)
    loss = (torch_ref.gain_t(xt, gt) * torch.tensor(np.asarray(w), dtype=torch.float64)).sum()
    want_x, want_g = _torch_grads(loss, [xt, gt])
    assert _gdev(gx, want_x) < 1e-5
    assert _gdev(gg, want_g) < 1e-5


@pytest.mark.smoke
def test_panner_grad_golden():
    key = jax.random.PRNGKey(21)
    x = _tracks(key, 2, 8, 4096)
    pan = _uniform(key, 0.02, 0.98, (2, 8))
    w = jax.random.normal(jax.random.fold_in(key, 9), (2, 2, 8, 4096), jnp.float32)

    gx, gp = jax.grad(
        lambda x_, p_: jnp.sum(ops.stereo_panner(x_, SR, p_) * w), argnums=(0, 1)
    )(x, pan)

    xt, pt = _torch_leaf(x), _torch_leaf(pan)
    loss = (torch_ref.stereo_panner_t(xt, pt) * torch.tensor(np.asarray(w), dtype=torch.float64)).sum()
    want_x, want_p = _torch_grads(loss, [xt, pt])
    assert _gdev(gx, want_x) < 1e-5
    assert _gdev(gp, want_p) < 1e-4  # sqrt-law derivative: 1/sqrt factors


@pytest.mark.smoke
def test_stereo_bus_grad_golden():
    key = jax.random.PRNGKey(22)
    x = jax.random.normal(key, (2, 2, 8, 4096), jnp.float32) * 0.1
    send = _uniform(key, *RANGES["fx_bus"]["send_db"], (2, 8))
    w = jax.random.normal(jax.random.fold_in(key, 9), (2, 2, 4096), jnp.float32)

    gx, gs = jax.grad(
        lambda x_, s_: jnp.sum(ops.stereo_bus(x_, SR, s_) * w), argnums=(0, 1)
    )(x, send)

    xt, st = _torch_leaf(x), _torch_leaf(send)
    loss = (torch_ref.stereo_bus_t(xt, st) * torch.tensor(np.asarray(w), dtype=torch.float64)).sum()
    want_x, want_s = _torch_grads(loss, [xt, st])
    assert _gdev(gx, want_x) < 1e-5
    assert _gdev(gs, want_s) < 1e-5


def test_parametric_eq_grad_golden():
    """d L / d {x, all 18 band params} through the frequency-sampling EQ."""
    key = jax.random.PRNGKey(23)
    bs, t = 4, 16384
    x = _tracks(key, bs, 1, t, level_db=-24.0)
    params = _draw(key, "parametric_eq", (bs,))
    w = jax.random.normal(jax.random.fold_in(key, 9), (bs, 1, t), jnp.float32)

    gx, gp = jax.grad(
        lambda x_, p_: jnp.sum(ops.parametric_eq(x_, SR, **p_) * w),
        argnums=(0, 1),
    )(x, params)

    xt = _torch_leaf(x)
    pt = {k: _torch_leaf(v) for k, v in params.items()}
    loss = (
        torch_ref.parametric_eq_t(xt, SR, **pt)
        * torch.tensor(np.asarray(w), dtype=torch.float64)
    ).sum()
    # jax.grad returns dict pytrees in sorted-key order; compare by name
    want = _torch_grads(loss, [xt] + list(pt.values()))
    want_by_name = dict(zip(pt.keys(), want[1:]))
    assert _gdev(gx, want[0]) < 1e-3
    for name in pt:
        # worst measured: low_shelf_gain_db 1.1e-3 — low-shelf biquads have
        # poles near z=1, making H=B/A ill-conditioned in f32 near DC; the
        # same comparison in float64 JAX agrees to <6e-5 (PARITY.md)
        assert _gdev(gp[name], want_by_name[name]) < 2e-3, name


@pytest.mark.parametrize("lookahead", [2048, 1024])
def test_compressor_grad_golden(lookahead):
    """d L / d {x, all 6 comp params} through the fsm (reference-exact)
    compressor, both console lookaheads. release_ms is a dummy in the
    reference smoother — its gradient must be exactly zero on both sides."""
    key = jax.random.PRNGKey(24)
    bs, ch, t = 2, 1 if lookahead == 2048 else 2, 16384
    x = _tracks(key, bs, ch, t, level_db=-18.0)
    p = _draw(key, "compressor", (bs,))
    w = jax.random.normal(jax.random.fold_in(key, 9), (bs, ch, t), jnp.float32)

    gx, gp = jax.grad(
        lambda x_, p_: jnp.sum(
            ops.compressor(x_, SR, lookahead_samples=lookahead, smoother="fsm", **p_) * w
        ),
        argnums=(0, 1),
    )(x, p)

    xt = _torch_leaf(x)
    pt = {k: _torch_leaf(v) for k, v in p.items()}
    loss = (
        torch_ref.compressor_t(xt, SR, lookahead_samples=lookahead, **pt)
        * torch.tensor(np.asarray(w), dtype=torch.float64)
    ).sum()
    want = _torch_grads(loss, [xt] + list(pt.values()))
    want_by_name = dict(zip(pt.keys(), want[1:]))
    assert _gdev(gx, want[0]) < 1e-3
    for name in pt:
        if name == "release_ms":
            assert float(np.abs(np.asarray(gp[name])).max()) == 0.0
            assert float(np.abs(want_by_name[name]).max()) == 0.0
        else:
            assert _gdev(gp[name], want_by_name[name]) < 1e-3, name


def test_reverb_grad_golden():
    """d L / d {band gains, band decays, mix} through the noise-shaped reverb
    (shared noise + filterbank, as in the forward golden)."""
    from diffmst_tpu.ops.reverb import octave_band_filterbank

    key = jax.random.PRNGKey(25)
    bs, t = 2, 32768
    num_samples, taps = 32768, 1023
    x = _tracks(key, bs, 2, t, level_db=-18.0)
    kg, kd, kn = jax.random.split(jax.random.PRNGKey(26), 3)
    gains = jax.random.uniform(kg, (bs, 12), jnp.float32, 0.05, 0.95)
    decays = jax.random.uniform(kd, (bs, 12), jnp.float32, 0.05, 0.95)
    mix = jnp.array([0.7, 1.0], jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 9), (bs, 2, t), jnp.float32)

    def loss_fn(g_, d_, m_):
        kwargs = {f"band{i}_gain": g_[:, i] for i in range(12)}
        kwargs.update({f"band{i}_decay": d_[:, i] for i in range(12)})
        y = ops.noise_shaped_reverberation(
            x, SR, mix=m_, num_samples=num_samples,
            num_bandpass_taps=taps, key=kn, **kwargs,
        )
        return jnp.sum(y * w)

    gg, gd, gm = jax.grad(loss_fn, argnums=(0, 1, 2))(gains, decays, mix)

    noise = np.asarray(
        jax.random.normal(kn, (bs, 2, 12, num_samples + taps - 1), jnp.float32)
    )
    filters = octave_band_filterbank(taps, SR)
    gt, dt, mt = _torch_leaf(gains), _torch_leaf(decays), _torch_leaf(mix)
    y = torch_ref.noise_shaped_reverberation_t(
        torch.tensor(np.asarray(x), dtype=torch.float64), gt, dt, mt,
        torch.tensor(noise, dtype=torch.float64),
        torch.tensor(np.asarray(filters), dtype=torch.float64),
        num_samples=num_samples,
    )
    loss = (y * torch.tensor(np.asarray(w), dtype=torch.float64)).sum()
    want_g, want_d, want_m = _torch_grads(loss, [gt, dt, mt])
    assert _gdev(gg, want_g) < 2e-4
    assert _gdev(gd, want_d) < 2e-4
    assert _gdev(gm, want_m) < 2e-4


def test_console_grad_golden_full_chain():
    """End-to-end gradient golden: d L / d every denormalized console
    parameter of the full AdvancedMixConsole render (fsm smoothers, fx bus
    off — the shipped training configuration) matches torch autograd through
    the float64 oracle chain."""
    from diffmst_tpu.console import AdvancedMixConsole

    console = AdvancedMixConsole(SR, comp_smoother="fsm")
    key = jax.random.PRNGKey(27)
    bs, n, t = 2, 4, 32768
    tracks = _tracks(key, bs, n, t, level_db=-36.0).reshape(bs, n, t)
    k1, k2, k3 = jax.random.split(key, 3)
    tp = jax.random.uniform(k1, (bs, n, 27), jnp.float32)
    fp = jax.random.uniform(k2, (bs, 25), jnp.float32)
    mp_ = jax.random.uniform(k3, (bs, 26), jnp.float32)
    track_d, fx_d, master_d = console.param_dicts(tp, fp, mp_)
    w = jax.random.normal(jax.random.fold_in(key, 9), (bs, 2, t), jnp.float32)

    def loss_fn(td, md):
        _, mix = console.forward_mix_console(tracks, td, fx_d, md, use_fx_bus=False)
        return jnp.sum(mix * w)

    g_td, g_md = jax.grad(loss_fn, argnums=(0, 1))(track_d, master_d)

    to_t = lambda d: {
        grp: {k: _torch_leaf(v) for k, v in ps.items()} for grp, ps in d.items()
    }
    td_t, md_t = to_t(track_d), to_t(master_d)
    y = torch_ref.advanced_console_mix_t(
        torch.tensor(np.asarray(tracks), dtype=torch.float64), td_t, md_t, SR
    )
    loss = (y * torch.tensor(np.asarray(w), dtype=torch.float64)).sum()

    leaves, names = [], []
    for tag, d in (("track", td_t), ("master", md_t)):
        for grp, ps in d.items():
            for k, v in ps.items():
                leaves.append(v)
                names.append(f"{tag}.{grp}.{k}")
    want = _torch_grads(loss, leaves)

    got = {}
    for tag, d in (("track", g_td), ("master", g_md)):
        for grp, ps in d.items():
            for k, v in ps.items():
                got[f"{tag}.{grp}.{k}"] = v
    worst = {}
    for name, want_g in zip(names, want):
        if name == "track.fx_bus.send_db":
            # fx bus off: both frameworks must see exactly zero
            assert float(np.abs(np.asarray(got[name])).max()) == 0.0
            assert float(np.abs(want_g).max()) == 0.0
            continue
        dev = _gdev(got[name], want_g)
        worst[name] = dev
        assert dev < 5e-3, (name, dev)
    # release_ms is dummy everywhere in the chain too
    assert float(np.abs(np.asarray(got["track.compressor.release_ms"])).max()) == 0.0


def test_loss_grads_golden():
    """d MRSTFT / d pred and d AFLoss / d pred vs torch autograd — the actual
    training gradients that flow back into the console (system.py:330-352)."""
    from diffmst_tpu.losses import AudioFeatureLoss, MultiResolutionSTFTLoss
    from diffmst_tpu.losses.filterbank import barkscale_fbanks

    key = jax.random.PRNGKey(28)
    bs, t = 2, 65536
    pred = _tracks(key, bs, 2, t, level_db=-16.0)
    target = _tracks(jax.random.fold_in(key, 1), bs, 2, t, level_db=-16.0)

    mr = MultiResolutionSTFTLoss()
    g_mr = jax.grad(lambda p: mr(p, target))(pred)
    pt = _torch_leaf(pred)
    loss = torch_ref.mrstft_loss_t(pt, torch.tensor(np.asarray(target), dtype=torch.float64))
    (want_mr,) = _torch_grads(loss, [pt])
    # L1 losses: adjoint is a sum of sign() terms; a handful of near-tie bins
    # may flip sign between f32 and f64, so the bound is looser than the
    # smooth ops' but still far below the gradient's own scale.
    assert _gdev(g_mr, want_mr) < 5e-4

    af = AudioFeatureLoss()
    g_af = jax.grad(lambda p: sum(af(p, target).values()))(pred)
    fbank = np.asarray(barkscale_fbanks(32768 // 2 + 1, 20.0, 20000.0, 24, 44100)).T
    pt2 = _torch_leaf(pred)
    loss2 = torch_ref.audio_feature_loss_t(
        pt2, torch.tensor(np.asarray(target), dtype=torch.float64), fbank
    )
    (want_af,) = _torch_grads(loss2, [pt2])
    assert _gdev(g_af, want_af) < 5e-4
