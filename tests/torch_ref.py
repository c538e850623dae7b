"""Independent PyTorch/float64 reference implementations of the six console ops.

Golden-parity oracle for tests/test_golden.py. The upstream DSP dependency
(dasp-pytorch==0.0.1, /root/reference/setup.py:35) is not installable in this
environment (no network egress), so op-for-op parity is checked against this
independent reimplementation of the documented algorithms instead:

  * everything is computed in float64 with torch's FFT stack — a different
    backend and precision than the JAX float32 ops, so agreement within the
    BASELINE tolerance (<1e-4 max deviation) is meaningful evidence that the
    JAX implementations compute the intended math;
  * the algorithms follow the behavioral contracts recorded in SURVEY.md and
    the reference call sites (/root/reference/mst/modules.py:230-314):
    RBJ-cookbook biquads applied by frequency sampling, the Giannoulis
    feed-forward compressor with a one-pole (attack-coefficient) smoother
    applied circularly via FFT, the -4.5 dB compromise pan law, dB send bus,
    and the 12-band noise-shaped reverb (shared noise/filterbank inputs).

Each op has a differentiable tensor core (``*_t``) used by the gradient-parity
goldens (torch autograd vs jax.grad — the product trains *through* this DSP,
/root/reference/mst/system.py:274-292) and a numpy wrapper with the original
public signature. The cores are torch-only (no JAX imports).
"""

from __future__ import annotations

import math

import numpy as np
import torch


def _t(x) -> torch.Tensor:
    if isinstance(x, torch.Tensor):
        return x.to(torch.float64)
    return torch.as_tensor(np.asarray(x), dtype=torch.float64)


def gain_t(x: torch.Tensor, gain_db: torch.Tensor) -> torch.Tensor:
    """(B, C, T) * dB gain (B,) or (B, C)."""
    x, g = _t(x), _t(gain_db)
    b = x.shape[0]
    lin = torch.pow(10.0, g.reshape(b, -1) / 20.0)
    return x * lin[:, :, None]


def gain(x, gain_db):
    return gain_t(_t(x), _t(gain_db)).numpy()


def stereo_panner_t(x: torch.Tensor, pan: torch.Tensor) -> torch.Tensor:
    """(B, N, T), pan (B, N) in [0,1] -> (B, 2, N, T); -4.5 dB compromise law."""
    x, p = _t(x), _t(pan)
    theta = p * (math.pi / 2.0)
    left = torch.sqrt((math.pi / 2.0 - theta) * (2.0 / math.pi) * torch.cos(theta))
    right = torch.sqrt(theta * (2.0 / math.pi) * torch.sin(theta))
    gains = torch.stack([left, right], dim=1)  # (B, 2, N)
    return x[:, None, :, :] * gains[:, :, :, None]


def stereo_panner(x, pan):
    return stereo_panner_t(_t(x), _t(pan)).numpy()


def stereo_bus_t(x: torch.Tensor, send_db: torch.Tensor) -> torch.Tensor:
    """(B, 2, N, T), send (B, N) dB -> (B, 2, T)."""
    x, s = _t(x), _t(send_db)
    lin = torch.pow(10.0, s / 20.0)
    return torch.einsum("bcnt,bn->bct", x, lin)


def stereo_bus(x, send_db):
    return stereo_bus_t(_t(x), _t(send_db)).numpy()


def _rbj_biquad(gain_db, f0, q, sr, kind):
    A = torch.pow(10.0, _t(gain_db) / 40.0)
    w0 = 2.0 * math.pi * (_t(f0) / sr)
    cw, alpha, sA = torch.cos(w0), torch.sin(w0) / (2.0 * _t(q)), torch.sqrt(A)
    if kind == "peaking":
        b = [1.0 + alpha * A, -2.0 * cw, 1.0 - alpha * A]
        a = [1.0 + alpha / A, -2.0 * cw, 1.0 - alpha / A]
    elif kind == "low_shelf":
        b = [
            A * ((A + 1.0) - (A - 1.0) * cw + 2.0 * sA * alpha),
            2.0 * A * ((A - 1.0) - (A + 1.0) * cw),
            A * ((A + 1.0) - (A - 1.0) * cw - 2.0 * sA * alpha),
        ]
        a = [
            (A + 1.0) + (A - 1.0) * cw + 2.0 * sA * alpha,
            -2.0 * ((A - 1.0) + (A + 1.0) * cw),
            (A + 1.0) + (A - 1.0) * cw - 2.0 * sA * alpha,
        ]
    elif kind == "high_shelf":
        b = [
            A * ((A + 1.0) + (A - 1.0) * cw + 2.0 * sA * alpha),
            -2.0 * A * ((A - 1.0) + (A + 1.0) * cw),
            A * ((A + 1.0) + (A - 1.0) * cw - 2.0 * sA * alpha),
        ]
        a = [
            (A + 1.0) - (A - 1.0) * cw + 2.0 * sA * alpha,
            2.0 * ((A - 1.0) - (A + 1.0) * cw),
            (A + 1.0) - (A - 1.0) * cw - 2.0 * sA * alpha,
        ]
    else:
        raise ValueError(kind)
    b = torch.stack(b, dim=-1) / a[0][..., None]
    a = torch.stack(a, dim=-1) / a[0][..., None]
    return b, a


_EQ_BANDS = [
    ("low_shelf", "low_shelf"),
    ("band0", "peaking"),
    ("band1", "peaking"),
    ("band2", "peaking"),
    ("band3", "peaking"),
    ("high_shelf", "high_shelf"),
]


def parametric_eq_t(x: torch.Tensor, sample_rate, **params) -> torch.Tensor:
    """6-band EQ via frequency sampling. x (B, C, T); 18 params of shape (B,)."""
    x = _t(x)
    n = x.shape[-1]
    H = torch.ones(x.shape[0], n // 2 + 1, dtype=torch.complex128)
    for prefix, kind in _EQ_BANDS:
        b, a = _rbj_biquad(
            params[f"{prefix}_gain_db"],
            params[f"{prefix}_cutoff_freq"],
            params[f"{prefix}_q_factor"],
            sample_rate,
            kind,
        )
        B = torch.fft.rfft(b, n=n, dim=-1)
        A = torch.fft.rfft(a, n=n, dim=-1)
        H = H * (B / A)
    X = torch.fft.rfft(x, n=n, dim=-1)
    return torch.fft.irfft(X * H[:, None, :], n=n, dim=-1)


def parametric_eq(x, sample_rate, **params):
    return parametric_eq_t(
        _t(x), sample_rate, **{k: _t(v) for k, v in params.items()}
    ).numpy()


def compressor_t(
    x: torch.Tensor,
    sample_rate,
    threshold_db,
    ratio,
    attack_ms,
    release_ms,
    knee_db,
    makeup_gain_db,
    lookahead_samples=0,
    eps=1e-8,
) -> torch.Tensor:
    """Feed-forward compressor: dB detector, quadratic soft knee, one-pole
    (attack) smoother applied circularly via FFT, lookahead roll, makeup."""
    x = _t(x)
    bs, chs, T = x.shape

    def bc(p):
        return _t(p).reshape(bs, -1).expand(bs, chs).reshape(bs * chs)

    flat = x.reshape(bs * chs, T)
    x_db = 20.0 * torch.log10(torch.clamp(torch.abs(flat), min=eps))

    thr, rt, kn = bc(threshold_db)[:, None], bc(ratio)[:, None], bc(knee_db)[:, None]
    over = x_db - thr
    kn = torch.clamp(kn, min=1e-3)
    in_knee = (1.0 / rt - 1.0) * torch.square(over + kn / 2.0) / (2.0 * kn)
    above = (1.0 / rt - 1.0) * over
    g_c = torch.where(
        over <= -kn / 2.0, torch.zeros_like(over), torch.where(over >= kn / 2.0, above, in_knee)
    )

    at = sample_rate * (bc(attack_ms) / 1e3)
    alpha = torch.exp(-math.log(9.0) / torch.clamp(at, min=1.0))[:, None]
    k = torch.fft.rfftfreq(T, d=1.0)
    z_inv = torch.exp(-2j * math.pi * k)[None, :]
    Hs = (1.0 - alpha) / (1.0 - alpha * z_inv)
    g_s = torch.fft.irfft(torch.fft.rfft(g_c, dim=-1) * Hs, n=T, dim=-1)

    lin = torch.pow(10.0, (g_s + bc(makeup_gain_db)[:, None]) / 20.0)
    if lookahead_samples > 0:
        flat = torch.roll(flat, lookahead_samples, dims=-1)
    return (flat * lin).reshape(bs, chs, T)


def compressor(x, sample_rate, lookahead_samples=0, eps=1e-8, **params):
    return compressor_t(
        _t(x), sample_rate, lookahead_samples=lookahead_samples, eps=eps,
        **{k: _t(v) for k, v in params.items()},
    ).numpy()


def noise_shaped_reverberation_t(
    x, band_gains, band_decays, mix, noise, filters, num_samples=65536
) -> torch.Tensor:
    """12-band noise-shaped reverb given SHARED noise + filterbank inputs.

    x (B, 2, T); band_gains/decays (B, 12); mix (B,);
    noise (B, 2, 12, num_samples + taps - 1); filters (12, taps).
    """
    x, g, d, m = _t(x), _t(band_gains), _t(band_decays), _t(mix)
    noise, filt = _t(noise), _t(filters)
    taps = filt.shape[-1]

    def conv_full(sig, ker):
        L = sig.shape[-1] + ker.shape[-1] - 1
        return torch.fft.irfft(
            torch.fft.rfft(sig, n=L, dim=-1) * torch.fft.rfft(ker, n=L, dim=-1),
            n=L,
            dim=-1,
        )

    # 'valid' band filtering: fully-overlapped region starting at lag taps-1
    full = conv_full(noise, filt[None, None, :, :])
    band_noise = full[..., taps - 1 : taps - 1 + num_samples]

    t = torch.linspace(0.0, 1.0, num_samples, dtype=torch.float64)
    env = torch.exp(-(d * 10.0 + 1.0)[..., None] * t[None, None, :])
    shaped = band_noise * (env * g[..., None])[:, None, :, :]
    ir = shaped.mean(dim=2)  # (B, 2, num_samples)

    wet_full = conv_full(x, ir)
    wet = wet_full[..., : x.shape[-1]]
    mm = m.reshape(-1, 1, 1)
    return (1.0 - mm) * x + mm * wet


def noise_shaped_reverberation(
    x, band_gains, band_decays, mix, noise, filters, num_samples=65536
):
    return noise_shaped_reverberation_t(
        _t(x), _t(band_gains), _t(band_decays), _t(mix), _t(noise), _t(filters),
        num_samples=num_samples,
    ).numpy()


def advanced_console_mix_t(
    tracks, track_d, master_d, sample_rate, track_lookahead=2048,
    master_lookahead=1024,
) -> torch.Tensor:
    """Float64 differentiable oracle of the AdvancedMixConsole chain (fx bus
    off): per-track [fader -> 6-band EQ -> compressor] -> -4.5 dB pan ->
    stereo sum -> master [fader -> EQ -> compressor] -> output fader.
    (Chain order: /root/reference/mst/modules.py:186-314.)

    tracks: (bs, n, T) tensor; track_d/master_d: denormalized parameter dicts
    of torch tensors shaped (bs, n) / (bs,).
    """
    tracks = _t(tracks)
    bs, n, T = tracks.shape
    x = tracks.reshape(bs * n, 1, T)

    def flat(p):
        return _t(p).reshape(bs * n)

    x = gain_t(x, flat(track_d["input_fader"]["gain_db"]))
    x = parametric_eq_t(
        x, sample_rate,
        **{k: flat(v) for k, v in track_d["parametric_eq"].items()},
    )
    x = compressor_t(
        x, sample_rate, lookahead_samples=track_lookahead,
        **{k: flat(v) for k, v in track_d["compressor"].items()},
    )
    x = x.reshape(bs, n, T)
    stems = stereo_panner_t(x, _t(track_d["stereo_panner"]["pan"]))
    master = stems.sum(dim=2)  # (bs, 2, T)

    master = gain_t(master, _t(master_d["input_fader"]["gain_db"]))
    master = parametric_eq_t(
        master, sample_rate,
        **{k: _t(v) for k, v in master_d["parametric_eq"].items()},
    )
    master = compressor_t(
        master, sample_rate, lookahead_samples=master_lookahead,
        **{k: _t(v) for k, v in master_d["compressor"].items()},
    )
    return gain_t(master, _t(master_d["output_fader"]["gain_db"]))


def advanced_console_mix(
    tracks, track_d, master_d, sample_rate, track_lookahead=2048,
    master_lookahead=1024,
):
    to_t = lambda d: {g: {k: _t(v) for k, v in ps.items()} for g, ps in d.items()}
    return advanced_console_mix_t(
        _t(tracks), to_t(track_d), to_t(master_d), sample_rate,
        track_lookahead=track_lookahead, master_lookahead=master_lookahead,
    ).numpy()


# ---------------------------------------------------------------- losses


def mrstft_loss_t(
    pred: torch.Tensor,
    target: torch.Tensor,
    fft_sizes=(512, 2048, 8192),
    hop_sizes=(256, 1024, 4096),
    eps: float = 1e-8,
) -> torch.Tensor:
    """auraloss MultiResolutionSTFTLoss (w_sc=0, w_lin=w_log=1) in float64.

    Matches the construction at /root/reference/mst/system.py:61-69; center
    padding + periodic Hann, the torch.stft defaults the reference inherits.
    """
    pred = _t(pred).reshape(-1, pred.shape[-1])
    target = _t(target).reshape(-1, target.shape[-1])
    total = None
    for n_fft, hop in zip(fft_sizes, hop_sizes):
        w = torch.hann_window(n_fft, dtype=torch.float64)
        P = torch.stft(pred, n_fft, hop, window=w, return_complex=True)
        T = torch.stft(target, n_fft, hop, window=w, return_complex=True)
        Pm = torch.sqrt(torch.clamp(P.abs() ** 2, min=eps))
        Tm = torch.sqrt(torch.clamp(T.abs() ** 2, min=eps))
        term = torch.nn.functional.l1_loss(torch.log(Tm), torch.log(Pm))
        term = term + torch.nn.functional.l1_loss(Tm, Pm)
        total = term if total is None else total + term
    return total / len(fft_sizes)


def _bark_t(x: torch.Tensor, fbank: torch.Tensor, fft_size: int) -> torch.Tensor:
    """Log Bark-band spectrum, mid-side mode (loss.py:62-124)."""
    signals = [x[:, 0, :] + x[:, 1, :], x[:, 0, :] - x[:, 1, :]]
    outs = []
    w = torch.hann_window(fft_size, dtype=torch.float64)
    for s in signals:
        X = torch.stft(s, fft_size, fft_size // 4, window=w, return_complex=True)
        Xm = X.abs().mean(dim=-1, keepdim=True)  # (bs, bins, 1)
        B = torch.matmul(fbank[None], Xm)  # (bs, n_barks, 1)
        outs.append(torch.log(B + 1e-8))
    return torch.cat(outs, dim=-1)


def audio_feature_loss_t(
    pred: torch.Tensor,
    target: torch.Tensor,
    fbank,
    weights=(0.1, 0.001, 1.0, 1.0, 0.1),
    fft_size: int = 32768,
) -> torch.Tensor:
    """AFLoss (loss.py:198-260) in float64: weighted MSE over RMS, crest,
    stereo width, stereo imbalance, and the Bark spectrum; the Bark
    filterbank matrix is passed in (its construction is data, not a
    differentiable path)."""
    pred, target, fbank = _t(pred), _t(target), _t(fbank)

    def rms(x):
        return torch.sqrt(torch.clamp(torch.mean(x**2, dim=-1), min=1e-8))

    def crest(x):
        num = torch.max(torch.abs(x), dim=-1).values
        den = torch.clamp(rms(x), min=1e-8)
        return 20.0 * torch.log10(torch.clamp(num / den, min=1e-8))

    def width(x):
        se = torch.mean((x[:, 0] + x[:, 1]) ** 2, dim=-1)
        de = torch.mean((x[:, 0] - x[:, 1]) ** 2, dim=-1)
        return de / torch.clamp(se, min=1e-8)

    def imbalance(x):
        l = torch.mean(x[:, 0] ** 2, dim=-1)
        r = torch.mean(x[:, 1] ** 2, dim=-1)
        return (r - l) / torch.clamp(r + l, min=1e-8)

    feats = [rms, crest, width, imbalance, lambda x: _bark_t(x, fbank, fft_size)]
    total = None
    for fn, w in zip(feats, weights):
        term = w * torch.mean((fn(pred) - fn(target)) ** 2)
        total = term if total is None else total + term
    return total
