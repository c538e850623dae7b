"""Full-song inference: analysis windowing + Hann overlap-add rendering.

Rebuild of ``run_diffmst`` (/root/reference/mst/utils.py:32-173):
  1. crop a 262,144-sample analysis window from tracks and reference;
  2. gate tracks below -80 LUFS, loudness-normalize the rest to -48
     (utils.py:85-101);
  3. ONE model call on the analysis windows predicts console parameters;
  4. render the full song with a sliding window (hop = analysis_len/2),
     Hann-weighted overlap-add, the first window's first half forced to 1
     (utils.py:123-166).

The window loop renders every window in one batched, jitted console call
(windows stacked on the batch axis) instead of the reference's Python loop —
the console is shape-static, so all windows share one compiled program.

Device-side rendering (round 2): ``run_diffmst`` no longer loops on the
host at all. One cached jitted pipeline per (console, geometry) takes the
full padded track tensor + predicted params as ARGUMENTS and, entirely on
device: extracts each window group with ``lax.dynamic_slice`` inside a
``lax.map`` (so window count scales without growing the program), renders
the groups through the console, Hann-weights, and overlap-adds via a
reshape/shift (hop = window/2 means window i's second half lands exactly on
window i+1's first half — no scatter needed). The song round-trips
host<->device ONCE; the round-1 path paid one tunnel round trip per window
group plus host NumPy assembly loops (the 7.3x realtime headline).

The callable-based host renderers (``overlap_add_render``/
``overlap_save_render``) remain for AOT-exported graphs (utils/export.py)
and scripts that bring their own render function.
"""

from __future__ import annotations

import collections
import functools
import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffmst_tpu.ops.loudness import integrated_loudness
from diffmst_tpu.ops.stft import hann_window

__all__ = ["run_diffmst", "overlap_add_render", "overlap_save_render"]


def overlap_add_render(
    render_window: Callable[[jnp.ndarray], jnp.ndarray],
    tracks: np.ndarray,
    window_len: int,
    hop: Optional[int] = None,
    render_bs: Optional[int] = None,
) -> np.ndarray:
    """Hann-OLA full-length render (host assembly; see module docstring).

    Args:
      render_window: (bs, num_tracks, window_len) -> (bs, 2, window_len)
        batched console render.
      tracks: (1, num_tracks, total_len) normalized stems (host array).
      window_len / hop: OLA geometry (reference: 262144 / 131072).
      render_bs: fixed window-batch size per render call; None = the
        ``DIFFMST_RENDER_BS`` default. AOT-exported render functions have a
        static batch shape — pass their manifest's ``render_bs``.

    Returns:
      (1, 2, total_len) rendered mix (host array).
    """
    if hop is None:
        hop = window_len // 2
    total = tracks.shape[-1]
    starts = list(range(0, total, hop))

    # gather all (zero-padded) windows -> fixed-size batched renders
    wins = []
    for s in starts:
        w = tracks[0, :, s : s + window_len]
        if w.shape[-1] < window_len:
            w = np.pad(w, ((0, 0), (0, window_len - w.shape[-1])))
        wins.append(w)
    rendered = _render_batched(render_window, np.stack(wins), render_bs)

    win = hann_window(window_len).astype(np.float32)
    out = np.zeros((1, 2, total + window_len), np.float32)
    for i, s in enumerate(starts):
        w = win if i > 0 else np.concatenate(
            [np.ones(window_len // 2, np.float32), win[window_len // 2 :]]
        )
        out[0, :, s : s + window_len] += rendered[i] * w
    return out[..., :total]


# Windows per batched render call (host path) / per lax.map group (device
# path). The device pipeline dispatches ONCE regardless of this value, so it
# only trades compiled-program size against on-device loop trip count; 4
# keeps the program near the proven headline-bench graph size.
_RENDER_BS = int(os.environ.get("DIFFMST_RENDER_BS", "4"))

# value = (console, jitted fn): the console reference keeps an id()-keyed
# entry alive so a garbage-collected console's recycled id can never alias a
# stale compiled render (advisor round-1 finding).
_RENDER_CACHE: dict = {}


def _console_cache_key(mix_console, *extras):
    """Hash key for a console; unhashable consoles fall back to id()."""
    try:
        key = (mix_console, *extras)
        hash(key)
        return key
    except TypeError:
        return (id(mix_console), *extras)


def _cached_jit(mix_console, extras, build):
    """One jitted fn per (console, *extras), params as call arguments."""
    cache_key = _console_cache_key(mix_console, *extras)
    hit = _RENDER_CACHE.get(cache_key)
    if hit is not None and hit[0] is mix_console:
        return hit[1]
    fn = build()
    _RENDER_CACHE[cache_key] = (mix_console, fn)
    return fn


def _cached_render(mix_console, use_fx_bus: bool):
    """One jitted batched console render per (console, use_fx_bus)."""

    def build():
        @jax.jit
        def fn(wins, tp, fp, mp, key):
            n = wins.shape[0]
            out = mix_console(
                wins,
                jnp.tile(tp, (n, 1, 1)),
                jnp.tile(fp, (n, 1)),
                jnp.tile(mp, (n, 1)),
                use_fx_bus=use_fx_bus,
                key=key,
            )
            return out.mix

        return fn

    return _cached_jit(mix_console, ("render", use_fx_bus), build)


def _render_batched(
    render_window: Callable, wins: np.ndarray, render_bs: Optional[int] = None
) -> np.ndarray:
    """Render windows in fixed-size groups of ``render_bs`` (host loop).

    Song lengths vary, so the window count varies per song; batching in a
    fixed group size (zero-padding the last group) keeps ONE compiled render
    program across every song and section of an eval run instead of one
    30-200 s TPU compile per distinct window count.
    """
    bs = _RENDER_BS if render_bs is None else render_bs
    n = wins.shape[0]
    outs = []
    for i in range(0, n, bs):
        group = wins[i : i + bs]
        pad = bs - group.shape[0]
        if pad:
            group = np.concatenate(
                [group, np.zeros((pad,) + group.shape[1:], group.dtype)]
            )
        out = np.asarray(render_window(jnp.asarray(group)))
        outs.append(out[: bs - pad])
    return np.concatenate(outs, axis=0)


# Device-resident raw track tensors, LRU over the last few songs. Keyed by
# the host array's identity (the source array is held in the value as a
# keepalive, so a recycled id can never alias) + the padded geometry. Through
# the dev tunnel the one-time upload is the dominant inference cost
# (~5 s for a 60 s 8-track song, logs/inference_breakdown_tpu.json); eval
# runs re-render the same stems dozens of times.
_TRACK_DEV_CACHE: collections.OrderedDict = collections.OrderedDict()
_TRACK_DEV_CACHE_MAX = int(os.environ.get("DIFFMST_TRACK_CACHE_SONGS", "4"))


def _device_tracks(tracks: np.ndarray, pad_total: int, offset: int):
    """(1, n, total) host stems -> cached (n, pad_total) device array with
    the song starting at ``offset`` (zeros elsewhere)."""
    cache_key = (id(tracks), tracks.shape, pad_total, offset)
    hit = _TRACK_DEV_CACHE.get(cache_key)
    if hit is not None and hit[0] is tracks:
        _TRACK_DEV_CACHE.move_to_end(cache_key)
        return hit[1]
    n_all, total = tracks.shape[1], tracks.shape[-1]
    padded = np.zeros((n_all, pad_total), np.float32)
    padded[:, offset : offset + total] = tracks[0]
    dev = jnp.asarray(padded)
    _TRACK_DEV_CACHE[cache_key] = (tracks, dev)
    while len(_TRACK_DEV_CACHE) > _TRACK_DEV_CACHE_MAX:
        _TRACK_DEV_CACHE.popitem(last=False)
    return dev


@functools.lru_cache(maxsize=8)
def _pcm16_trim(total: int):
    """Jitted (2, padded_len) float mix -> (2, total) int16 PCM.

    Serving emits 16-bit WAV; quantizing ON DEVICE cuts the device->host
    transfer 4x vs float32. That transfer is pure PCIe overhead on a TPU
    VM (~10 ms for a 60 s song) but the dominant steady-state cost through
    a remote tunnel (logs/inference_breakdown_tpu.json), so the saving is
    what a remote-serving deployment — not just this bench — experiences.
    Quantization: scale by full-scale 32767, ``jnp.round`` (round-half-to-
    even), clip to the int16 range. Pinned by test_run_diffmst_pcm16_output;
    writers differ in their float->PCM_16 mapping (libsndfile scales by
    32768), so byte-parity with any particular writer is not claimed.
    """

    @jax.jit
    def fn(mix):
        x = jnp.round(mix[:, :total] * 32767.0)
        return jnp.clip(x, -32768.0, 32767.0).astype(jnp.int16)

    return fn


@functools.lru_cache(maxsize=32)
def _analysis_slicer(n_all: int, n_kept: int, analysis_len: int):
    """Jitted (tracks_dev, kept_idx, gains_kept, start) -> (1, n_kept, L).

    Cuts the model's analysis windows out of the device-cached raw track
    tensor (gather the kept rows, apply their normalization gains) so the
    per-call host->device traffic is a few hundred bytes instead of the
    8 MB of analysis audio.
    """

    @jax.jit
    def fn(tracks_dev, kept_idx, gains_kept, start):
        seg = jax.lax.dynamic_slice(
            tracks_dev, (0, start), (n_all, analysis_len)
        )
        return (seg[kept_idx] * gains_kept[:, None])[None]

    return fn


def _device_ola(mix_console, use_fx_bus, n_windows, window_len, num_tracks,
                group_bs):
    """Jitted full-song Hann-OLA render, one device dispatch.

    Returns fn(tracks_padded, gains, tp, fp, mp, key) -> (2, (n+1)*hop)
    where tracks_padded is (num_tracks, (n_windows+1)*hop) RAW stems and
    ``gains`` (num_tracks,) carries the per-track loudness normalization —
    0.0 for LUFS-gated tracks, whose rows then render to exact silence
    through the console's multiplicative chain. Applying gains on device
    lets the (large) track tensor live in an HBM cache across calls while
    the (tiny) gains change per call. Windows start at i*hop (reference
    geometry, mst/utils.py:123-166). The combine relies on
    hop == window_len//2: window i's Hann-weighted second half overlaps
    exactly window i+1's first half, so overlap-add is a shift + add of the
    half-window chunks — no scatter.
    """
    hop = window_len // 2
    n_groups = n_windows // group_bs

    def build():
        @jax.jit
        def fn(tracks_padded, gains, tp, fp, mp, key):
            tpg = jnp.tile(tp, (group_bs, 1, 1))
            fpg = jnp.tile(fp, (group_bs, 1))
            mpg = jnp.tile(mp, (group_bs, 1))
            seg_len = (group_bs - 1) * hop + window_len
            local = jnp.arange(group_bs)[:, None] * hop + jnp.arange(window_len)

            def render_group(i):
                seg = jax.lax.dynamic_slice(
                    tracks_padded, (0, i * group_bs * hop),
                    (num_tracks, seg_len),
                ) * gains[:, None]
                wins = seg[:, local].transpose(1, 0, 2)  # (bs, T, L)
                out = mix_console(
                    wins, tpg, fpg, mpg, use_fx_bus=use_fx_bus, key=key
                )
                return out.mix

            rendered = jax.lax.map(render_group, jnp.arange(n_groups))
            rendered = rendered.reshape(n_windows, 2, window_len)

            win = jnp.asarray(hann_window(window_len), jnp.float32)
            w0 = jnp.concatenate(
                [jnp.ones(hop, jnp.float32), win[hop:]]
            )  # first window's first half forced to 1 (utils.py:151)
            weights = jnp.concatenate(
                [w0[None], jnp.broadcast_to(win, (n_windows - 1, window_len))]
            ) if n_windows > 1 else w0[None]
            weighted = rendered * weights[:, None, :]

            firsts = weighted[:, :, :hop]  # (n, 2, hop)
            seconds = weighted[:, :, hop:]
            shifted = jnp.concatenate(
                [jnp.zeros((1, 2, hop), weighted.dtype), seconds[:-1]], axis=0
            )
            chunks = firsts + shifted  # chunk i covers [i*hop, (i+1)*hop)
            body = chunks.transpose(1, 0, 2).reshape(2, n_windows * hop)
            return jnp.concatenate([body, seconds[-1]], axis=-1)

        return fn

    return _cached_jit(
        mix_console,
        ("ola", use_fx_bus, n_windows, window_len, num_tracks, group_bs),
        build,
    )


def _device_overlap_save(mix_console, use_fx_bus, n_blocks, block_len,
                         context_len, num_tracks, group_bs):
    """Jitted full-song overlap-save render, one device dispatch.

    Returns fn(tracks_padded, gains, tp, fp, mp, key) -> (2, n_blocks*block)
    where tracks_padded is (num_tracks, context_len + n_blocks*block_len)
    RAW stems (context_len zeros prepended by the caller) and ``gains`` is
    the per-track normalization (0 = gated; see _device_ola). Each block
    renders with ``context_len`` samples of true left context and only its
    [context_len:] slice is kept — seam-free (see overlap_save_render).
    """
    win_len = context_len + block_len
    n_groups = n_blocks // group_bs

    def build():
        @jax.jit
        def fn(tracks_padded, gains, tp, fp, mp, key):
            tpg = jnp.tile(tp, (group_bs, 1, 1))
            fpg = jnp.tile(fp, (group_bs, 1))
            mpg = jnp.tile(mp, (group_bs, 1))
            seg_len = (group_bs - 1) * block_len + win_len
            local = (
                jnp.arange(group_bs)[:, None] * block_len
                + jnp.arange(win_len)
            )

            def render_group(i):
                seg = jax.lax.dynamic_slice(
                    tracks_padded, (0, i * group_bs * block_len),
                    (num_tracks, seg_len),
                ) * gains[:, None]
                wins = seg[:, local].transpose(1, 0, 2)
                out = mix_console(
                    wins, tpg, fpg, mpg, use_fx_bus=use_fx_bus, key=key
                )
                return out.mix[:, :, context_len:]

            rendered = jax.lax.map(render_group, jnp.arange(n_groups))
            return rendered.reshape(n_blocks, 2, block_len).transpose(
                1, 0, 2
            ).reshape(2, n_blocks * block_len)

        return fn

    return _cached_jit(
        mix_console,
        ("ols", use_fx_bus, n_blocks, block_len, context_len, num_tracks,
         group_bs),
        build,
    )


def overlap_save_render(
    render_window: Callable[[jnp.ndarray], jnp.ndarray],
    tracks: np.ndarray,
    block_len: int,
    context_len: int = 65536,
    render_bs: Optional[int] = None,
) -> np.ndarray:
    """Streaming (overlap-save) full-length render: no cross-fade seams.

    Hann OLA (the reference method, utils.py:123-166) cross-fades two
    *different* renders whose compressor envelopes and EQ boundary states
    disagree. Here every output block is cut from a render primed with
    ``context_len`` samples of true left context — the compressor ballistics
    (attack/release <= 250 ms ~ 11k samples) and the EQ's effective impulse
    response converge inside the context, so consecutive blocks agree with a
    single full-length render (asserted in tests) instead of being blended.
    Compute factor (block+context)/block vs OLA's fixed 2x.

    Args:
      render_window: (bs, num_tracks, context+block) -> (bs, 2, context+block).
      tracks: (1, num_tracks, total_len) normalized stems (host array).
      block_len: output samples per block (e.g. 131072).
      context_len: warm-up samples prepended to each block.

    Returns:
      (1, 2, total_len) rendered mix (host array).
    """
    total = tracks.shape[-1]
    win_len = context_len + block_len
    starts = list(range(0, total, block_len))

    wins = []
    for s in starts:
        lo = s - context_len
        w = tracks[0, :, max(lo, 0) : s + block_len]
        pad_l = max(0, -lo)
        pad_r = win_len - w.shape[-1] - pad_l
        if pad_l or pad_r:
            w = np.pad(w, ((0, 0), (pad_l, pad_r)))
        wins.append(w)
    rendered = _render_batched(render_window, np.stack(wins), render_bs)

    out = np.zeros((1, 2, len(starts) * block_len), np.float32)
    for i, s in enumerate(starts):
        out[0, :, s : s + block_len] = rendered[i][:, context_len:]
    return out[..., :total]


def run_diffmst(
    tracks: np.ndarray,
    ref: np.ndarray,
    model_apply: Callable,
    mix_console,
    track_start_idx: int = 0,
    ref_start_idx: int = 0,
    analysis_len: int = 262144,
    sample_rate: float = 44100.0,
    use_fx_bus: bool = False,
    key: Optional[jax.Array] = None,
    render_mode: str = "ola",
    return_device: bool = False,
    output_format: str = "float32",
) -> Tuple[np.ndarray, dict, dict, dict]:
    """Full-song mix style transfer.

    Args:
      tracks: (1, num_tracks, total_len) raw mono stems (host array).
      ref: (1, 2, ref_len) stereo reference mix.
      model_apply: (tracks, ref_mix) -> (track_params, fx_params, master_params);
        bind parameters first, e.g.
        ``lambda t, r: model.apply(variables, t, r)``.
      mix_console: console instance.
      render_mode: "ola" — the reference's Hann overlap-add (utils.py:123-166);
        "streaming" — seam-free overlap-save block rendering (see
        overlap_save_render), recommended with the causal ("auto"/"scan")
        compressor smoother.
      return_device: keep the rendered mix on device (a jnp array) instead
        of transferring it to host — for pipelines that consume the mix on
        device (loss/feature evaluation); the device->host copy of a full
        song is the largest steady-state cost through a remote tunnel.
      output_format: "float32" (default) returns the float mix like the
        reference; "pcm16" quantizes to int16 ON DEVICE (full-scale 32767,
        round-half-to-even — see _pcm16_trim) before the host transfer — 4x less
        device->host traffic for serving paths that write 16-bit audio
        anyway. Ignored when ``return_device`` is set.

    Returns:
      (pred_mix (1, 2, total_len), track_param_dict, fx_param_dict,
       master_param_dict) — denormalized dicts like the reference.
    """
    if output_format not in ("float32", "pcm16"):
        raise ValueError(f"bad output_format {output_format!r}")
    total = tracks.shape[-1]
    n_all = tracks.shape[1]
    if total >= analysis_len:
        analysis_tracks = tracks[..., track_start_idx : track_start_idx + analysis_len]
    else:
        analysis_tracks = tracks
    if ref.shape[-1] >= analysis_len:
        analysis_ref = ref[..., ref_start_idx : ref_start_idx + analysis_len]
    else:
        analysis_ref = ref

    # per-track LUFS gate (< -80 skip) + normalize to -48 (utils.py:85-101);
    # gated tracks get gain 0.0 — they stay in the (cached, device-resident)
    # track tensor but render to exact silence through the console's
    # multiplicative chain
    keep, norm_analysis = [], []
    gains = np.zeros(n_all, np.float32)
    for i in range(n_all):
        lufs = integrated_loudness(np.asarray(analysis_tracks[0, i]), sample_rate)
        if not np.isfinite(lufs) or lufs < -80.0:
            continue
        g = np.float32(10.0 ** ((-48.0 - lufs) / 20.0))
        keep.append(i)
        gains[i] = g
        norm_analysis.append(analysis_tracks[0, i] * g)
    if not keep:
        raise ValueError("all tracks gated out (< -80 LUFS)")
    # Device-side render: the jitted pipeline is cached per (console,
    # geometry) with the predicted params as ARGUMENTS — a fresh @jax.jit
    # closure per run_diffmst call would recompile the whole console render
    # for every song (a multi-minute TPU compile each) even though only the
    # small parameter vectors change. The window count is rounded up to a
    # multiple of the group size (extra windows are silence, rendered to
    # silence, trimmed below) so every song of similar length reuses one
    # compiled program per bucket. The RAW track tensor is uploaded once
    # and cached on device keyed by the array's identity: eval runs
    # (scripts/eval_all_combo.py, the reference's primary inference entry)
    # call run_diffmst for every (track section x ref section) combination
    # of the SAME stems, so only the parameter vectors travel per call.
    group_bs = max(1, _RENDER_BS)
    if render_mode == "streaming":
        block_len = analysis_len // 2
        context_len = analysis_len // 4
        n_blocks = -(-total // block_len)
        n_blocks = -(-n_blocks // group_bs) * group_bs
        pad_total = context_len + n_blocks * block_len
        offset = context_len
        tracks_dev = _device_tracks(tracks, pad_total, offset=offset)
        fn = _device_overlap_save(
            mix_console, use_fx_bus, n_blocks, block_len, context_len,
            n_all, group_bs,
        )
    else:
        hop = analysis_len // 2
        n_windows = -(-total // hop)
        n_windows = -(-n_windows // group_bs) * group_bs
        pad_total = (n_windows + 1) * hop
        offset = 0
        tracks_dev = _device_tracks(tracks, pad_total, offset=offset)
        fn = _device_ola(
            mix_console, use_fx_bus, n_windows, analysis_len, n_all,
            group_bs,
        )

    # one model call on the analysis windows of the KEPT tracks (the
    # reference removes gated tracks from the model input, utils.py:85-101).
    # The windows are sliced from the device-cached raw tracks — per-call
    # upload is the kept-index/gain vectors, not the analysis audio.
    if total >= analysis_len:
        analysis_dev = _analysis_slicer(n_all, len(keep), analysis_len)(
            tracks_dev,
            jnp.asarray(np.asarray(keep, np.int32)),
            jnp.asarray(gains[keep]),
            offset + track_start_idx,
        )
    else:  # short song: the model sees the (shorter) full-length window
        analysis_dev = jnp.asarray(np.stack(norm_analysis)[None])
    tp, fp, mp = model_apply(analysis_dev, jnp.asarray(analysis_ref))

    if key is None:
        key = jax.random.PRNGKey(0)

    # Scatter the kept tracks' predicted params back to full track slots;
    # gated rows get zeros (irrelevant: zero input renders to zero output).
    tp_host = np.asarray(tp)
    tp_full = np.zeros((1, n_all, tp_host.shape[-1]), np.float32)
    tp_full[0, keep] = tp_host[0]

    mix = fn(tracks_dev, jnp.asarray(gains), jnp.asarray(tp_full), fp, mp, key)
    if return_device:
        pred_mix = mix[None, :, :total]
    elif output_format == "pcm16":
        pred_mix = np.asarray(_pcm16_trim(total)(mix))[None]
    else:
        pred_mix = np.asarray(mix)[None, :, :total]

    td, fd, md = mix_console.param_dicts(tp, fp, mp)
    return pred_mix, td, fd, md
