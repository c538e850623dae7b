"""ctypes bindings for the native data-loader core (native/diffmst_native.cpp).

Builds the shared library on first use (g++ is in the image); every entry
point has a pure-Python fallback (scipy WAV mmap + NumPy loudness), so the
pipeline works even without a compiler. ``MultitrackDataset`` uses the fused
``load_normalized`` when available — one native pass decodes, measures
BS.1770 loudness, and scales to the target.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

from diffmst_tpu.data.audio_io import UnsupportedAudioFormat

__all__ = ["native_available", "wav_info", "wav_read", "integrated_loudness",
           "load_normalized", "load_normalized_batch"]

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build_and_load() -> Optional[ctypes.CDLL]:
    src = os.path.join(_repo_root(), "native", "diffmst_native.cpp")
    out = os.path.join(_repo_root(), "native", "libdiffmst_native.so")
    if not os.path.exists(out) or (
        os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(out)
    ):
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-pthread", "-shared", "-fPIC",
                 "-o", out, src],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except (subprocess.SubprocessError, OSError):
            return None
    try:
        lib = ctypes.CDLL(out)
    except OSError:
        return None

    lib.dn_wav_info.restype = ctypes.c_int
    lib.dn_wav_info.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.dn_wav_read.restype = ctypes.c_int
    lib.dn_wav_read.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.dn_integrated_loudness.restype = ctypes.c_double
    lib.dn_integrated_loudness.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_int,
        ctypes.c_double,
    ]
    lib.dn_load_normalized.restype = ctypes.c_int
    lib.dn_load_normalized.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_long, ctypes.c_double,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_double),
    ]
    lib.dn_load_normalized_batch.restype = None
    lib.dn_load_normalized_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long), ctypes.c_double,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_int,
    ]
    return lib


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if not _TRIED:
            _LIB = _build_and_load()
            _TRIED = True
        return _LIB


def native_available() -> bool:
    return _lib() is not None


def wav_info(path: str) -> Tuple[int, int, int]:
    """(num_frames, channels, sample_rate); native with Python fallback."""
    lib = _lib()
    if lib is not None:
        frames = ctypes.c_long()
        chs = ctypes.c_int()
        rate = ctypes.c_int()
        if lib.dn_wav_info(path.encode(), frames, chs, rate) == 0:
            return frames.value, chs.value, rate.value
    from diffmst_tpu.data.audio_io import audio_info

    return audio_info(path)


def wav_read(path: str, start: int, frames: int) -> Tuple[np.ndarray, int]:
    """Decode a slice -> (channels, frames) float32 + sample rate."""
    lib = _lib()
    if lib is not None:
        n_frames, chs, rate = wav_info(path)
        frames = min(frames, n_frames - start)
        buf = np.empty(frames * chs, np.float32)
        rc = lib.dn_wav_read(
            path.encode(), start, frames,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc == 0:
            return buf.reshape(frames, chs).T.copy(), rate
    from diffmst_tpu.data.audio_io import read_audio

    return read_audio(path, start, frames)


def integrated_loudness(audio: np.ndarray, sample_rate: float) -> float:
    """BS.1770 LUFS of (frames,) or (frames, channels) float audio."""
    lib = _lib()
    if lib is not None:
        if audio.ndim == 1:
            audio = audio[:, None]
        inter = np.ascontiguousarray(audio, np.float32)
        return lib.dn_integrated_loudness(
            inter.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            inter.shape[0], inter.shape[1], float(sample_rate),
        )
    from diffmst_tpu.ops.loudness import integrated_loudness as py_loudness

    return py_loudness(audio, sample_rate)


def load_normalized(
    path: str, start: int, frames: int, target_lufs: float
) -> Tuple[Optional[np.ndarray], float, int]:
    """Fused decode+measure+scale -> ((channels, frames), measured LUFS, sr).

    Returns (None, -inf, 0) on decode failure.
    """
    lib = _lib()
    if lib is not None:
        try:
            n_frames, chs, rate = wav_info(path)
        except UnsupportedAudioFormat:
            raise  # decode contract: fail loudly with the remedy
        except Exception:
            return None, float("-inf"), 0
        if start + frames > n_frames:
            return None, float("-inf"), 0
        buf = np.empty(frames * chs, np.float32)
        lufs = ctypes.c_double()
        rc = lib.dn_load_normalized(
            path.encode(), start, frames, target_lufs,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), lufs,
        )
        if rc == 0:
            return buf.reshape(frames, chs).T.copy(), lufs.value, rate
        return None, float("-inf"), 0
    # Python fallback
    from diffmst_tpu.data.audio_io import read_audio
    from diffmst_tpu.ops.loudness import integrated_loudness as py_loudness

    try:
        audio, rate = read_audio(path, start, frames)
    except UnsupportedAudioFormat:
        raise
    except (OSError, ValueError):
        return None, float("-inf"), 0
    lufs = py_loudness(audio.T, rate)
    if np.isfinite(lufs):
        audio = audio * 10.0 ** ((target_lufs - lufs) / 20.0)
    return audio, lufs, rate


def load_normalized_batch(
    paths, starts, frames: int, target_lufs: float,
    num_threads: Optional[int] = None,
):
    """Threaded batch of fused decode+measure+normalize loads.

    One native call decodes, measures and scales all files on a C++ thread
    pool (native/diffmst_native.cpp::dn_load_normalized_batch) — the per-song
    stem loads that the reference performs sequentially inside DataLoader
    workers (dataloader.py:294-316). Returns a list of
    ``(audio (channels, frames) | None, lufs, sample_rate)`` per input.
    """
    n = len(paths)
    if num_threads is None:
        num_threads = min(8, os.cpu_count() or 1)
    lib = _lib()
    if lib is None or n == 0:
        return [load_normalized(p, s, frames, target_lufs)
                for p, s in zip(paths, starts)]

    infos = []
    for p in paths:
        try:
            infos.append(wav_info(p))
        except UnsupportedAudioFormat:
            raise
        except Exception:
            infos.append(None)
    valid = [
        i for i, info in enumerate(infos)
        if info is not None and starts[i] + frames <= info[0] and info[1] > 0
    ]
    results = [(None, float("-inf"), 0)] * n
    if not valid:
        return results

    bufs = {i: np.empty(frames * infos[i][1], np.float32) for i in valid}
    m = len(valid)
    c_paths = (ctypes.c_char_p * m)(*[paths[i].encode() for i in valid])
    c_starts = (ctypes.c_long * m)(*[int(starts[i]) for i in valid])
    c_frames = (ctypes.c_long * m)(*[int(frames)] * m)
    c_outs = (ctypes.POINTER(ctypes.c_float) * m)(
        *[bufs[i].ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for i in valid]
    )
    c_lufs = (ctypes.c_double * m)()
    c_rcs = (ctypes.c_int * m)()
    lib.dn_load_normalized_batch(
        c_paths, c_starts, c_frames, float(target_lufs), c_outs, c_lufs,
        c_rcs, m, int(num_threads),
    )
    for j, i in enumerate(valid):
        if c_rcs[j] == 0:
            chs, rate = infos[i][1], infos[i][2]
            results[i] = (
                bufs[i].reshape(frames, chs).T.copy(), c_lufs[j], rate
            )
    return results
