"""Host-side audio decode.

The reference decodes with torchaudio/soundfile (dataloader.py:205,216);
neither is in this image, so WAV decode goes through scipy's memory-mapped
reader (zero-copy random access into large stems — the dataset reads random
offsets of multi-minute files, dataloader.py:286) with graceful rejection of
non-WAV/compressed content. A native (C++) decoder can slot in behind the
same interface later.
"""

from __future__ import annotations

import os
import wave
from typing import Optional, Tuple

import numpy as np
from scipy.io import wavfile

__all__ = ["audio_info", "read_audio", "write_audio"]


def audio_info(path: str) -> Tuple[int, int, int]:
    """Return (num_frames, num_channels, sample_rate) without decoding."""
    with wave.open(path, "rb") as f:
        return f.getnframes(), f.getnchannels(), f.getframerate()


_PCM_SCALE = {
    np.dtype(np.int16): 1.0 / 32768.0,
    np.dtype(np.int32): 1.0 / 2147483648.0,
    np.dtype(np.uint8): 1.0 / 128.0,
}


def read_audio(
    path: str,
    start: int = 0,
    frames: Optional[int] = None,
) -> Tuple[np.ndarray, int]:
    """Read a WAV file (or a slice of it) as float32 (channels, frames).

    Uses a memory map so random-offset reads of long stems do not decode the
    whole file. Integer PCM is scaled to [-1, 1); float PCM passes through.
    """
    sr, data = wavfile.read(path, mmap=True)
    if data.ndim == 1:
        data = data[:, None]
    stop = data.shape[0] if frames is None else min(start + frames, data.shape[0])
    chunk = np.array(data[start:stop])  # materialize only the slice
    if chunk.dtype in _PCM_SCALE:
        out = chunk.astype(np.float32) * _PCM_SCALE[chunk.dtype]
        if chunk.dtype == np.dtype(np.uint8):
            out = out - 1.0
    else:
        out = chunk.astype(np.float32)
    return out.T, int(sr)


def write_audio(path: str, audio: np.ndarray, sample_rate: int) -> None:
    """Write float32 (channels, frames) audio as 16-bit PCM WAV."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    x = np.clip(audio.T, -1.0, 1.0)
    wavfile.write(path, int(sample_rate), (x * 32767.0).astype(np.int16))
