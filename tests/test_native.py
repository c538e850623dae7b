"""Native (C++) data-loader core: parity with the Python implementations."""

import numpy as np
import pytest

from diffmst_tpu.data import write_audio
from diffmst_tpu.data import native
from diffmst_tpu.ops.loudness import integrated_loudness as py_loudness

SR = 44100


@pytest.fixture(scope="module")
def wav_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("native") / "x.wav"
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=(2, SR * 2)) * 0.1).astype(np.float32)
    write_audio(str(p), audio, SR)
    return str(p), audio


@pytest.mark.smoke
def test_native_builds():
    assert native.native_available(), "g++ build of the native core failed"


@pytest.mark.smoke
def test_wav_info_and_read_parity(wav_file):
    path, audio = wav_file
    frames, chs, rate = native.wav_info(path)
    assert (frames, chs, rate) == (SR * 2, 2, SR)
    got, rate2 = native.wav_read(path, 1000, 500)
    assert rate2 == SR and got.shape == (2, 500)
    np.testing.assert_allclose(got, audio[:, 1000:1500], atol=1e-4)


def test_native_loudness_matches_python(wav_file):
    _, audio = wav_file
    n = native.integrated_loudness(audio.T, SR)
    p = py_loudness(audio.T, SR)
    assert abs(n - p) < 0.05, (n, p)
    # silence
    assert native.integrated_loudness(np.zeros((SR, 1), np.float32), SR) == float(
        "-inf"
    )


def test_load_normalized_hits_target(wav_file):
    path, _ = wav_file
    audio, lufs, rate = native.load_normalized(path, 0, SR * 2, -30.0)
    assert audio is not None and rate == SR
    # measured loudness reported pre-gain; post-gain audio is at target
    post = py_loudness(audio.T, SR)
    assert abs(post - (-30.0)) < 0.1
    assert np.isfinite(lufs)


def test_load_normalized_bad_file(tmp_path):
    p = tmp_path / "garbage.wav"
    p.write_bytes(b"not a wav file at all")
    audio, lufs, rate = native.load_normalized(str(p), 0, 100, -30.0)
    assert audio is None and lufs == float("-inf")


def test_native_24bit_decode(tmp_path):
    """Hand-craft a 24-bit PCM WAV and verify the decode path."""
    import struct

    sr, frames = 44100, 1000
    vals = (np.sin(np.linspace(0, 20 * np.pi, frames)) * 0.5).astype(np.float64)
    ints = np.clip((vals * 8388608.0), -8388608, 8388607).astype(np.int32)
    raw = b"".join(struct.pack("<i", v)[:3] for v in ints)
    hdr = b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 3, 3, 24)
    hdr += b"data" + struct.pack("<I", len(raw))
    p = tmp_path / "b24.wav"
    p.write_bytes(hdr + raw)
    if not native.native_available():
        pytest.skip("no native lib")
    got, rate = native.wav_read(str(p), 0, frames)
    assert rate == sr
    np.testing.assert_allclose(got[0], ints / 8388608.0, atol=2e-7)


def test_load_normalized_batch_matches_sequential(tmp_path):
    """Threaded native batch loader == per-file fused loads; invalid paths
    and out-of-range offsets come back as (None, -inf, 0)."""
    from diffmst_tpu.data import write_audio
    from diffmst_tpu.data.native import load_normalized, load_normalized_batch

    rng = np.random.default_rng(0)
    sr, frames = 44100, 8192
    paths, starts = [], []
    for i in range(5):
        p = str(tmp_path / f"f{i}.wav")
        chans = 2 if i % 2 else 1
        x = (rng.normal(size=(chans, frames * 3)) * 0.1).astype(np.float32)
        write_audio(p, x, sr)
        paths.append(p)
        starts.append(i * 100)
    paths.append(str(tmp_path / "missing.wav"))
    starts.append(0)
    paths.append(paths[0])
    starts.append(frames * 3)  # out of range

    batch = load_normalized_batch(paths, starts, frames, -48.0, num_threads=4)
    assert len(batch) == 7
    for i in range(5):
        a_b, l_b, r_b = batch[i]
        a_s, l_s, r_s = load_normalized(paths[i], starts[i], frames, -48.0)
        assert a_b is not None and r_b == r_s == sr
        np.testing.assert_allclose(a_b, a_s, atol=1e-7)
        np.testing.assert_allclose(l_b, l_s, atol=1e-9)
    assert batch[5][0] is None and batch[6][0] is None
