"""Held-out eval songs for scripts/eval_all_combo.py (VERDICT round-4 #5).

Synthesizes N songs in the training distribution of the on-chip demo
(scripts/train_demo_tpu.py) but from a DISJOINT key stream (3000+i; the
train stream uses 1000+seed, the probe stream 2000+seed): colored-noise
stems (white noise through a random one-pole, peak-staged at -48 dB) plus a
reference mix rendered by the AdvancedMixConsole with naive-random params
under the training flags (EQ+comp+master on, fx bus off, faders off —
train/system.py::_common; reference mixing.py:35-94), peak-normalized.

Layout written (the reference eval layout, eval_all_combo.py docstring):
    OUT/song_XX/tracks/stem_YY.wav
    OUT/song_XX/ref.wav

Default length 2^20 samples (~23.8 s at 44.1 kHz) fits eval_all_combo's
two 10 s sections. Run from /root/repo:
    python scripts/make_eval_songs.py [--out data/eval_songs] [--n 4]
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from diffmst_tpu.console import AdvancedMixConsole
from diffmst_tpu.data import write_audio
from diffmst_tpu.mixing import naive_random_mix
from diffmst_tpu.utils.audio import batch_stereo_peak_normalize

SR = 44100
NT = 8


def synth_tracks(key, n_tracks, t):
    """Same one-pole colored-noise recipe as train_demo_tpu._synth_tracks."""
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (1, n_tracks, t), jnp.float32)
    a = jax.random.uniform(k2, (1, n_tracks, 1), minval=0.0, maxval=0.95)
    h = (1.0 - a) / (
        1.0 - a * jnp.exp(-2j * jnp.pi * jnp.fft.rfftfreq(t)).astype(jnp.complex64)
    )
    x = jnp.fft.irfft(jnp.fft.rfft(x, axis=-1) * h, n=t, axis=-1)
    peak = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    return x / jnp.maximum(peak, 1e-9) * 10 ** (-48 / 20)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/eval_songs")
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--t", type=int, default=2**20)
    args = ap.parse_args()

    console = AdvancedMixConsole(float(SR))

    @jax.jit
    def make(key):
        k_stems, k_mix = jax.random.split(key)
        tracks = synth_tracks(k_stems, NT, args.t)
        ref = naive_random_mix(
            tracks, console, k_mix,
            use_track_input_fader=False, use_track_eq=True,
            use_track_compressor=True, use_fx_bus=False,
            use_master_bus=True, use_output_fader=False,
        )
        return tracks, batch_stereo_peak_normalize(ref.mix)

    for i in range(args.n):
        tracks, ref = jax.device_get(make(jax.random.PRNGKey(3000 + i)))
        song_dir = os.path.join(args.out, f"song_{i:02d}")
        tdir = os.path.join(song_dir, "tracks")
        os.makedirs(tdir, exist_ok=True)
        for j in range(NT):
            write_audio(
                os.path.join(tdir, f"stem_{j:02d}.wav"),
                np.stack([tracks[0, j], tracks[0, j]]), SR,
            )
        write_audio(os.path.join(song_dir, "ref.wav"), ref[0], SR)
        print(f"wrote {song_dir} ({NT} stems + ref, {args.t} samples)",
              flush=True)


if __name__ == "__main__":
    main()
