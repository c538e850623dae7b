"""Listening-test audio generator (rebuild of scripts/eval_listen.py).

For each song: render verse/chorus (or arbitrary) sections with the model at
a sweep of reference loudness levels [-24..-6] LUFS, writing one wav per
(section, level) for listening tests. Fixes the reference's ``os.makepath``
crash (eval_listen.py:147).

    python scripts/eval_listen.py --examples_dir DIR --output_dir OUT \
        --ckpt checkpoints/best [--levels -24 -18 -12 -6]
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffmst_tpu.console import AdvancedMixConsole  # noqa: E402
from diffmst_tpu.data import read_audio, write_audio  # noqa: E402
from diffmst_tpu.models import MixStyleTransferModel  # noqa: E402
from diffmst_tpu.ops.loudness import loudness_normalize  # noqa: E402
from diffmst_tpu.utils.inference import run_diffmst  # noqa: E402
from scripts.eval_all_combo import load_song  # noqa: E402

SR = 44100


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--examples_dir", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--levels", type=float, nargs="+",
                    default=[-24.0, -18.0, -12.0, -6.0])
    ap.add_argument("--embed_dim", type=int, default=512)
    ap.add_argument("--num_layers", type=int, default=12)
    ap.add_argument("--cnn_base_width", type=int, default=64)
    ap.add_argument("--sections", type=int, nargs="+", default=[0])
    args = ap.parse_args()

    from diffmst_tpu.utils.checkpoint import restore_state

    model = MixStyleTransferModel.build(
        embed_dim=args.embed_dim, num_layers=args.num_layers,
        cnn_base_width=args.cnn_base_width,
    )
    state = restore_state(args.ckpt)
    params = state["params"] if isinstance(state, dict) else state.params
    bstats = (
        state.get("batch_stats", {}) if isinstance(state, dict) else state.batch_stats
    )
    variables = {"params": params, **({"batch_stats": bstats} if bstats else {})}
    # weights as jit ARGUMENTS, not closure constants: captured variables
    # are inlined into the compiled program (763 MB for the flagship),
    # bloating the executable (and through the dev tunnel, aborting the
    # remote compile upload)
    _apply = jax.jit(model.apply)
    apply = lambda t, r: _apply(variables, t, r)  # noqa: E731
    console = AdvancedMixConsole(float(SR))

    os.makedirs(args.output_dir, exist_ok=True)
    for song in sorted(os.listdir(args.examples_dir)):
        song_dir = os.path.join(args.examples_dir, song)
        if not os.path.isdir(song_dir):
            continue
        tracks, ref = load_song(song_dir)
        for sec in args.sections:
            for level in args.levels:
                ref_leveled = loudness_normalize(
                    np.asarray(ref[0]).T, SR, level
                ).T[None]
                mix, *_ = run_diffmst(
                    tracks, ref_leveled.astype(np.float32), apply, console,
                    track_start_idx=sec, ref_start_idx=sec,
                )
                out = os.path.join(
                    args.output_dir, song, f"sec{sec}_ref{int(level)}lufs.wav"
                )
                write_audio(out, mix[0] / max(np.abs(mix).max(), 1e-8), SR)
                print(f"wrote {out}")


if __name__ == "__main__":
    main()
