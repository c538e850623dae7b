"""Ablated-reference evaluation (rebuild of scripts/eval_ablation.py).

Run the model against systematically degraded references (mono-folded,
band-limited, level-shifted) and write per-feature CSVs — measures how much
each reference attribute drives the predicted mix.

    python scripts/eval_ablation.py --examples_dir DIR --output_dir OUT \
        --ckpt checkpoints/best
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffmst_tpu.console import AdvancedMixConsole  # noqa: E402
from diffmst_tpu.data import write_audio  # noqa: E402
from diffmst_tpu.models import MixStyleTransferModel  # noqa: E402
from diffmst_tpu.utils.inference import run_diffmst  # noqa: E402
from scripts.eval_all_combo import load_song, mix_features  # noqa: E402

SR = 44100


def ablations(ref: np.ndarray) -> dict:
    out = {"full": ref}
    mono = ref.mean(axis=1, keepdims=True)
    out["mono"] = np.repeat(mono, 2, axis=1)
    out["quiet"] = ref * 10 ** (-12 / 20)
    # band-limit below 4 kHz with an FFT brickwall
    X = np.fft.rfft(ref, axis=-1)
    freqs = np.fft.rfftfreq(ref.shape[-1], 1 / SR)
    X[..., freqs > 4000] = 0
    out["lowpassed"] = np.fft.irfft(X, n=ref.shape[-1], axis=-1).astype(np.float32)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--examples_dir", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--embed_dim", type=int, default=512)
    ap.add_argument("--num_layers", type=int, default=12)
    ap.add_argument("--cnn_base_width", type=int, default=64)
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
    rows = []
    for song in sorted(os.listdir(args.examples_dir)):
        song_dir = os.path.join(args.examples_dir, song)
        if not os.path.isdir(song_dir):
            continue
        tracks, ref = load_song(song_dir)
        for name, aref in ablations(ref).items():
            mix, *_ = run_diffmst(tracks, aref.astype(np.float32), apply, console)
            write_audio(
                os.path.join(args.output_dir, f"{song}_{name}.wav"),
                mix[0] / max(np.abs(mix).max(), 1e-8), SR,
            )
            row = {"song": song, "ablation": name}
            row.update({f"mix_{k}": v for k, v in mix_features(mix).items()})
            rows.append(row)
            print(row, flush=True)

    with open(os.path.join(args.output_dir, "ablation.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)


if __name__ == "__main__":
    main()
