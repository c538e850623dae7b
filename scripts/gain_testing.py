"""Gain-prediction probe (rebuild of scripts/gain_testing.py).

Mix a multitrack against single-stem references and print the predicted
per-track input-fader gains — a quick sanity probe that the model attends to
the reference (tracks matching the reference should get boosted).

    python scripts/gain_testing.py --track_dir DIR --ckpt checkpoints/best
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffmst_tpu.console import AdvancedMixConsole  # noqa: E402
from diffmst_tpu.data import read_audio  # noqa: E402
from diffmst_tpu.models import MixStyleTransferModel  # noqa: E402
from diffmst_tpu.ops.loudness import integrated_loudness  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--track_dir", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--embed_dim", type=int, default=512)
    ap.add_argument("--num_layers", type=int, default=12)
    ap.add_argument("--cnn_base_width", type=int, default=64)
    ap.add_argument("--length", type=int, default=262144)
    args = ap.parse_args()

    names, stems = [], []
    for f in sorted(os.listdir(args.track_dir)):
        if f.endswith(".wav"):
            a, _ = read_audio(os.path.join(args.track_dir, f), 0, args.length)
            lufs = integrated_loudness(a.T, 44100.0)
            if not np.isfinite(lufs) or lufs < -80:
                continue
            stems.append(a.mean(axis=0) * 10 ** ((-48.0 - lufs) / 20.0))
            names.append(f)
    tracks = np.stack(stems)[None]

    model = MixStyleTransferModel.build(
        embed_dim=args.embed_dim, num_layers=args.num_layers,
        cnn_base_width=args.cnn_base_width,
    )
    if args.ckpt:
        from diffmst_tpu.utils.checkpoint import restore_state

        state = restore_state(args.ckpt)
        params = state["params"] if isinstance(state, dict) else state.params
        bstats = (
            state.get("batch_stats", {})
            if isinstance(state, dict)
            else state.batch_stats
        )
        variables = {"params": params, **({"batch_stats": bstats} if bstats else {})}
    else:
        print("warning: random init")
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.asarray(tracks[:, :2]),
            jnp.asarray(tracks[:, :2]), jnp.zeros((1, 2), bool),
        )
    # weights as jit ARGUMENTS, not closure constants: captured variables
    # are inlined into the compiled program (763 MB for the flagship),
    # bloating the executable (and through the dev tunnel, aborting the
    # remote compile upload)
    _apply = jax.jit(model.apply)
    apply = lambda t, r: _apply(variables, t, r)  # noqa: E731
    console = AdvancedMixConsole(44100.0)

    for i, ref_name in enumerate(names):
        ref = np.stack([tracks[0, i], tracks[0, i]])[None]  # single-stem "mix"
        tp, fp, mp = apply(jnp.asarray(tracks), jnp.asarray(ref))
        gains = console.param_dicts(tp)[0]["input_fader"]["gain_db"][0]
        print(f"reference = {ref_name}:")
        for n, g in zip(names, np.asarray(gains)):
            print(f"  {n}: {g:+.1f} dB")


if __name__ == "__main__":
    main()
