"""Single-song CLI inference (working rebuild of the reference's stale
scripts/run.py — the original imports a nonexistent ``load_model``).

    python scripts/run.py --track_dir DIR --ref REF.wav --output OUT.wav \
        [--ckpt checkpoints/best]
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
from diffmst_tpu.utils.inference import run_diffmst  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--track_dir", required=True)
    ap.add_argument("--ref", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--embed_dim", type=int, default=512)
    ap.add_argument("--num_layers", type=int, default=12)
    ap.add_argument("--cnn_base_width", type=int, default=64)
    ap.add_argument("--render_mode", default="ola", choices=["ola", "streaming"])
    ap.add_argument("--comp_smoother", default="auto")
    args = ap.parse_args()

    stems = []
    for f in sorted(os.listdir(args.track_dir)):
        if f.endswith(".wav"):
            a, _ = read_audio(os.path.join(args.track_dir, f))
            stems.append(a.mean(axis=0))
    total = min(s.shape[-1] for s in stems)
    tracks = np.stack([s[:total] for s in stems])[None]
    ref, _ = read_audio(args.ref)

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
        import jax.numpy as jnp

        print("warning: no --ckpt; using random init")
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.asarray(tracks[:, :2, :262144]),
            jnp.asarray(ref[None, :, :262144]),
            jnp.zeros((1, 2), bool),
        )

    # weights as jit ARGUMENTS, not closure constants: captured variables
    # are inlined into the compiled program (763 MB for the flagship),
    # bloating the executable (and through the dev tunnel, aborting the
    # remote compile upload)
    _apply = jax.jit(model.apply)
    apply = lambda t, r: _apply(variables, t, r)  # noqa: E731
    console = AdvancedMixConsole(44100.0, comp_smoother=args.comp_smoother)
    mix, *_ = run_diffmst(tracks, ref[None], apply, console, render_mode=args.render_mode)
    write_audio(args.output, mix[0] / max(np.abs(mix).max(), 1e-8), 44100)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
