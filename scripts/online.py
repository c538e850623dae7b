"""Gradient-descent-only mixing baseline: no network, optimize console params.

Rebuild of /root/reference/scripts/online.py:15-123,299-346: optimize the raw
(sigmoid-squashed) console parameters directly against the AudioFeatureLoss
between the rendered mix of one analysis block and the reference block, then
render the full song block-wise with the optimized parameters.

Usage:
    python scripts/online.py --track_dir DIR --ref REF.wav --output OUT.wav \
        [--n_iters 250] [--lr 0.01] [--block_start 0] [--block_len 262144]

Also exposes ``optimize_params`` for tests: it is the cleanest end-to-end
check that loss gradients flow through the full console DSP.
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffmst_tpu.console import AdvancedMixConsole  # noqa: E402
from diffmst_tpu.losses import AudioFeatureLoss  # noqa: E402
from diffmst_tpu.utils.inference import overlap_add_render  # noqa: E402


def optimize_params(
    tracks: jnp.ndarray,
    ref_mix: jnp.ndarray,
    console: AdvancedMixConsole,
    loss_fn=None,
    n_iters: int = 250,
    lr: float = 0.01,
    use_fx_bus: bool = False,
    key=None,
    log_every: int = 50,
):
    """Adam on sigmoid(raw params) against the block loss (online.py:71-106).

    Returns (track_params, fx_params, master_params) in (0,1) and the loss
    trajectory.
    """
    if loss_fn is None:
        loss_fn = AudioFeatureLoss()
    if key is None:
        key = jax.random.PRNGKey(0)
    bs, num_tracks, _ = tracks.shape
    k1, k2, k3 = jax.random.split(key, 3)
    raw = {
        "track": 0.1 * jax.random.normal(k1, (bs, num_tracks, console.num_track_control_params)),
        "fx": 0.1 * jax.random.normal(k2, (bs, console.num_fx_bus_control_params)),
        "master": 0.1 * jax.random.normal(k3, (bs, console.num_master_bus_control_params)),
    }
    opt = optax.adam(lr)
    opt_state = opt.init(raw)

    def total_loss(raw):
        out = console(
            tracks,
            jax.nn.sigmoid(raw["track"]),
            jax.nn.sigmoid(raw["fx"]),
            jax.nn.sigmoid(raw["master"]),
            use_fx_bus=use_fx_bus,
            key=key,
        )
        l = loss_fn(out.mix, ref_mix)
        if isinstance(l, dict):
            l = sum(jnp.mean(v) for v in l.values())
        return l

    @jax.jit
    def step(raw, opt_state):
        loss, grads = jax.value_and_grad(total_loss)(raw)
        updates, opt_state = opt.update(grads, opt_state, raw)
        return optax.apply_updates(raw, updates), opt_state, loss

    history = []
    for i in range(n_iters):
        raw, opt_state, loss = step(raw, opt_state)
        if (i % log_every) == 0 or i == n_iters - 1:
            history.append(float(loss))
            print(f"iter {i}: loss {history[-1]:.6f}", flush=True)
    return (
        jax.nn.sigmoid(raw["track"]),
        jax.nn.sigmoid(raw["fx"]),
        jax.nn.sigmoid(raw["master"]),
        history,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--track_dir", required=True, help="directory of mono stem wavs")
    ap.add_argument("--ref", required=True, help="stereo reference mix wav")
    ap.add_argument("--output", required=True)
    ap.add_argument("--n_iters", type=int, default=250)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--block_start", type=int, default=0)
    ap.add_argument("--block_len", type=int, default=262144)
    args = ap.parse_args()

    from diffmst_tpu.data import read_audio, write_audio
    from diffmst_tpu.ops.loudness import integrated_loudness

    stems = []
    for f in sorted(os.listdir(args.track_dir)):
        if f.endswith(".wav"):
            a, sr = read_audio(os.path.join(args.track_dir, f))
            stems.append(a.mean(axis=0))
    total = min(s.shape[-1] for s in stems)
    tracks = np.stack([s[:total] for s in stems])[None]

    # normalize each stem to -48 LUFS
    for i in range(tracks.shape[1]):
        lufs = integrated_loudness(tracks[0, i], 44100.0)
        if np.isfinite(lufs):
            tracks[0, i] *= 10 ** ((-48.0 - lufs) / 20.0)

    ref, _ = read_audio(args.ref)
    ref = ref[None, :, args.block_start : args.block_start + args.block_len]

    console = AdvancedMixConsole(44100.0)
    block = jnp.asarray(
        tracks[..., args.block_start : args.block_start + args.block_len]
    )
    tp, fp, mp, hist = optimize_params(
        block, jnp.asarray(ref), console, n_iters=args.n_iters, lr=args.lr
    )

    @jax.jit
    def render(wins):
        n = wins.shape[0]
        return console(
            wins, jnp.tile(tp, (n, 1, 1)), jnp.tile(fp, (n, 1)),
            jnp.tile(mp, (n, 1)), use_fx_bus=False,
        ).mix

    mix = overlap_add_render(render, tracks, args.block_len)
    write_audio(args.output, mix[0] / max(np.abs(mix).max(), 1e-8), 44100)
    print(f"wrote {args.output}; final loss {hist[-1]:.6f}")


if __name__ == "__main__":
    main()
