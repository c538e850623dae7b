"""Primary inference/eval entry: section cross-product evaluation.

Rebuild of /root/reference/scripts/eval_all_combo.py:100-274 (the README's
documented eval command, README.md:112-115): for each example song, run every
combination of track-section x reference-section through the model (plus an
equal-loudness sum baseline), loudness-normalize outputs to -22 LUFS, compute
AudioFeatureLoss features, write wavs + a CSV.

Layout expectations (same as the reference): --examples_dir contains one dir
per song with a ``tracks/`` subdir of stem wavs and a ``ref.wav``.

Usage:
    python scripts/eval_all_combo.py --examples_dir DIR --output_dir OUT \
        --ckpt checkpoints/best [--section_len 441000] [--num_sections 2]
"""

from __future__ import annotations

import argparse
import csv
import itertools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffmst_tpu.console import AdvancedMixConsole  # noqa: E402
from diffmst_tpu.losses import features as F  # noqa: E402
from diffmst_tpu.ops.loudness import integrated_loudness, loudness_normalize  # noqa: E402
from diffmst_tpu.data import read_audio, write_audio  # noqa: E402
from diffmst_tpu.utils.inference import run_diffmst  # noqa: E402

SR = 44100


def load_song(song_dir: str):
    stems = []
    tdir = os.path.join(song_dir, "tracks")
    for f in sorted(os.listdir(tdir)):
        if f.endswith(".wav"):
            a, _ = read_audio(os.path.join(tdir, f))
            stems.append(a.mean(axis=0))
    total = min(s.shape[-1] for s in stems)
    tracks = np.stack([s[:total] for s in stems])[None]
    ref, _ = read_audio(os.path.join(song_dir, "ref.wav"))
    return tracks, ref[None]


def equal_loudness_sum(tracks: np.ndarray) -> np.ndarray:
    """The reference's baseline method: normalize stems, sum to 'stereo'."""
    out = np.zeros((1, 2, tracks.shape[-1]), np.float32)
    for i in range(tracks.shape[1]):
        lufs = integrated_loudness(tracks[0, i], SR)
        if not np.isfinite(lufs) or lufs < -80:
            continue
        g = 10 ** ((-48.0 - lufs) / 20.0)
        out[0, 0] += tracks[0, i] * g
        out[0, 1] += tracks[0, i] * g
    return out


def mix_features(mix: np.ndarray) -> dict:
    x = jnp.asarray(mix)
    return {
        "rms": float(np.mean(np.asarray(F.compute_rms(x)))),
        "crest_factor": float(np.mean(np.asarray(F.compute_crest_factor(x)))),
        "stereo_width": float(np.mean(np.asarray(F.compute_stereo_width(x)))),
        "stereo_imbalance": float(
            np.mean(np.asarray(F.compute_stereo_imbalance(x)))
        ),
        "barkspectrum_mean": float(
            np.mean(np.asarray(F.compute_barkspectrum(x, sample_rate=SR)))
        ),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--examples_dir", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--ckpt", default=None, help="orbax checkpoint dir (trained model)")
    ap.add_argument("--embed_dim", type=int, default=512)
    ap.add_argument("--num_layers", type=int, default=12)
    ap.add_argument("--cnn_base_width", type=int, default=64)
    ap.add_argument("--section_len", type=int, default=441000)
    ap.add_argument("--num_sections", type=int, default=2)
    ap.add_argument("--output_lufs", type=float, default=-22.0)
    ap.add_argument("--render_mode", default="ola", choices=["ola", "streaming"],
                    help="'streaming' = seam-free overlap-save rendering")
    ap.add_argument("--comp_smoother", default="auto",
                    help="console compressor smoother (auto/fsm/scan/decoupled)")
    args = ap.parse_args()

    from diffmst_tpu.models import MixStyleTransferModel

    model = MixStyleTransferModel.build(
        embed_dim=args.embed_dim, num_layers=args.num_layers,
        cnn_base_width=args.cnn_base_width,
    )
    console = AdvancedMixConsole(float(SR), comp_smoother=args.comp_smoother)

    variables = None
    if args.ckpt:
        from diffmst_tpu.utils.checkpoint import restore_state

        state = restore_state(args.ckpt)
        params = state["params"] if isinstance(state, dict) else state.params
        bstats = (
            state.get("batch_stats", {})
            if isinstance(state, dict)
            else state.batch_stats
        )
        variables = {"params": params}
        if bstats:
            variables["batch_stats"] = bstats

    # One jit cache entry for every (song, section, section) combination —
    # inside the product loop a fresh lambda per iteration would recompile
    # (30-200 s on TPU) each time.
    _apply = jax.jit(model.apply)  # weights as args, not closure constants
    apply = (lambda t, r: _apply(variables, t, r)) if variables else None

    os.makedirs(args.output_dir, exist_ok=True)
    rows = []
    for song in sorted(os.listdir(args.examples_dir)):
        song_dir = os.path.join(args.examples_dir, song)
        if not os.path.isdir(song_dir):
            continue
        tracks, ref = load_song(song_dir)
        total = tracks.shape[-1]
        sections = [
            i * args.section_len
            for i in range(args.num_sections)
            if (i + 1) * args.section_len <= total
        ] or [0]
        ref_sections = [
            i * args.section_len
            for i in range(args.num_sections)
            if (i + 1) * args.section_len <= ref.shape[-1]
        ] or [0]

        for ti, ri in itertools.product(sections, ref_sections):
            methods = {"sum": equal_loudness_sum(tracks)}
            if variables is not None:
                mix, *_ = run_diffmst(
                    tracks, ref, apply, console,
                    track_start_idx=ti, ref_start_idx=ri,
                    render_mode=args.render_mode,
                )
                methods["diffmst"] = mix
            for method, mix in methods.items():
                mix = loudness_normalize(
                    np.asarray(mix[0]).T, SR, args.output_lufs
                ).T[None]
                name = f"{song}_t{ti}_r{ri}_{method}"
                write_audio(
                    os.path.join(args.output_dir, name + ".wav"),
                    mix[0], SR,
                )
                feats = mix_features(mix)
                ref_feats = mix_features(ref)
                row = {"song": song, "method": method, "track_start": ti,
                       "ref_start": ri}
                row.update({f"mix_{k}": v for k, v in feats.items()})
                row.update({f"ref_{k}": v for k, v in ref_feats.items()})
                # style-transfer distances to the reference mix (the eval
                # instruments the reference constructs but never logs,
                # system.py:60-69,367-389)
                n = min(mix.shape[-1], ref.shape[-1])
                from diffmst_tpu.losses import mrstft_distance, si_sdr

                row["mrstft_to_ref"] = float(
                    mrstft_distance(jnp.asarray(mix[..., :n]), jnp.asarray(ref[..., :n]))
                )
                row["sisdr_to_ref"] = float(
                    si_sdr(jnp.asarray(mix[..., :n]), jnp.asarray(ref[..., :n]))
                )
                rows.append(row)
                print(f"{name}: {feats}", flush=True)

    csv_path = os.path.join(args.output_dir, "results.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {csv_path} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
