"""Compare two mixes by their audio features (bark spectra + scalar stats).

Rebuild of /root/reference/scripts/compare.py:1-60: load two stereo mixes,
compute the five AudioFeatureLoss features (bark spectrum, crest factor,
RMS, stereo imbalance, stereo width — mst/loss.py:62-195), plot the
mid/side bark spectra of A vs B side by side, and save the plot. On top of
the reference (which only plots and discards the scalar features), the
scalar features are written to a CSV and printed, so the comparison is
usable headless/CI-side.

Usage: python scripts/compare.py a.wav b.wav [--output_dir outputs/compare]
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffmst_tpu.data import read_audio  # noqa: E402
from diffmst_tpu.losses import features as F  # noqa: E402


def _load_stereo(path: str) -> tuple[np.ndarray, int]:
    """(1, 2, T) float32 batch from a mono/stereo WAV (mono is duplicated)."""
    audio, sr = read_audio(path)
    if audio.shape[0] == 1:
        audio = np.concatenate([audio, audio], axis=0)
    return audio[None, :2], sr


def compare_mixes(input_a: str, input_b: str, sample_rate: int = 44100) -> dict:
    """Compute the five AFLoss features for both mixes.

    Returns {"a": {...}, "b": {...}} where each entry holds the scalar
    features (floats / per-channel lists) plus the (n_bands, 2) mid-side
    bark spectrum (reference computes exactly these, compare.py:33-47).
    """
    out = {}
    for name, path in (("a", input_a), ("b", input_b)):
        x, sr = _load_stereo(path)
        feats = {
            "barkspectrum": np.asarray(
                F.compute_barkspectrum(x, sample_rate=sample_rate)
            )[0],  # (n_bands, 2): mid, side
            "crest_factor": np.asarray(F.compute_crest_factor(x))[0].tolist(),
            "rms": np.asarray(F.compute_rms(x))[0].tolist(),
            "stereo_imbalance": float(np.asarray(F.compute_stereo_imbalance(x))[0]),
            "stereo_width": float(np.asarray(F.compute_stereo_width(x))[0]),
            "file_sample_rate": sr,
        }
        out[name] = feats
    return out


def plot_barkspectra(feats: dict, out_path: str) -> bool:
    """Side-by-side mid/side bark spectrum plot (compare.py:51-59).

    Returns False (with no file written) if matplotlib is unavailable.
    """
    try:
        import matplotlib

        matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt
    except ImportError:
        return False
    fig, axs = plt.subplots(2, 1, sharex=True, sharey=True)
    a, b = feats["a"]["barkspectrum"], feats["b"]["barkspectrum"]
    axs[0].plot(a[:, 0], label="A-mid", color="tab:orange")
    axs[0].plot(b[:, 0], label="B-mid", color="tab:blue")
    axs[1].plot(a[:, 1], label="A-side", color="tab:orange")
    axs[1].plot(b[:, 1], label="B-side", color="tab:blue")
    axs[0].set_ylabel("log bark magnitude (mid)")
    axs[1].set_ylabel("log bark magnitude (side)")
    axs[1].set_xlabel("bark band")
    axs[0].legend()
    axs[1].legend()
    fig.savefig(out_path)
    plt.close(fig)
    return True


def write_feature_csv(feats: dict, out_path: str) -> None:
    """Scalar features of both mixes, one row per (feature, mix)."""
    with open(out_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["feature", "mix", "value"])
        for name in ("a", "b"):
            fe = feats[name]
            w.writerow(["rms_l", name, fe["rms"][0]])
            w.writerow(["rms_r", name, fe["rms"][1]])
            w.writerow(["crest_factor_l", name, fe["crest_factor"][0]])
            w.writerow(["crest_factor_r", name, fe["crest_factor"][1]])
            w.writerow(["stereo_width", name, fe["stereo_width"]])
            w.writerow(["stereo_imbalance", name, fe["stereo_imbalance"]])


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input_a", type=str)
    ap.add_argument("input_b", type=str)
    ap.add_argument("--output_dir", type=str, default="outputs/compare")
    ap.add_argument("--sample_rate", type=int, default=44100)
    args = ap.parse_args(argv)

    a_name = os.path.basename(args.input_a).split(".")[0]
    b_name = os.path.basename(args.input_b).split(".")[0]
    output_dir = os.path.join(args.output_dir, f"{a_name}-{b_name}")
    os.makedirs(output_dir, exist_ok=True)

    feats = compare_mixes(args.input_a, args.input_b, args.sample_rate)

    csv_path = os.path.join(output_dir, "features.csv")
    write_feature_csv(feats, csv_path)
    plotted = plot_barkspectra(feats, os.path.join(output_dir, "bark_spectrum.png"))

    for name in ("a", "b"):
        fe = feats[name]
        print(
            f"{name}: rms={fe['rms']} crest={fe['crest_factor']} "
            f"width={fe['stereo_width']:.4f} imbalance={fe['stereo_imbalance']:.4f}"
        )
    print(f"wrote {csv_path}" + ("" if plotted else " (no matplotlib: plot skipped)"))
    return output_dir


if __name__ == "__main__":
    main()
