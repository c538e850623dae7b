"""Summarize an eval_all_combo results.csv: model vs equal-loudness sum.

Produces the per-method comparison table the reference's eval workflow
reads off its CSV (scripts/eval_all_combo.py:100-274 writes features but
ships no aggregator): for every AudioFeatureLoss feature, the mean
absolute distance |mix_feature - ref_feature| per method, plus the two
style-transfer distances (MRSTFT down, SI-SDR up). Lower feature distance
= the mix is closer to the reference style.

Usage:
    python scripts/summarize_eval.py results.csv [--out summary.md]
"""

import argparse
import csv
from collections import defaultdict

FEATURES = ["rms", "crest_factor", "stereo_width", "stereo_imbalance",
            "barkspectrum_mean"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("csv")
    ap.add_argument("--out", default=None, help="write a markdown table here")
    args = ap.parse_args()

    rows = list(csv.DictReader(open(args.csv)))
    methods = sorted({r["method"] for r in rows})
    agg = defaultdict(lambda: defaultdict(list))
    for r in rows:
        m = r["method"]
        for f in FEATURES:
            agg[m][f].append(abs(float(r[f"mix_{f}"]) - float(r[f"ref_{f}"])))
        agg[m]["mrstft_to_ref"].append(float(r["mrstft_to_ref"]))
        agg[m]["sisdr_to_ref"].append(float(r["sisdr_to_ref"]))

    cols = [f"|{f}|" for f in FEATURES] + ["mrstft↓", "sisdr↑"]
    keys = FEATURES + ["mrstft_to_ref", "sisdr_to_ref"]
    lines = [
        "| method | n | " + " | ".join(cols) + " |",
        "|---|---|" + "|".join(["---"] * len(cols)) + "|",
    ]
    means = {}
    for m in methods:
        vals = [sum(agg[m][k]) / len(agg[m][k]) for k in keys]
        means[m] = dict(zip(keys, vals))
        lines.append(
            f"| {m} | {len(agg[m][keys[0]])} | "
            + " | ".join(f"{v:.4f}" for v in vals) + " |"
        )
    if {"diffmst", "sum"} <= set(methods):
        d, s = means["diffmst"], means["sum"]
        wins = [k for k in FEATURES if d[k] < s[k]]
        wins += ["mrstft_to_ref"] if d["mrstft_to_ref"] < s["mrstft_to_ref"] else []
        wins += ["sisdr_to_ref"] if d["sisdr_to_ref"] > s["sisdr_to_ref"] else []
        lines.append("")
        lines.append(
            f"diffmst beats the equal-loudness sum on {len(wins)}/"
            f"{len(keys)} metrics: {', '.join(wins) or 'none'}"
        )
    text = "\n".join(lines)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
