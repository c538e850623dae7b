"""Dataset channel-count census (rebuild of /root/reference/scripts/info.py).

    python scripts/info.py --root DIR
"""

from __future__ import annotations

import argparse
import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffmst_tpu.data import audio_info  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    args = ap.parse_args()

    counts = collections.Counter()
    seconds = 0.0
    for dirpath, _dirs, files in os.walk(args.root):
        for f in files:
            if not f.endswith(".wav"):
                continue
            try:
                frames, chs, sr = audio_info(os.path.join(dirpath, f))
            except Exception:
                counts["unreadable"] += 1
                continue
            counts[f"{chs}ch"] += 1
            seconds += frames / sr
    for k, v in sorted(counts.items()):
        print(f"{k}: {v}")
    print(f"total audio: {seconds / 3600:.2f} h")


if __name__ == "__main__":
    main()
