#!/usr/bin/env bash
# Run the gradient-descent mixing baseline on one song.
#
# TPU-native equivalent of the reference's launcher (reference:
# scripts/online.sh — CUDA_VISIBLE_DEVICES pinning + hard-coded dataset
# paths). On TPU there is no per-process device mask to export; device
# selection is JAX_PLATFORMS / the default backend. Paths come from the
# environment so the script works outside the authors' cluster:
#
#   TRACK_DIR=/data/multitracks/song REF_MIX=/data/ref.wav \
#       OUTPUT=outputs/online_mix.wav ./scripts/online.sh [extra args]
#
# Extra args are forwarded to scripts/online.py (e.g. --n_iters 1000).
set -euo pipefail

cd "$(dirname "$0")/.."

: "${TRACK_DIR:?set TRACK_DIR to a directory of mono stem wavs}"
: "${REF_MIX:?set REF_MIX to a stereo reference mix wav}"
OUTPUT="${OUTPUT:-outputs/online_mix.wav}"

mkdir -p "$(dirname "${OUTPUT}")"

exec python scripts/online.py \
    --track_dir "${TRACK_DIR}" \
    --ref "${REF_MIX}" \
    --output "${OUTPUT}" \
    --n_iters "${N_ITERS:-1000}" \
    "$@"
