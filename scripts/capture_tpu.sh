#!/bin/bash
# Capture every TPU measurement in one go (run from /root/repo when the
# axon tunnel is alive): headline bench -> bench_result.json + stdout,
# smoother/console microbench -> logs/microbench_tpu.json, stage
# decompositions -> logs/profile_console.json + logs/profile_train.json.
set -uo pipefail
cd "$(dirname "$0")/.."
echo "== bench.py =="
BENCH_DEADLINE_S=${BENCH_DEADLINE_S:-3600} python bench.py | tee logs/bench_capture.json
echo "== microbench =="
python scripts/microbench_tpu.py 2>&1 | grep -v -i warning
echo "== profile: console stages =="
python scripts/profile_console.py 2>&1 | grep -v -i warning
echo "== profile: train-step stages =="
python scripts/profile_train.py 2>&1 | grep -v -i warning
echo "captured: bench_result.json + logs/{microbench_tpu,profile_console,profile_train}.json"
