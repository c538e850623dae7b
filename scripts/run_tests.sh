#!/usr/bin/env bash
# One-command full test suite (VERDICT round-2 #9).
#
# The full suite takes >25 min on a 1-core host and MUST run one jax
# process at a time (every python start registers the axon plugin; parallel
# starts can deadlock at import while the tunnel is busy). This runner
# executes the verify-skill chunks sequentially, prints a per-chunk
# summary, and exits nonzero if any chunk fails.
#
#   bash scripts/run_tests.sh            # full suite
#   bash scripts/run_tests.sh --smoke    # the ~30-test smoke subset (~1 min)
#
# Chunk boundaries keep each invocation under a ~600 s tool/CI timeout.

set -u
cd "$(dirname "$0")/.."

# Tests run CPU-only (conftest forces the cpu platform), so skip the axon
# TPU-plugin registration entirely: it dials the tunnel at every python
# start and can block indefinitely when the tunnel is busy or wedged.
# This also makes the suite safe to run alongside a TPU process.
PYTEST="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -m pytest -q -p no:cacheprovider"
# 2400 s: the slowest chunk (fused dispatch, ~860 s clean) has been seen
# at >1500 s when a TPU bench shares the host; the margin keeps the gate
# honest under load instead of reporting rc=124 for a passing chunk.
CHUNK_TIMEOUT="${CHUNK_TIMEOUT:-2400}"

if [[ "${1:-}" == "--smoke" ]]; then
    timeout "$CHUNK_TIMEOUT" $PYTEST tests/ -m smoke
    exit $?
fi

declare -a NAMES=(
    "ops+console+losses+kernels+native"
    "models+utils+data+ke+golden"
    "hdemucs"
    "export"
    "train (core)"
    "train (fused dispatch)"
    "train (bf16+curriculum)"
    "train (flatten)"
    "train (dp/mp sharded)"
    "scripts"
    "cli (remixer+param system)"
    "cli (rest)"
)
declare -a CMDS=(
    "tests/test_ops.py tests/test_console.py tests/test_losses.py tests/test_kernels.py tests/test_native.py"
    "tests/test_models.py tests/test_utils.py tests/test_data.py tests/test_ke.py tests/test_golden.py"
    "tests/test_hdemucs.py"
    "tests/test_export.py"
    "tests/test_train.py -k \"not mp_sharded and not dp_sharded and not bf16 and not curriculum_staging and not flatten and not fused_steps\""
    "tests/test_train.py -k fused_steps"
    "tests/test_train.py -k \"bf16 or curriculum_staging\""
    "tests/test_train.py -k flatten"
    "tests/test_train.py -k \"mp_sharded or dp_sharded\""
    "tests/test_scripts.py"
    "tests/test_cli.py::test_remixer_and_param_system"
    "tests/test_cli.py --deselect tests/test_cli.py::test_remixer_and_param_system"
)

fail=0
total_start=$SECONDS
for i in "${!CMDS[@]}"; do
    name="${NAMES[$i]}"
    start=$SECONDS
    echo "== chunk $((i + 1))/${#CMDS[@]}: $name"
    out=$(eval "timeout $CHUNK_TIMEOUT $PYTEST ${CMDS[$i]}" 2>&1)
    rc=$?
    tail_line=$(echo "$out" | grep -E "passed|failed|error" | tail -1)
    echo "   rc=$rc  $((SECONDS - start))s  ${tail_line:-no pytest summary}"
    if [[ $rc -ne 0 ]]; then
        fail=1
        echo "$out" | tail -40
    fi
done
echo "== total: $((SECONDS - total_start))s  $([[ $fail -eq 0 ]] && echo ALL CHUNKS PASSED || echo FAILURES ABOVE)"
exit $fail
