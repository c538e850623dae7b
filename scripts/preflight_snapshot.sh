#!/bin/bash
# End-of-round preflight (VERDICT round-4 #3): the driver's bench +
# multichip captures run on this single-core host right after the
# snapshot commit — any job left running starves them (round 4: a
# leftover run_tests.sh saturated the CPU through both capture windows
# and both artifacts died at rc=124).
#
# Asserts, before the snapshot commit:
#   1. no live pid recorded in /tmp/*.pid
#   2. no python process is chewing CPU other than the session's own
#      infrastructure (.tpu_init tunnel helper)
#   3. the persistent XLA compile cache is warm (bench.py and
#      __graft_entry__.py both point at it — a cold cache makes the
#      driver pay 10-20 min of compiles it does not have)
#   4. bench_result.json exists (bench.py prints it immediately on
#      startup, so even a timeout kill yields a parsed line)
#
# Exit 0 = safe to snapshot; nonzero = fix what it printed first.
set -u
fail=0

echo "== 1. pid files"
for f in /tmp/*.pid; do
    [ -e "$f" ] || continue
    pid=$(cat "$f" 2>/dev/null)
    if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then
        echo "FAIL: live job $pid from $f: $(ps -p "$pid" -o args= | head -c 120)"
        fail=1
    else
        echo "ok: $f is dead (cleaning up)"
        rm -f "$f"
    fi
done

echo "== 2. stray python processes"
# own process tree + the tunnel helper are fine; anything else burning
# CPU is a leftover job
while read -r pid pcpu args; do
    case "$args" in
        *".tpu_init"*) continue ;;
    esac
    [ "$pid" = "$$" ] && continue
    # skip our own ancestors (the shell running this script)
    if ps -o pid= --ppid "$pid" 2>/dev/null | grep -qw "$$"; then continue; fi
    if [ "${pcpu%.*}" -ge 20 ] 2>/dev/null; then
        echo "FAIL: python pid $pid at ${pcpu}% CPU: $(echo "$args" | head -c 120)"
        fail=1
    fi
done < <(ps -eo pid=,pcpu=,args= | awk '$3 ~ /python/ {print}')

echo "== 3. compile cache warmth"
cache="${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}"
n=$(find "$cache" -type f 2>/dev/null | wc -l)
if [ "$n" -lt 1 ]; then
    echo "FAIL: compile cache $cache is empty — run 'python bench.py' and the"
    echo "      dryrun once (see README 'End-of-round ritual') before snapshot"
    fail=1
else
    echo "ok: $n cached executables in $cache"
fi

echo "== 4. persisted bench result"
if [ -f "$(dirname "$0")/../bench_result.json" ]; then
    echo "ok: bench_result.json present"
else
    echo "FAIL: bench_result.json missing — run 'python bench.py' once"
    fail=1
fi

if [ "$fail" = 0 ]; then
    echo "PREFLIGHT PASS: safe to snapshot"
else
    echo "PREFLIGHT FAIL: fix the items above before the snapshot commit"
fi
exit "$fail"
