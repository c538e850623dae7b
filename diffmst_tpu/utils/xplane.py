"""Op-level profile extraction from jax.profiler xplane traces.

``jax.profiler.trace`` writes XSpace protobufs. The TensorBoard profile
plugin in this image has an incompatible TF binding, so this module parses
the XSpace directly (``tensorflow.tsl.profiler.protobuf.xplane_pb2``):
device planes hold one line per op stream whose events are HLO executions;
summing event durations per event name gives per-op totals — the op-level
evidence the reference's (disabled) torch.profiler harness was meant to
produce (/root/reference/tests/test_profile.py:46-68).
"""

from __future__ import annotations

import collections
import glob
import os
from typing import Dict, List

__all__ = ["find_xplane_files", "top_ops_from_trace"]


def find_xplane_files(trace_dir: str) -> List[str]:
    """All .xplane.pb files under a jax.profiler trace directory."""
    return sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    )


def _load_xspace(path: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())
    return xspace


def top_ops_from_trace(
    trace_dir: str,
    top_n: int = 15,
    device_substr: str = "TPU",
    include_async: bool = False,
) -> List[Dict]:
    """Top-N ops by accumulated duration on the device planes.

    Aggregates event durations per event name over every line of every
    plane whose name contains ``device_substr`` (falls back to the busiest
    non-host plane if none match, so CPU-backend traces work too).
    Returns dicts: rank, op, line (op stream), occurrences, total_ms,
    pct_of_total.
    """
    paths = find_xplane_files(trace_dir)
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")

    # op name -> [total_ps, occurrences, line_name, category, flops, bytes]
    agg: Dict[str, list] = collections.defaultdict(lambda: [0, 0, "", "", 0, 0])
    planes_seen = []
    for path in paths:
        xspace = _load_xspace(path)
        planes = [p for p in xspace.planes if device_substr in p.name]
        if not planes:
            nonhost = [p for p in xspace.planes if "Host" not in p.name
                       and "host" not in p.name]
            if nonhost:
                planes = [max(
                    nonhost,
                    key=lambda p: sum(len(ln.events) for ln in p.lines),
                )]
        for plane in planes:
            planes_seen.append(plane.name)
            meta = plane.event_metadata
            stat_names = {k: v.name for k, v in plane.stat_metadata.items()}

            def _meta_stats(m):
                cat, fl, by = "", 0, 0
                for s in m.stats:
                    n = stat_names.get(s.metadata_id, "")
                    if n == "hlo_category":
                        cat = s.str_value
                    elif n == "flops":
                        fl = s.int64_value
                    elif n == "bytes_accessed":
                        by = s.int64_value
                return cat, fl, by
            # prefer the per-op stream; "XLA Modules" (whole-program spans)
            # and step lines would double-count every op's time. "Async XLA
            # Ops" (DMA issue->complete spans) OVERLAP the compute stream —
            # on a traced bs=4 train step their summed duration exceeded
            # wall time 2x — so they are excluded from the self-time totals
            # unless explicitly requested via include_async.
            op_lines = [
                ln for ln in plane.lines
                if "XLA Ops" in ln.name
                and (include_async or "Async" not in ln.name)
            ]
            for line in op_lines or plane.lines:
                for ev in line.events:
                    m = meta.get(ev.metadata_id)
                    name = (m.display_name or m.name) if m else str(ev.metadata_id)
                    a = agg[name]
                    a[0] += ev.duration_ps
                    a[1] += 1
                    a[2] = line.name
                    if m is not None and not a[3]:
                        a[3], a[4], a[5] = _meta_stats(m)
    if not agg:
        raise ValueError(
            f"no device events found (planes: {planes_seen or 'none'})"
        )
    total_ps = sum(a[0] for a in agg.values())
    rows = sorted(agg.items(), key=lambda kv: kv[1][0], reverse=True)
    return [
        {
            "rank": i + 1,
            "op": name[:160],
            "line": a[2],
            "category": a[3],
            "occurrences": a[1],
            "total_ms": round(a[0] / 1e9, 3),
            "pct_of_total": round(100.0 * a[0] / total_ps, 1) if total_ps else 0.0,
            # per-occurrence costs from the compiler's cost model: achieved
            # bandwidth = gbytes_per_call / (total_ms/occurrences) roofline
            "gflops_per_call": round(a[4] / 1e9, 3),
            "gbytes_per_call": round(a[5] / 1e9, 4),
        }
        for i, (name, a) in enumerate(rows[:top_n])
    ]


def category_breakdown_from_trace(
    trace_dir: str, device_substr: str = "TPU"
) -> List[Dict]:
    """Device time grouped by the compiler's hlo_category (convolution,
    all-reduce fusion, loop fusion, ...): the where-does-the-step-go view."""
    rows = top_ops_from_trace(trace_dir, top_n=10**6, device_substr=device_substr)
    agg: Dict[str, list] = collections.defaultdict(lambda: [0.0, 0, 0.0])
    for r in rows:
        a = agg[r["category"] or "(uncategorized)"]
        a[0] += r["total_ms"]
        a[1] += r["occurrences"]
        a[2] += r["gflops_per_call"] * r["occurrences"]
    total_ms = sum(a[0] for a in agg.values())
    out = sorted(agg.items(), key=lambda kv: kv[1][0], reverse=True)
    return [
        {
            "category": cat,
            "total_ms": round(a[0], 3),
            "pct_of_total": round(100.0 * a[0] / total_ms, 1) if total_ms else 0.0,
            "occurrences": a[1],
            "total_gflops": round(a[2], 1),
        }
        for cat, a in out
    ]


if __name__ == "__main__":
    import json
    import sys

    print(json.dumps(top_ops_from_trace(sys.argv[1]), indent=1))
