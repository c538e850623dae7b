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
    trace_dir: str, top_n: int = 15, device_substr: str = "TPU"
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

    # op name -> [total_ps, occurrences, line_name]
    agg: Dict[str, list] = collections.defaultdict(lambda: [0, 0, ""])
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
            # prefer the per-op stream; "XLA Modules" (whole-program spans)
            # and step lines would double-count every op's time
            op_lines = [ln for ln in plane.lines if "XLA Ops" in ln.name]
            for line in op_lines or plane.lines:
                for ev in line.events:
                    m = meta.get(ev.metadata_id)
                    name = (m.display_name or m.name) if m else str(ev.metadata_id)
                    a = agg[name]
                    a[0] += ev.duration_ps
                    a[1] += 1
                    a[2] = line.name
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
            "occurrences": a[1],
            "total_ms": round(a[0] / 1e9, 3),
            "pct_of_total": round(100.0 * a[0] / total_ps, 1) if total_ps else 0.0,
        }
        for i, (name, a) in enumerate(rows[:top_n])
    ]


if __name__ == "__main__":
    import json
    import sys

    print(json.dumps(top_ops_from_trace(sys.argv[1]), indent=1))
