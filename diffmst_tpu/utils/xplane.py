"""Op-level profile extraction from jax.profiler xplane traces.

``jax.profiler.trace`` writes XSpace protobufs; TensorBoard's profile
plugin can digest them into per-HLO-op statistics without a TensorBoard
server. This module wraps that conversion so a training script (or the
Trainer's ``profile_steps`` hook) can turn a captured trace directly into
a committed JSON of the top-N ops by self time — the op-level evidence the
reference's (disabled) torch.profiler harness was meant to produce
(/root/reference/tests/test_profile.py:46-68).
"""

from __future__ import annotations

import csv
import glob
import io
import os
from typing import Dict, List

__all__ = ["find_xplane_files", "top_ops_from_trace"]


def find_xplane_files(trace_dir: str) -> List[str]:
    """All .xplane.pb files under a jax.profiler trace directory."""
    return sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    )


def top_ops_from_trace(trace_dir: str, top_n: int = 15) -> List[Dict]:
    """Top-N HLO ops by self time from the newest trace under ``trace_dir``.

    Returns a list of dicts (rank, op name/category/program, occurrences,
    self time us, % of total) sorted by self time. Requires
    ``tensorboard_plugin_profile`` (present in this image).
    """
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    paths = find_xplane_files(trace_dir)
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    data, _ctype = rtd.xspace_to_tool_data(paths, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", errors="replace")
    rows = list(csv.DictReader(io.StringIO(data)))

    def f(row, *names, default=0.0):
        for n in names:
            if n in row and row[n] not in ("", None):
                try:
                    return float(row[n])
                except ValueError:
                    pass
        return default

    total = sum(f(r, "total_self_time_us", "Total self time (us)") for r in rows)
    rows.sort(
        key=lambda r: f(r, "total_self_time_us", "Total self time (us)"),
        reverse=True,
    )
    out = []
    for i, r in enumerate(rows[:top_n]):
        self_us = f(r, "total_self_time_us", "Total self time (us)")
        out.append(
            {
                "rank": i + 1,
                "category": r.get("hlo_category", r.get("HLO category", "")),
                "op": (r.get("hlo_op_expression", r.get("HLO op expression", ""))
                       or r.get("hlo_op_name", ""))[:160],
                "occurrences": int(f(r, "occurrences", "#Occurrences")),
                "self_time_us": round(self_us, 1),
                "pct_of_total": round(100.0 * self_us / total, 1) if total else 0.0,
            }
        )
    return out
