"""Profiling + throughput instruments.

The reference's only profiling tool is a disabled torch.profiler script
(/root/reference/tests/test_profile.py, body behind ``if False:``). Here:

  * ``trace`` — context manager around ``jax.profiler`` producing an xplane
    dump viewable in TensorBoard/XProf.
  * ``Meter`` — steps/sec + audio-realtime-factor meter (the BASELINE.json
    metrics), with warmup skipping and percentile summaries.
  * ``device_timer`` — times K dependent iterations of a function inside ONE
    dispatch (lax.fori_loop) to exclude host/tunnel round-trip latency; this
    is how bench.py measures (per-dispatch latency through the axon tunnel is
    tens of ms and would otherwise dominate).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, List

import jax
import jax.numpy as jnp

__all__ = ["trace", "Meter", "device_timer"]


@contextlib.contextmanager
def trace(log_dir: str = "profiles"):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Meter:
    """Rolling steps/sec + realtime-factor meter."""

    def __init__(self, audio_seconds_per_step: float, warmup: int = 2,
                 window: int = 100) -> None:
        self.audio_seconds_per_step = audio_seconds_per_step
        self.warmup = warmup
        self.window = window
        self._times: List[float] = []
        self._last = None
        self._count = 0

    def tick(self) -> None:
        now = time.perf_counter()
        self._count += 1
        if self._last is not None and self._count > self.warmup:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {}
        ts = sorted(self._times)
        median = ts[len(ts) // 2]
        return {
            "steps_per_sec": 1.0 / median,
            "realtime_factor": self.audio_seconds_per_step / median,
            "p50_ms": median * 1e3,
            "p90_ms": ts[int(len(ts) * 0.9)] * 1e3,
        }


def device_timer(fn: Callable, example, iters: int = 20, reps: int = 5) -> float:
    """Seconds per iteration of ``fn`` measured inside one dispatch.

    ``fn`` must map its argument pytree to a same-shaped pytree (a scaled
    output works); the loop carry defeats DCE and inter-step overlap is
    preserved as on a real training loop.
    """

    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(
            0, iters, lambda i, a: jax.tree.map(lambda t: t * 0.999, fn(a)), x
        )

    jax.block_until_ready(loop(example))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(example))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best
