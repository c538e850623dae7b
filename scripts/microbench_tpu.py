"""Microbenchmark the compressor smoothers + console on the TPU chip.

VERDICT round-1 item 3: measure fsm vs associative_scan vs Pallas at the
console hot-path shape (8 x 262,144), fwd and fwd+bwd, plus the full
AdvancedMixConsole under each smoother. Writes logs/microbench_tpu.json.

Run from /root/repo with the default (axon TPU) env:  python scripts/microbench_tpu.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from diffmst_tpu import ops
from diffmst_tpu.console import AdvancedMixConsole
from diffmst_tpu.console.ranges import advanced_param_ranges
from diffmst_tpu.utils.profiler import device_timer

SR = 44100.0
B, T = 8, 262144
SMOOTHERS = ["fsm", "scan", "scan_pallas", "fused_pallas", "decoupled", "decoupled_pallas"]

OUT_PATH = os.path.join("logs", "microbench_tpu.json")


def _persist(results):
    """Write partial results after every measurement: remote compiles can
    take minutes each and a killed run should not lose what already landed."""
    os.makedirs("logs", exist_ok=True)
    with open(OUT_PATH, "w") as f:
        json.dump(results, f, indent=1)


def _stamp(row):
    """Per-row capture timestamp: every row records when it was actually
    measured, so a partial refresh can never masquerade as a full one."""
    row["captured_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    return row



def bench_smoothers(results):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, 1, T), jnp.float32) * 0.1
    R = advanced_param_ranges(SR)["compressor"]
    ps = {
        k: jax.random.uniform(jax.random.fold_in(key, i), (B,), jnp.float32, lo, hi)
        for i, (k, (lo, hi)) in enumerate(R.items())
    }

    for sm in SMOOTHERS:
        if jax.default_backend() != "tpu" and "pallas" in sm:
            continue

        def fwd(args):
            xx, thr = args
            y = ops.compressor(
                xx, SR, **{**ps, "threshold_db": thr},
                lookahead_samples=2048, smoother=sm,
            )
            return (y, thr)

        t_fwd = device_timer(fwd, (x, ps["threshold_db"]), iters=10)

        def fwdbwd(args):
            xx, thr = args

            def loss(xx, thr):
                y = ops.compressor(
                    xx, SR, **{**ps, "threshold_db": thr},
                    lookahead_samples=2048, smoother=sm,
                )
                return jnp.sum(jnp.square(y))

            gx, gt = jax.grad(loss, argnums=(0, 1))(xx, thr)
            return (gx, gt)

        t_bwd = device_timer(fwdbwd, (x, ps["threshold_db"]), iters=10)
        results[f"compressor_{sm}"] = _stamp({
            "fwd_ms": round(t_fwd * 1e3, 3),
            "fwd_bwd_ms": round(t_bwd * 1e3, 3),
            "fwd_x_realtime": round(B * T / SR / t_fwd, 1),
        })
        _persist(results)
        print(sm, results[f"compressor_{sm}"], flush=True)


def bench_console(results):
    key = jax.random.PRNGKey(1)
    tracks = jax.random.normal(key, (1, 8, T), jnp.float32) * 10 ** (-48 / 20)
    k1, k2, k3 = jax.random.split(key, 3)
    tp = jax.random.uniform(k1, (1, 8, 27))
    fp = jax.random.uniform(k2, (1, 25))
    mp = jax.random.uniform(k3, (1, 26))

    variants = [
        ("fsm", {}),
        ("auto", {}),
        ("decoupled", {}),
        ("causal_pallas", {"comp_smoother": "fused_pallas",
                           "eq_method": "scan_pallas"}),
    ]
    for sm, extra in variants:
        console = AdvancedMixConsole(
            SR, **({"comp_smoother": sm} if not extra else extra)
        )

        def fwdbwd(args):
            tp_, mp_ = args

            def loss(tp_, mp_):
                out = console(tracks, tp_, fp, mp_, use_fx_bus=False)
                return jnp.sum(jnp.square(out.mix))

            g1, g2 = jax.grad(loss, argnums=(0, 1))(tp_, mp_)
            return (g1, g2)

        t = device_timer(fwdbwd, (tp, mp), iters=8)
        results[f"console_fwd_bwd_{sm}"] = _stamp({
            "ms": round(t * 1e3, 3),
            "x_realtime": round(T / SR / t, 1),
        })
        _persist(results)
        print("console", sm, results[f"console_fwd_bwd_{sm}"], flush=True)


def bench_console_16track_fx(results):
    """BASELINE stretch: 16-track chain incl. fx bus (65536-tap reverb)."""
    key = jax.random.PRNGKey(2)
    tracks = jax.random.normal(key, (1, 16, T), jnp.float32) * 10 ** (-48 / 20)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    tp = jax.random.uniform(k1, (1, 16, 27))
    fp = jax.random.uniform(k2, (1, 25))
    mp = jax.random.uniform(k3, (1, 26))
    console = AdvancedMixConsole(SR)

    def fwdbwd(args):
        tp_, fp_ = args

        def loss(tp_, fp_):
            out = console(tracks, tp_, fp_, mp, use_fx_bus=True, key=k4)
            return jnp.sum(jnp.square(out.mix))

        g1, g2 = jax.grad(loss, argnums=(0, 1))(tp_, fp_)
        return (g1, g2)

    t = device_timer(fwdbwd, (tp, fp), iters=4)
    results["console_16track_fx_fwd_bwd"] = _stamp({
        "ms": round(t * 1e3, 3),
        "x_realtime": round(T / SR / t, 1),
    })
    _persist(results)
    print("console 16-track+fx", results["console_16track_fx_fwd_bwd"], flush=True)


def main():
    """Optional argv selector: any of {smoothers, console, 16track} runs only
    those sections, MERGING into the existing logs/microbench_tpu.json (each
    row keeps its own captured_at, so partial refreshes stay honest)."""
    only = set(sys.argv[1:])
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    results = {"backend": jax.default_backend(), "shape": f"{B}x{T}",
               "captured_at": time.strftime("%Y-%m-%dT%H:%M:%S")}
    if only and os.path.exists(OUT_PATH):
        with open(OUT_PATH) as f:
            prior = json.load(f)
        prior.update(results)
        results = prior
    if not only or "smoothers" in only:
        bench_smoothers(results)
    if not only or "console" in only:
        bench_console(results)
    if not only or "16track" in only:
        bench_console_16track_fx(results)
    _persist(results)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
