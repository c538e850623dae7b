"""Op-level train-step profile + variant timing on the TPU.

Round-2 judge ask (VERDICT #3): capture an xplane trace of the shipped
bs=4 bf16+remat train step, name the top ops, and measure candidate
improvements. Writes:

  * logs/train_step_top_ops.json — top-15 HLO ops by self time
    (utils/xplane.py over a jax.profiler trace of 3 steps);
  * logs/train_step_variants.json — steps/sec for each variant tried.

Run from /root/repo on the TPU session:
    python scripts/profile_train_xplane.py [variant ...]
variants: base (bf16+remat+donated state — the shipped recipe), noremat
          (bf16, donated, no remat), noremat_mubf16 (noremat + Adam mu in
          bf16 for HBM headroom), nodonate (bf16+remat, donate=False).
Default: base + trace (set DIFFMST_TRACE=0 to skip the trace).

Timing protocol (learned the hard way — see PERF.md "per-dispatch
measurement footgun"): a 6-step per-dispatch timing taken immediately
after the cold compile reads ~0.55 steps/s regardless of donation, 6x
under the Trainer's sustained 3.56. So this script (a) warms up several
steps after compile, (b) times trainer-style windows (async dispatch,
sync on the last step's metrics) and reports the best window, and (c)
also times a fused lax.fori_loop K-step dispatch like bench.py.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
# log persistent-cache hits/misses/write-skips (a 27 min recompile that
# silently failed to cache cost an hour before this was turned on)
os.environ.setdefault("JAX_DEBUG_LOG_MODULES", "jax._src.compilation_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from diffmst_tpu.console import AdvancedMixConsole
from diffmst_tpu.losses import MultiResolutionSTFTLoss
from diffmst_tpu.models import MixStyleTransferModel
from diffmst_tpu.train import Batch, System, SystemConfig

SR = 44100.0
BS, NT, T = 4, 8, 262144


def build(remat: bool, donate: bool, mu_dtype=None, remat_blocks=0,
          flatten=False):
    system = System(
        MixStyleTransferModel.build(
            compute_dtype="bfloat16",
            remat_encoders=remat and not remat_blocks,
            remat_blocks=remat_blocks,
        ),
        AdvancedMixConsole(SR),
        MultiResolutionSTFTLoss(),
        SystemConfig(steps_per_epoch=100, max_epochs=100,
                     adam_mu_dtype=mu_dtype, flatten_optimizer=flatten),
    )
    key = jax.random.PRNGKey(0)
    batch = Batch(
        tracks=jax.random.normal(key, (BS, NT, T), jnp.float32) * 10 ** (-48 / 20),
        instrument_id=jnp.zeros((BS, NT), jnp.int32),
        stereo_info=jnp.zeros((BS, NT), jnp.int32),
        track_padding=jnp.zeros((BS, NT), bool),
        ref_mix=jax.random.normal(key, (BS, 2, T), jnp.float32) * 0.1,
    )
    state = system.init(jax.random.PRNGKey(1), batch)
    step = system.make_train_step(system.effect_flags(0), donate=donate)
    return system, state, batch, step


def time_steps(step, state, batch, donate: bool, warmup=4, window=8,
               windows=3):
    """Best-window per-dispatch steps/sec (the Trainer's dispatch pattern).

    Windows synchronize by FETCHING the last step's loss (``float(...)``,
    a real device->host data read), exactly like the Trainer's metric
    logging. ``jax.block_until_ready`` is NOT a usable fence on the axon
    remote backend: a block_until_ready-fenced window once measured 310
    "steps"/s — pure dispatch rate — while the fused fori_loop measured
    3.48 on the same process."""
    key = jax.random.PRNGKey(2)
    state, m = step(state, batch, key)  # compile
    float(m["loss"])
    i = 0
    for _ in range(warmup):  # post-compile settle (allocator, caches)
        state, m = step(state, batch, jax.random.fold_in(key, i))
        i += 1
    float(m["loss"])
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(window):
            state, m = step(state, batch, jax.random.fold_in(key, i))
            i += 1
        float(m["loss"])  # data fetch = true sync
        best = min(best, (time.perf_counter() - t0) / window)
    return 1.0 / best, state


def time_steps_fused(step, state, batch, k=4):
    """K steps fused into one dispatch (bench.py's harness): removes all
    per-dispatch host/tunnel overhead; donation inside the trace is a
    no-op, so this is the pure device-compute rate."""
    key = jax.random.PRNGKey(5)

    @jax.jit
    def bench_k(state, batch):
        def body(i, carry):
            new_state, _ = step(carry, batch, jax.random.fold_in(key, i))
            return new_state

        return jax.lax.fori_loop(0, k, body, state)

    def fence(out):
        # data-fetch fence (see time_steps docstring): read one element of
        # one result leaf — its slice op executes after the whole loop
        leaf = jax.tree.leaves(out)[0]
        return float(jnp.ravel(leaf)[0])

    fence(bench_k(state, batch))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fence(bench_k(state, batch))
        best = min(best, (time.perf_counter() - t0) / k)
    return 1.0 / best


def main():
    variants = sys.argv[1:] or ["base"]
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    os.makedirs("logs", exist_ok=True)
    results = {}
    if os.path.exists("logs/train_step_variants.json"):
        with open("logs/train_step_variants.json") as f:
            results = json.load(f)

    for v in variants:
        remat = not v.startswith("noremat")
        donate = v != "nodonate"
        mu_dtype = "bfloat16" if "mubf16" in v else None
        # "rematblkN[_mubf16]": selective remat of the first N Cnn14 blocks
        remat_blocks = int(v.split("rematblk")[1][0]) if "rematblk" in v else 0
        flatten = v.endswith("_flat")  # optax.flatten'd optimizer state
        print(
            f"== variant {v} (remat={remat} donate={donate} mu={mu_dtype} "
            f"blocks={remat_blocks} flat={flatten})",
            flush=True,
        )
        try:
            t0 = time.perf_counter()
            system, state, batch, step = build(remat, donate, mu_dtype,
                                               remat_blocks, flatten)
            sps, state = time_steps(step, state, batch, donate)
            results[v] = {
                "steps_per_sec": round(sps, 3),
                "realtime_factor": round(sps * BS * T / SR, 1),
                "build_and_compile_s": round(time.perf_counter() - t0, 1),
                "captured_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
            }
            print(v, "windowed:", results[v], flush=True)
            with open("logs/train_step_variants.json", "w") as f:
                json.dump(results, f, indent=1)  # persist before slow fused run
            # the fused fori_loop harness is a fresh ~30 min XLA compile per
            # graph, so only selected variants pay for it (default: the
            # shipped recipe; DIFFMST_FUSED=a,b to fused-time others)
            if v in os.environ.get("DIFFMST_FUSED", "base").split(","):
                try:
                    sps_fused = time_steps_fused(step, state, batch)
                    results[v]["steps_per_sec_fused"] = round(sps_fused, 3)
                    results[v]["realtime_factor_fused"] = round(
                        sps_fused * BS * T / SR, 1
                    )
                except Exception as exc:
                    results[v]["fused_error"] = f"{type(exc).__name__}: {exc}"
            print(v, results[v], flush=True)
            with open("logs/train_step_variants.json", "w") as f:
                json.dump(results, f, indent=1)
        except Exception as exc:
            results[v] = {"error": f"{type(exc).__name__}: {exc}"}
            print(v, "FAILED:", exc, flush=True)
            with open("logs/train_step_variants.json", "w") as f:
                json.dump(results, f, indent=1)
            continue

        trace_target = os.environ.get("DIFFMST_TRACE_VARIANT", "base")
        if v == trace_target and os.environ.get("DIFFMST_TRACE", "1") != "0":
            # trace/parse failures must not clobber the timing result
            # (a KeyError here once erased base's measurement)
            try:
                trace_dir = "logs/xplane_train"
                key = jax.random.PRNGKey(3)
                jax.profiler.start_trace(trace_dir)
                for i in range(3):
                    state, m = step(state, batch, jax.random.fold_in(key, i))
                jax.block_until_ready(m["loss"])
                jax.profiler.stop_trace()
                from diffmst_tpu.utils.xplane import top_ops_from_trace

                top = top_ops_from_trace(trace_dir, top_n=15)
                with open("logs/train_step_top_ops.json", "w") as f:
                    json.dump(
                        {"shape": f"{BS}x{NT}x{T}", "recipe": f"bf16 variant={v}",
                         "steps_traced": 3,
                         "steps_per_sec_at_capture": results[v]["steps_per_sec"],
                         "top_ops": top,
                         "captured_at": time.strftime("%Y-%m-%dT%H:%M:%S")},
                        f, indent=1,
                    )
                for r in top[:10]:
                    print(f"  {r['pct_of_total']:5.1f}% {r['line']:<12} "
                          f"{r['op'][:80]}", flush=True)
            except Exception as exc:
                print("trace FAILED:", exc, flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
