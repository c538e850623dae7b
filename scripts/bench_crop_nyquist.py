"""Measure the work-preserving encoder lever: crop_nyquist_bin (1025 -> 1024).

VERDICT round-3 weak #4: the train step is conv-bound and Cnn14 block 1's
activations at 1025 spectrogram bins force a 2x sublane pad. Unlike the
refuted min_width=128 experiment (which QUADRUPLED block-1 work), dropping
the single Nyquist bin preserves the FLOP count exactly — 1024 is a power
of two, the pooled shapes are unchanged, ported torch weights still load,
and the only numerical deviation is the missing Nyquist-bin energy
(flag default OFF; see models/encoders.py).

Measures the shipped bf16 recipe train step (4 x 8 x 262,144) with
crop_nyquist_bin False (parity default) vs True and writes
logs/crop_nyquist_tpu.json — deciding the flag's worth with data either way.

Run from /root/repo on the TPU session: python scripts/bench_crop_nyquist.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import _fence  # the data-read execution fence


def bench(crop):
    from diffmst_tpu.console import AdvancedMixConsole
    from diffmst_tpu.losses import MultiResolutionSTFTLoss
    from diffmst_tpu.models import MixStyleTransferModel
    from diffmst_tpu.train import Batch, System, SystemConfig

    sr = 44100.0
    bs, num_tracks, seq_len = 4, 8, 262144
    system = System(
        MixStyleTransferModel.build(
            compute_dtype="bfloat16", crop_nyquist_bin=crop
        ),
        AdvancedMixConsole(sr),
        MultiResolutionSTFTLoss(),
        SystemConfig(
            steps_per_epoch=100, max_epochs=100, adam_mu_dtype="bfloat16"
        ),
    )
    key = jax.random.PRNGKey(0)
    batch = Batch(
        tracks=jax.random.normal(key, (bs, num_tracks, seq_len), jnp.float32)
        * 10 ** (-48 / 20),
        instrument_id=jnp.zeros((bs, num_tracks), jnp.int32),
        stereo_info=jnp.zeros((bs, num_tracks), jnp.int32),
        track_padding=jnp.zeros((bs, num_tracks), bool),
        ref_mix=jax.random.normal(key, (bs, 2, seq_len), jnp.float32) * 0.1,
    )
    state = system.init(jax.random.PRNGKey(1), batch)
    step = system.make_train_step(system.effect_flags(0), donate=False)

    K = 4

    @jax.jit
    def bench_k(state):
        def body(i, carry):
            new, _ = step(carry, batch, jax.random.fold_in(jax.random.PRNGKey(2), i))
            return new

        return jax.lax.fori_loop(0, K, body, state)

    _fence(jax, jnp, bench_k(state))  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _fence(jax, jnp, bench_k(state))
        times.append((time.perf_counter() - t0) / K)
    per_step = min(times)
    return {
        "steps_per_sec": round(1.0 / per_step, 3),
        "realtime_factor": round((bs * seq_len / sr) / per_step, 1),
        "captured_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    out = {"backend": jax.default_backend(), "shape": "4x8x262144",
           "recipe": "bf16 compute, no remat, Adam mu bf16"}
    for crop in (False, True):
        tag = f"crop_nyquist_{crop}"
        out[tag] = bench(crop)
        print(f"{tag}:", out[tag], flush=True)
    a = out["crop_nyquist_False"]["steps_per_sec"]
    b = out["crop_nyquist_True"]["steps_per_sec"]
    out["speedup_crop_vs_parity"] = round(b / a, 3)
    os.makedirs("logs", exist_ok=True)
    with open("logs/crop_nyquist_tpu.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
