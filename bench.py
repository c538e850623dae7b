"""Headline benchmark: AdvancedMixConsole forward+backward realtime factor.

The BASELINE.json north-star metric: 8-track AdvancedMixConsole fwd+bwd per
chip, target >= 50x realtime @ 44.1 kHz. Measures the full differentiable
console (input fader -> 6-band EQ -> compressor(lookahead 2048) -> pan ->
stereo sum -> master EQ/comp/fader) at the reference profiler shape
(8 tracks x 262,144 samples, tests/test_profile.py:35-44) with gradients
w.r.t. all console parameters.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "x_realtime", "vs_baseline": N/50}
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from diffmst_tpu.console import AdvancedMixConsole

    sr = 44100.0
    bs, num_tracks, seq_len = 1, 8, 262144
    console = AdvancedMixConsole(sr)

    key = jax.random.PRNGKey(0)
    tracks = jax.random.normal(key, (bs, num_tracks, seq_len), jnp.float32)
    tracks = tracks * 10 ** (-48 / 20)
    k1, k2, k3 = jax.random.split(key, 3)
    tp = jax.random.uniform(k1, (bs, num_tracks, 27))
    fp = jax.random.uniform(k2, (bs, 25))
    mp = jax.random.uniform(k3, (bs, 26))
    target = jax.random.normal(key, (bs, 2, seq_len), jnp.float32) * 0.1

    def loss_fn(tp, mp, tracks):
        out = console(tracks, tp, fp, mp, use_fx_bus=False)
        return jnp.mean(jnp.square(out.mix - target))

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1))

    # Run K dependent steps inside ONE dispatch: the session reaches the TPU
    # through a tunnel whose per-call round-trip (tens of ms) would otherwise
    # swamp the ~ms device time. The loop carry feeds each step's grads into
    # the next step's params, so no iteration can be elided.
    K = 32

    @jax.jit
    def bench_k(tp, mp, tracks):
        def body(_, carry):
            tp, mp = carry
            loss, (gtp, gmp) = grad_fn(tp, mp, tracks)
            return (tp - 1e-6 * gtp, mp - 1e-6 * gmp)

        return jax.lax.fori_loop(0, K, body, (tp, mp))

    jax.block_until_ready(bench_k(tp, mp, tracks))  # compile + warm
    reps = 5
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(bench_k(tp, mp, tracks))
        times.append((time.perf_counter() - t0) / K)
    per_step = min(times)

    audio_seconds = bs * seq_len / sr
    realtime_factor = audio_seconds / per_step
    print(
        json.dumps(
            {
                "metric": "advanced_console_fwd_bwd_realtime_factor_8track",
                "value": round(realtime_factor, 1),
                "unit": "x_realtime",
                "vs_baseline": round(realtime_factor / 50.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
