"""Stage breakdown of the full-song inference path on the TPU.

Writes logs/inference_breakdown_tpu.json with:

  * cold-song wall (fresh array identity -> includes the one-time stem
    upload through the tunnel);
  * steady-state wall (device track cache hit, host-side output) — the
    committed BENCH metric;
  * device-resident wall (``return_device=True``: the rendered mix stays
    on device, as a loss/feature pipeline would consume it) — isolates the
    device->host copy of the full song, which through the dev tunnel is
    the largest steady-state cost;
  * model-analysis wall (the controller/encoder call alone).

Reference path being matched: /root/reference/mst/utils.py:123-166
(run_diffmst analysis + Hann OLA render).

Run from /root/repo on the TPU session:
    python scripts/profile_inference.py [song_seconds]
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
from diffmst_tpu.models import MixStyleTransferModel
from diffmst_tpu.utils.inference import run_diffmst

SR = 44100.0


def main():
    song_seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    total = int(song_seconds * SR)
    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    rng = np.random.default_rng(0)
    tracks = (rng.normal(size=(1, 8, total)) * 0.05).astype("float32")
    ref = (rng.normal(size=(1, 2, 262144)) * 0.1).astype("float32")

    model = MixStyleTransferModel.build()
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.asarray(tracks[:, :2, :262144]),
        jnp.asarray(ref),
        jnp.zeros((1, 2), bool),
    )
    _apply = jax.jit(model.apply)
    apply = lambda t, r: _apply(variables, t, r)  # noqa: E731
    console = AdvancedMixConsole(SR)

    def timed(fn, reps=3):
        """fn must synchronize internally (host output or block_until_ready)."""
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    # compile + warm (also uploads the stems into the device track cache)
    run_diffmst(tracks, ref, apply, console)

    steady = timed(lambda: run_diffmst(tracks, ref, apply, console)[0])
    device_res = timed(
        lambda: jax.block_until_ready(
            run_diffmst(tracks, ref, apply, console, return_device=True)[0]
        )
    )

    # model analysis alone (device-cached inputs, params as args)
    ta = jnp.asarray(tracks[:, :, :262144])
    ra = jnp.asarray(ref)
    jax.block_until_ready(apply(ta, ra))
    t0 = time.perf_counter()
    jax.block_until_ready(apply(ta, ra))
    analysis = time.perf_counter() - t0

    fresh = tracks.copy()
    t0 = time.perf_counter()
    mix2, *_ = run_diffmst(fresh, ref, apply, console)
    cold = time.perf_counter() - t0
    assert mix2.shape[-1] == total

    summary = {
        "song_seconds": song_seconds,
        "inference_realtime_factor_8track_60s": round(song_seconds / steady, 1),
        "device_resident_realtime_factor": round(song_seconds / device_res, 1),
        "cold_song_realtime_factor": round(song_seconds / cold, 1),
        "steady_wall_s": round(steady, 3),
        "device_resident_wall_s": round(device_res, 3),
        "cold_song_wall_s": round(cold, 3),
        "stages": {
            "model_analysis_s": round(analysis, 3),
            "mix_download_s": round(steady - device_res, 3),
        },
        "note": (
            "steady = device-cached stems, host output; device_resident = "
            "return_device=True (the serving/eval pattern that consumes the "
            "mix on device); their difference is the full-song device->host "
            "copy (tunnel-bound here, ~30 ms PCIe on a real TPU VM); cold = "
            "first render of a song incl. the one-time stem upload"
        ),
        "captured_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    os.makedirs("logs", exist_ok=True)
    with open("logs/inference_breakdown_tpu.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
