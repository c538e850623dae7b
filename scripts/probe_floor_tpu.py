"""Oracle floor for the train-demo probe curve (VERDICT round-4 #4).

The round-4 convergence artifact (logs/train_demo_tpu.json) plateaus at
probe loss ~3.70 after dipping to 3.39 at epoch 1. This script computes the
ACHIEVABLE floor of that probe construction: the loss of the *oracle*
parameters — the exact normalized params that generated each probe
reference mix (naive_random_mix returns them; reference mixing.py:61-94) —
rendered the way the evaluation renders the model's prediction:

  * the eval renders the SECOND HALF of the stems only (the reference mix
    was rendered full-length then cropped, so the compressor's smoother
    state and the EQ's FFT block edges differ at the crop boundary);
  * the reference mix is batch-peak-normalized (train/system.py::_common)
    while the prediction is not, so the oracle must express the 1/peak
    scale through the output fader (folded into the compressor makeup gain
    in physical dB, console/console.py:332-336 — an exact linear
    post-scale); the needed dB is reported to confirm it sits inside the
    fader's +/-48 dB range, i.e. the floor is reachable by a parameter
    vector the controller could emit;
  * the ref was generated WITHOUT track input fader / output fader
    (system.py:235,241), so the oracle sets the track fader slot to
    normalized 0.5 (= 0 dB) and the output fader to the peak-compensation
    gain.

Three floors are reported:
  * ``floor_half_render``: oracle params, half-length render, fader set to
    the exact compensation gain even when that exceeds the fader's range —
    the CONSTRUCTION floor (includes the boundary mismatch).
  * ``floor_half_render_clipped``: same but the output fader clipped to
    its legal +/-48 dB — the floor a parameter vector the controller could
    actually emit can reach (first measurement showed some probe items
    need up to +75 dB because the random ref mix can peak at ~2e-4, so the
    legal-fader floor is the honest target for the model).
  * ``floor_full_render_crop``: oracle params rendered full-length, scaled,
    then cropped — isolates numerical noise only (should be ~0); the gap
    to floor_half_render IS the boundary effect.

Writes logs/probe_floor_tpu.json. Run from /root/repo on the TPU session:
    python scripts/probe_floor_tpu.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from diffmst_tpu.console import AdvancedMixConsole
from diffmst_tpu.console.ranges import normalize
from diffmst_tpu.losses import MultiResolutionSTFTLoss
from diffmst_tpu.mixing import naive_random_mix
from diffmst_tpu.utils.audio import batch_stereo_peak_normalize

from train_demo_tpu import SEED, SR, SyntheticDM, _probe_baseline

# Eval-time effect flags of the demo recipe (active_fx_bus_epoch=1000):
FLAGS = dict(
    use_track_eq=True, use_track_compressor=True,
    use_fx_bus=False, use_master_bus=True,
)


def main():
    print("backend:", jax.default_backend(), flush=True)
    console = AdvancedMixConsole(SR)
    loss_fn = MultiResolutionSTFTLoss()
    dm = SyntheticDM(1)  # only the probe set is used

    @jax.jit
    def floors(tracks, key):
        # Mirror Trainer._run_validation + System._common key discipline:
        # fold_in(SEED+1, i) is done by the caller; _common splits 3.
        k_mix, _k_model, k_render = jax.random.split(key, 3)
        ref = naive_random_mix(
            tracks, console, k_mix,
            use_track_input_fader=False, use_output_fader=False, **FLAGS,
        )
        peak = jnp.max(jnp.abs(ref.mix), axis=(-2, -1))  # (bs,)
        ref_mix = batch_stereo_peak_normalize(ref.mix)
        middle = tracks.shape[-1] // 2
        ref_b = ref_mix[..., middle:]

        # Oracle normalized params: true sampled params + unity track fader
        # + output fader expressing the 1/peak normalization gain.
        need_db = -20.0 * jnp.log10(jnp.maximum(peak, 1e-8))  # (bs,)
        tp = ref.track_params.at[..., 0].set(0.5)
        mp = ref.master_bus_params.at[..., 24].set(
            normalize(need_db, -48.0, 48.0)
        )
        mp_clip = ref.master_bus_params.at[..., 24].set(
            normalize(jnp.clip(need_db, -48.0, 48.0), -48.0, 48.0)
        )

        render_kwargs = dict(
            use_track_input_fader=True, use_output_fader=True,
            key=k_render, **FLAGS,
        )
        # (a) the eval's render: second half only
        half = console(tracks[..., middle:], tp, ref.fx_bus_params, mp,
                       **render_kwargs)
        floor_half = loss_fn(half.mix, ref_b)
        # (a') same render but with the fader inside its legal range
        half_c = console(tracks[..., middle:], tp, ref.fx_bus_params,
                         mp_clip, **render_kwargs)
        floor_half_clip = loss_fn(half_c.mix, ref_b)
        # (b) full-length render, cropped — no boundary mismatch
        full = console(tracks, tp, ref.fx_bus_params, mp, **render_kwargs)
        floor_full = loss_fn(full.mix[..., middle:], ref_b)
        return floor_half, floor_half_clip, floor_full, need_db

    base = jax.random.PRNGKey(SEED + 1)
    rows = []
    for i in range(dm.n_probe):
        t0 = time.time()
        fh, fhc, ff, need_db = floors(
            dm.probe_tracks(i), jax.random.fold_in(base, i)
        )
        rows.append({
            "probe_batch": i,
            "floor_half_render": round(float(fh), 4),
            "floor_half_render_clipped": round(float(fhc), 4),
            "floor_full_render_crop": round(float(ff), 4),
            "output_fader_needed_db": [round(float(d), 2) for d in need_db],
            "wall_s": round(time.time() - t0, 1),
        })
        print(rows[-1], flush=True)

    baseline = _probe_baseline(dm, console, loss_fn, dm.n_probe)
    fh_mean = float(np.mean([r["floor_half_render"] for r in rows]))
    fhc_mean = float(np.mean([r["floor_half_render_clipped"] for r in rows]))
    ff_mean = float(np.mean([r["floor_full_render_crop"] for r in rows]))
    max_db = max(abs(d) for r in rows for d in r["output_fader_needed_db"])
    summary = {
        "backend": jax.default_backend(),
        "what": (
            "probe-loss of the ORACLE params that generated each probe "
            "reference mix, rendered as the eval renders predictions "
            "(second-half stems, faders expressing the peak-normalization "
            "gain) — the achievable floor of logs/train_demo_tpu.json's "
            "probe curve"
        ),
        "probe_batches": rows,
        "floor_half_render_mean": round(fh_mean, 4),
        "floor_half_render_clipped_mean": round(fhc_mean, 4),
        "floor_full_render_crop_mean": round(ff_mean, 4),
        "boundary_effect": round(fh_mean - ff_mean, 4),
        "equal_gain_sum_baseline": round(float(baseline), 4),
        "output_fader_within_range": bool(max_db <= 48.0),
        "max_abs_needed_db": round(float(max_db), 2),
        "round4_model_context": {
            "untrained": 9.598, "epoch1": 3.395, "plateau": 3.70,
            "source": "logs/train_demo_tpu.json (round 4)",
        },
        "captured_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    os.makedirs("logs", exist_ok=True)
    with open("logs/probe_floor_tpu.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
