"""Measured KE-Method-1 training step on the TPU (VERDICT round-4 #7).

The reference trains Method 1 with either mix fn (mst/system.py:72-80);
the naive path is benched everywhere (bench.py train rows). This measures
the OTHER path at the same flagship recipe shape (batch 4 x 8 x 262,144,
bf16 compute, Adam mu bf16): `knowledge_engineering_mix` as the System's
``mix_fn`` — per-step host-side parameter sampling from the vendored KE
YAML (train/system.py::_host_sample_ke) + jitted console render/model/
loss/Adam on device. Unlike the naive rows there is no K-fused dispatch
(the host sampling IS the per-step boundary), so the number includes one
tunnel round-trip per step — i.e. it is a lower bound for a real TPU VM.

Writes logs/ke_step_tpu.json. Run from /root/repo on the TPU session:
    python scripts/ke_step_tpu.py [n_steps]
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
from diffmst_tpu.mixing import knowledge_engineering_mix
from diffmst_tpu.models import MixStyleTransferModel
from diffmst_tpu.train import Batch, System, SystemConfig

SR = 44100.0
BS, NT, T = 4, 8, 262144


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    print("backend:", jax.default_backend(), flush=True)

    system = System(
        MixStyleTransferModel.build(compute_dtype="bfloat16"),
        AdvancedMixConsole(SR),
        MultiResolutionSTFTLoss(),
        SystemConfig(
            steps_per_epoch=100, max_epochs=100,
            adam_mu_dtype="bfloat16", active_fx_bus_epoch=1000,
        ),
        mix_fn=knowledge_engineering_mix,
    )
    # instrument ids drawn from the vendored lookup so the KE rules engage
    # on real instrument names (not the unknown-track fallback)
    ids = sorted(system.instrument_number_lookup.values())[:NT]
    key = jax.random.PRNGKey(0)
    batch = Batch(
        tracks=jax.random.normal(key, (BS, NT, T), jnp.float32) * 10 ** (-48 / 20),
        instrument_id=jnp.asarray(np.tile(np.array(ids, np.int32), (BS, 1))),
        stereo_info=jnp.zeros((BS, NT), jnp.int32),
        track_padding=jnp.zeros((BS, NT), bool),
        ref_mix=jnp.zeros((BS, 2, T), jnp.float32),
    )
    state = system.init(jax.random.PRNGKey(1), batch)
    # donate=True: the direct-dispatch step (donate=False is the fused
    # trainer's request, which a host-side mix_fn rejects by design)
    step = system.make_train_step(system.effect_flags(0), donate=True)

    # compile + warm (the step donates its input state: carry the output)
    t0 = time.time()
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    first_loss = float(metrics["loss"])  # data-read fence
    compile_s = time.time() - t0
    assert np.isfinite(first_loss)

    t0 = time.time()
    losses = []
    for i in range(n_steps):
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
        losses.append(float(metrics["loss"]))  # fence: device->host read
    wall = time.time() - t0
    sps = n_steps / wall

    summary = {
        "backend": jax.default_backend(),
        "what": (
            "Method-1 train step with knowledge_engineering_mix as mix_fn "
            "(host-side per-step KE sampling + jitted device step); "
            "reference trains Method 1 with either mix fn, "
            "mst/system.py:72-80"
        ),
        "shape": f"{BS}x{NT}x{T}",
        "recipe": "bf16 compute, Adam mu bf16 (configs/models/naive+tpu.yaml)",
        "steps": n_steps,
        "steps_per_sec": round(sps, 3),
        "realtime_factor": round(sps * BS * T / SR, 1),
        "per_step_host_sampling_included": True,
        "losses_finite": bool(np.isfinite(losses).all()),
        "loss_first": round(losses[0], 4),
        "loss_last": round(losses[-1], 4),
        "compile_plus_first_step_s": round(compile_s, 1),
        "captured_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    os.makedirs("logs", exist_ok=True)
    with open("logs/ke_step_tpu.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
