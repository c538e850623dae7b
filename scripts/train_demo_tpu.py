"""On-chip training demo at the shipped TPU recipe (configs/models/naive+tpu).

Runs the REAL Trainer loop — background prefetch, honest sync-based
metering, deterministic probe validation, CSV-style logging — at the full
reference recipe shape (batch 4 x 8 tracks x 262,144 samples,
configs/data/medley+cambridge-8.yaml) and records sustained steps/sec plus
two loss trajectories:

  * the per-step TRAIN loss trail (noisy by construction: each Method-1
    step renders a fresh random-parameter reference mix,
    /root/reference/mst/system.py:221-263);
  * a PROBE curve: a fixed held-out set of stem batches evaluated every
    epoch with ``deterministic_val=True``, so every pass draws the SAME
    reference-mix parameters and the curve isolates model improvement from
    task-difficulty noise. A fixed "equal-gain sum" baseline (the naive
    no-model mix of the same probe stems against the same probe reference
    mixes) anchors the scale.

Data modes (DEMO_MODE env var):

  * ``device`` (default): a FRESH batch of stems is synthesized ON THE
    DEVICE per step (jax PRNG + one-pole spectral color via rfft) — no
    example ever repeats AND no host->device transfer throttles the run
    (the host-synthesized variant measured 0.5 steps/s through the dev
    tunnel vs 6 steps/s device-resident), so a falling probe curve cannot
    be memorization and the throughput stays at the device rate.
  * ``host``: fresh stems synthesized on the host per step and shipped
    through the prefetch thread — measures the tunnel-included pipeline.
  * ``fixed``: the round-3 fixed 4-batch pool, pre-placed on the device —
    the pure device-throughput configuration.

Writes logs/train_demo_tpu.json. Run from /root/repo on the TPU session:
    python scripts/train_demo_tpu.py [steps_per_epoch] [epochs]
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
from diffmst_tpu.mixing import naive_random_mix
from diffmst_tpu.models import MixStyleTransferModel
from diffmst_tpu.train import System, SystemConfig, Trainer
from diffmst_tpu.utils.audio import batch_stereo_peak_normalize

SR = 44100.0
BS, NT, T = 4, 8, 262144
SEED = 42  # Trainer default; deterministic val keys derive from SEED + 1


@jax.jit
def _synth_tracks(key):
    """Fresh spectrally-varied stems, entirely on device.

    White noise through a random one-pole color per track (applied in the
    frequency domain — loop-free), peak-normalized, staged at -48 dB like
    the dataset's headroom convention. Cheap next to the train step
    (~32 rffts of 2^18) and keyed, so every step sees unseen audio.
    """
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (BS, NT, T), jnp.float32)
    a = jax.random.uniform(k2, (BS, NT, 1), minval=0.0, maxval=0.95)
    h = (1.0 - a) / (
        1.0 - a * jnp.exp(-2j * jnp.pi * jnp.fft.rfftfreq(T)).astype(jnp.complex64)
    )
    x = jnp.fft.irfft(jnp.fft.rfft(x, axis=-1) * h, n=T, axis=-1)
    peak = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    return x / jnp.maximum(peak, 1e-9) * 10 ** (-48 / 20)


def _synth_tracks_host(rng):
    tracks = rng.normal(size=(BS, NT, T)).astype(np.float32)
    a = rng.uniform(0.0, 0.95, size=(BS, NT, 1)).astype(np.float32)
    H = (1.0 - a) / (
        1.0 - a * np.exp(-2j * np.pi * np.fft.rfftfreq(T)).astype(np.complex64)
    )
    tracks = np.fft.irfft(np.fft.rfft(tracks, axis=-1) * H, n=T, axis=-1)
    tracks = tracks.astype(np.float32)
    peak = np.abs(tracks).max(axis=-1, keepdims=True)
    return tracks / np.maximum(peak, 1e-9) * 10 ** (-48 / 20)


class SyntheticDM:
    """In-memory datamodule of non-repeating stem batches (see module doc).

    The val loader yields ``n_probe`` FIXED batches (device-synthesized from
    probe-specific keys, disjoint from the training stream); with the
    Trainer's ``deterministic_val`` each validation pass re-draws identical
    reference mixes, making the val curve comparable across epochs.
    """

    batch_size = BS

    def __init__(self, n_train, mode="device", n_probe=4, seed=0):
        self.mode = mode
        self.n_train = n_train
        self.n_probe = n_probe
        self.rng = np.random.default_rng(seed)
        self._zero_i = jnp.zeros((BS, NT), jnp.int32)
        self._zero_b = jnp.zeros((BS, NT), bool)
        # Method-1 generates its own reference mix; Batch.ref_mix is unused
        # but must exist with the right shape.
        self._zero_ref = jnp.zeros((BS, 2, T), jnp.float32)
        self._train_key = jax.random.PRNGKey(1000 + seed)
        self._probe_key = jax.random.PRNGKey(2000 + seed)
        self.pool = None
        if mode == "fixed":
            self.pool = [
                self._wrap(jax.device_put(jnp.asarray(_synth_tracks_host(self.rng))))
                for _ in range(4)
            ]

    def _wrap(self, tracks):
        return (tracks, self._zero_i, self._zero_i, self._zero_b,
                self._zero_ref, ["synthetic"] * BS)

    def probe_tracks(self, i):
        return _synth_tracks(jax.random.fold_in(self._probe_key, i))

    def train_dataloader(self):
        for i in range(self.n_train):
            if self.mode == "device":
                yield self._wrap(_synth_tracks(jax.random.fold_in(self._train_key, i)))
            elif self.mode == "host":
                yield self._wrap(_synth_tracks_host(self.rng))
            else:
                yield self.pool[i % len(self.pool)]

    def val_dataloader(self):
        for i in range(self.n_probe):
            yield self._wrap(self.probe_tracks(i))


class _CollectVal:
    def __init__(self):
        self.losses = []

    def on_log(self, tag, metrics):
        if tag == "val" and "loss" in metrics:
            self.losses.append(float(metrics["loss"]))


def _probe_baseline(dm, console, loss_fn, n_probe):
    """Loss of the no-model mix on the probe set: equal-gain mono sum of the
    model-visible half, peak-normalized, against the SAME deterministic
    reference mixes the probe validation renders (keys mirror
    Trainer._run_validation with deterministic_val: fold_in(SEED+1, i),
    then System._common's k_mix = split(key, 3)[0])."""

    @jax.jit
    def one(tracks, key):
        k_mix, _, _ = jax.random.split(key, 3)
        ref = naive_random_mix(
            tracks, console, k_mix,
            use_track_input_fader=False, use_track_eq=True,
            use_track_compressor=True, use_fx_bus=False,
            use_master_bus=True, use_output_fader=False,
        )
        ref_mix = batch_stereo_peak_normalize(ref.mix)
        middle = tracks.shape[-1] // 2
        ref_b = ref_mix[..., middle:]
        s = jnp.sum(tracks[..., middle:], axis=1)
        sum_b = batch_stereo_peak_normalize(jnp.stack([s, s], axis=1))
        return loss_fn(sum_b, ref_b)

    base = jax.random.PRNGKey(SEED + 1)
    vals = [
        float(one(dm.probe_tracks(i), jax.random.fold_in(base, i)))
        for i in range(n_probe)
    ]
    return float(np.mean(vals))


def main():
    steps_per_epoch = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    mode = os.environ.get("DEMO_MODE", "device")
    # Optimizer sweep knobs (VERDICT round-4 #4 — the round-4 curve's best
    # probe point was epoch 1 at lr 1e-4/"step", then a flat 3.70):
    lr = float(os.environ.get("DEMO_LR", "1e-4"))
    schedule = os.environ.get("DEMO_SCHEDULE", "step")
    out_path = os.environ.get("DEMO_OUT", "logs/train_demo_tpu.json")
    save_ckpt = os.environ.get("DEMO_SAVE_CKPT", "")  # dir: save final state
    print("backend:", jax.default_backend(), jax.devices(), "mode:", mode,
          "lr:", lr, "schedule:", schedule, flush=True)

    console = AdvancedMixConsole(SR)
    loss_fn = MultiResolutionSTFTLoss()
    system = System(
        MixStyleTransferModel.build(
            compute_dtype="bfloat16", remat_encoders=False
        ),
        console,
        loss_fn,
        SystemConfig(
            steps_per_epoch=steps_per_epoch, max_epochs=epochs, lr=lr,
            schedule=schedule,
            active_fx_bus_epoch=1000, adam_mu_dtype="bfloat16",
        ),
    )
    dm = SyntheticDM(steps_per_epoch, mode=mode)
    collect = _CollectVal()
    trainer = Trainer(
        system,
        dm,
        max_epochs=epochs,
        ckpt_dir="logs/train_demo_ckpt",
        log_every_n_steps=10,
        check_val_every_n_epoch=1,
        deterministic_val=True,  # same ref-mix draws every probe pass
        # a full-state orbax fetch is minutes per epoch over the tunnel and
        # checkpointing is already covered by tests + the e2e CLI fit
        enable_checkpointing=False,
        callbacks=[collect],
        seed=SEED,
    )
    baseline = _probe_baseline(dm, console, loss_fn, dm.n_probe)
    print(f"[probe] equal-gain-sum baseline loss = {baseline:.4f}", flush=True)

    # Untrained anchor: validate() inits from the SAME PRNGKey(seed) that
    # fit() uses (identical params) and runs the probe set before any
    # gradient step — so the probe curve starts at the untrained model and
    # the epoch-0 drop is attributable to learning, not noise. Also warms
    # the eval-graph compile cache for the per-epoch probes.
    untrained = trainer.validate()["loss"]
    print(f"[probe] untrained model loss = {untrained:.4f}", flush=True)

    t0 = time.time()
    state = trainer.fit()
    wall = time.time() - t0
    if save_ckpt:
        trainer.ckpt_dir = save_ckpt
        trainer._save_last(state, next_epoch=epochs)
        print(f"[ckpt] final state saved to {save_ckpt}/last", flush=True)

    losses = [h["loss"] for h in trainer.history if "loss" in h]
    sps = [h["steps_per_sec"] for h in trainer.history if "steps_per_sec" in h]
    third = max(1, len(losses) // 3)
    first_mean = float(np.mean(losses[:third])) if losses else float("nan")
    last_mean = float(np.mean(losses[-third:])) if losses else float("nan")
    probe = collect.losses
    summary = {
        "backend": jax.default_backend(),
        "shape": f"{BS}x{NT}x{T}",
        "recipe": "bf16 compute, no remat, Adam mu bf16 (configs/models/naive+tpu.yaml)",
        "lr": lr,
        "schedule": schedule,
        "data_mode": mode,
        "distinct_batches": (
            "fresh every step (device-synthesized)" if mode == "device"
            else "fresh every step (host)" if mode == "host" else 4
        ),
        "steps": int(state.step),
        "wall_s": round(wall, 1),
        "loss_trail": [round(float(x), 4) for x in losses],
        "smoothed_first_third": round(first_mean, 4),
        "smoothed_last_third": round(last_mean, 4),
        "loss_dropped": bool(losses and last_mean < first_mean),
        "probe": {
            "what": (
                f"{dm.n_probe} held-out fixed stem batches, deterministic "
                "ref-mix draws per pass (deterministic_val); first entry "
                "of curve = untrained model (pre-fit validate())"
            ),
            "equal_gain_sum_baseline": round(baseline, 4),
            "untrained_loss": round(untrained, 4),
            "curve": [round(x, 4) for x in probe],
            "first": round(probe[0], 4) if probe else None,
            "last": round(probe[-1], 4) if probe else None,
            "dropped": bool(probe and probe[-1] < probe[0]),
            "beats_baseline": bool(probe and probe[-1] < baseline),
        },
        "sustained_steps_per_sec": round(float(np.median(sps)), 3) if sps else None,
        "realtime_factor": (
            round(float(np.median(sps)) * BS * T / SR, 1) if sps else None
        ),
        "captured_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    os.makedirs("logs", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
