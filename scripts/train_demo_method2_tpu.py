"""On-chip Method-2 training demo: unpaired real reference + AudioFeatureLoss.

Method 2 (/root/reference/README.md:96-110, mst/system.py:259-263,
configs/models/unpaired+feat.yaml:4): ``generate_mix: false`` — the batch's
own (real, unpaired) reference mix is both the model's style input and the
loss target, and the loss is the five-feature AudioFeatureLoss instead of
MRSTFT. This script runs that recipe through the REAL Trainer loop on the
chip with synthetic stems + synthetic-but-structured reference mixes (each
ref mix is a fixed gain/pan render of the same song's stems, so there is a
learnable mapping from reference features to console parameters), and
records the smoothed loss trajectory + sustained steps/s — the Method-2
analogue of logs/train_demo_tpu.json (VERDICT round-2 missing #2).

Writes logs/train_demo_method2_tpu.json. Run from /root/repo on the TPU
session:  python scripts/train_demo_method2_tpu.py [steps_per_epoch] [epochs]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from diffmst_tpu.console import AdvancedMixConsole
from diffmst_tpu.losses import AudioFeatureLoss
from diffmst_tpu.models import MixStyleTransferModel
from diffmst_tpu.train import System, SystemConfig, Trainer

SR = 44100.0
# Method 2 runs the FULL 262,144-sample segment through model+console+loss
# (no Method-1 A/B halving — system.py:322-329 mirrors ref system.py:255-263),
# so its live-activation footprint is ~2x Method 1's: micro-batch 4 needs
# 16.3 GB > the v5e's 15.75 GB HBM (measured XLA OOM). Micro-batch 2 with
# 2-step gradient accumulation keeps the reference's effective batch of 4
# (configs/data/medley+cambridge-8.yaml:11) within one chip.
BS, NT, T = 2, 8, 262144
ACCUM = 2


class SyntheticUnpairedDM:
    """Pool of (stems, real-style ref mix) batches for Method 2.

    The ref mix is a deterministic render of the same stems (per-track gain
    in [-12, 0] dB, constant-power pan, peak-normalized) — stands in for the
    Jamendo mixes of configs/data/medley+cambridge-8.yaml: the batch carries
    a genuine stereo mix whose features the model must match, rather than a
    console-generated Method-1 target.
    """

    batch_size = BS

    def __init__(self, n_train, n_val=2, seed=0, device_pool=True, pool_size=4):
        rng = np.random.default_rng(seed)
        self.pool = [self._make(rng) for _ in range(pool_size)]
        if device_pool:
            self.pool = [
                tuple(
                    jax.device_put(x) if isinstance(x, np.ndarray) else x
                    for x in b
                )
                for b in self.pool
            ]
        self.n_train = n_train
        self.n_val = n_val

    def _make(self, rng):
        tracks = (rng.normal(size=(BS, NT, T)) * 10 ** (-48 / 20)).astype(
            np.float32
        )
        gains = 10.0 ** (rng.uniform(-12.0, 0.0, size=(BS, NT, 1)) / 20.0)
        pan = rng.uniform(0.0, 1.0, size=(BS, NT, 1)).astype(np.float32)
        left = np.sum(tracks * gains * np.cos(pan * np.pi / 2), axis=1)
        right = np.sum(tracks * gains * np.sin(pan * np.pi / 2), axis=1)
        ref = np.stack([left, right], axis=1).astype(np.float32)
        peak = np.maximum(np.abs(ref).max(axis=(1, 2), keepdims=True), 1e-8)
        ref = ref / peak
        return (
            tracks,
            np.zeros((BS, NT), np.int32),
            np.zeros((BS, NT), np.int32),
            np.zeros((BS, NT), bool),
            ref,
            ["synthetic-unpaired"] * BS,
        )

    def _iter(self, n):
        for i in range(n):
            yield self.pool[i % len(self.pool)]

    def train_dataloader(self):
        return self._iter(self.n_train)

    def val_dataloader(self):
        return self._iter(self.n_val)


def main():
    steps_per_epoch = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    system = System(
        MixStyleTransferModel.build(
            compute_dtype="bfloat16", remat_encoders=False
        ),
        AdvancedMixConsole(SR),
        # reference weights: rms 0.1, crest 0.001, width/imbalance 1.0,
        # barkspectrum 0.1 (configs/models/naive+feat.yaml:63-69)
        AudioFeatureLoss(sample_rate=int(SR), weights=(0.1, 0.001, 1.0, 1.0, 0.1)),
        SystemConfig(
            steps_per_epoch=steps_per_epoch, max_epochs=epochs, lr=1e-4,
            generate_mix=False, active_fx_bus_epoch=1000,
            adam_mu_dtype="bfloat16", accumulate_grad_batches=ACCUM,
        ),
    )
    device_pool = os.environ.get("DEMO_HOST_IO", "") != "1"
    # fused dispatch amortizes the per-dispatch tunnel latency (see the
    # 16-track demo); 6 divides the default 300 steps_per_epoch.
    fused = int(os.environ.get("DEMO_FUSED_STEPS", "6"))
    trainer = Trainer(
        system,
        SyntheticUnpairedDM(steps_per_epoch, device_pool=device_pool),
        max_epochs=epochs,
        ckpt_dir="logs/train_demo_m2_ckpt",
        log_every_n_steps=max(10, fused),
        check_val_every_n_epoch=epochs + 1,
        fused_steps=fused,
    )
    t0 = time.time()
    state = trainer.fit()
    wall = time.time() - t0

    losses = [h["loss"] for h in trainer.history if "loss" in h]
    sps = [h["steps_per_sec"] for h in trainer.history if "steps_per_sec" in h]
    third = max(1, len(losses) // 3)
    first_mean = float(np.mean(losses[:third])) if losses else float("nan")
    last_mean = float(np.mean(losses[-third:])) if losses else float("nan")
    summary = {
        "backend": jax.default_backend(),
        "method": "2 (unpaired ref + AudioFeatureLoss, generate_mix=false)",
        "shape": f"{BS}x{NT}x{T}",
        "recipe": ("bf16 compute, Adam mu bf16, unpaired+feat.yaml loss; "
                   "micro-batch 2 x 2-step grad accumulation = effective "
                   "batch 4 (Method 2 runs the full segment, ~2x Method-1 "
                   "memory; micro-batch 4 OOMs the 15.75 GB v5e HBM)"),
        "effective_batch": BS * ACCUM,
        "batch_residency": "device" if device_pool else "host (tunnel IO included)",
        "fused_steps_per_dispatch": fused,
        "distinct_batches": 4,
        "steps": int(state.step),
        "wall_s": round(wall, 1),
        "loss_trail": [round(float(x), 5) for x in losses],
        "smoothed_first_third": round(first_mean, 5),
        "smoothed_last_third": round(last_mean, 5),
        "loss_dropped": bool(losses and last_mean < first_mean),
        "sustained_steps_per_sec": round(float(np.median(sps)), 3) if sps else None,
        "realtime_factor": (
            round(float(np.median(sps)) * BS * T / SR, 1) if sps else None
        ),
        "captured_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    os.makedirs("logs", exist_ok=True)
    with open("logs/train_demo_method2_tpu.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
