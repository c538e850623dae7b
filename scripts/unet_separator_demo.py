"""Supervised training demo for the weight-loadable ``UNetSeparator``.

The Remixer's HDEMUCS substitute story has two legs: ``hpss_separator``
(unsupervised, no weights, proven by the param-estimation pretraining run
in ``scripts/param_est_demo.py``) and ``models.separator.UNetSeparator``
— the trainable / weight-loadable architecture a user with real stem data
would train or load ported weights into (reference dependency:
HDEMUCS_HIGH_MUSDB_PLUS at /root/reference/mst/modules.py:496-500).

This script proves the trainable leg: supervised mask learning on
synthetic 4-stem songs (drums / bass / other / vocals in the HDEMUCS stem
order). The separator's softmax masks guarantee stems sum to the mix, and
the synthetic stems do too, so the task is well-posed. Reported metric:
mean SI-SDR per stem on HELD-OUT songs, against two no-training baselines
(the trivial band-split and the HPSS masks). Success = the trained U-Net
beats its own init and the band-split baseline on held-out songs.

Writes logs/unet_separator_demo.json.
    python scripts/unet_separator_demo.py [steps] [bs] [lr]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from diffmst_tpu.losses.eval_metrics import si_sdr
from diffmst_tpu.models.separator import UNetSeparator, hpss_separator
from diffmst_tpu.train.param_system import band_split_separator

SR = 44100.0
T = 512 * 128  # 65,536 samples ~ 1.5 s


def synth_stems(rng: np.random.Generator) -> np.ndarray:
    """One song as 4 stereo stems (4, 2, T): drums, bass, other, vocals."""
    t = np.arange(T) / SR
    stems = np.zeros((4, 2, T), np.float32)

    def place(idx, sig, pan, level_db):
        g = 10.0 ** (level_db / 20.0)
        theta = pan * np.pi / 2.0
        stems[idx, 0] += np.float32(g * np.cos(theta)) * sig
        stems[idx, 1] += np.float32(g * np.sin(theta)) * sig

    drums = np.zeros(T, np.float32)
    period = int(0.5 * SR)
    for k in range(0, T, period):
        n = min(4096, T - k)
        env = np.exp(-np.arange(n) / (0.02 * SR))
        drums[k : k + n] += env * np.sin(2 * np.pi * 55 * t[:n]) * 2.0
        s = k + period // 2
        if s + n < T:
            drums[s : s + n] += env * rng.normal(size=n).astype(np.float32) * 0.7
    place(0, drums, 0.5, -12 + rng.uniform(-3, 3))

    f0 = rng.choice([41.2, 55.0, 61.7])
    bass = sum((0.5 ** h) * np.sin(2 * np.pi * f0 * (h + 1) * t) for h in range(3))
    bass *= 0.5 + 0.5 * np.sin(2 * np.pi * 0.5 * t) ** 2
    place(1, bass.astype(np.float32), 0.5 + rng.uniform(-0.05, 0.05), -14)

    root = rng.choice([220.0, 246.9, 196.0])
    pad = np.zeros(T, np.float32)
    for ratio in (1.0, 1.25, 1.5):
        for h in range(1, 5):
            pad += (0.3 ** h) * np.sin(
                2 * np.pi * root * ratio * h * t + rng.uniform(0, 6.28)
            ).astype(np.float32)
    place(2, pad, rng.uniform(0.2, 0.8), -18)

    fl = rng.uniform(400, 800)
    lead = np.sin(
        2 * np.pi * fl * t + 6.0 * np.sin(2 * np.pi * 5.5 * t)
    ).astype(np.float32)
    lead *= np.clip(np.sin(2 * np.pi * 0.25 * t), 0, 1)
    place(3, lead, 0.5, -16)

    peak = np.abs(stems.sum(axis=0)).max()
    return stems / max(peak, 1e-6) * 0.5


def heldout_sisdr(sep_fn, mixes, stems):
    """Mean SI-SDR (dB) over stems x channels x songs, active stems only."""
    out = sep_fn(mixes)  # (bs, 4, 2, T)
    # per-row SI-SDR: vmap the scalar metric over (song x stem x channel) rows
    vals = jax.vmap(si_sdr)(
        out.reshape(-1, out.shape[-1]), stems.reshape(-1, stems.shape[-1])
    )
    active = jnp.abs(stems).max(axis=-1).reshape(-1) > 1e-6
    return float(jnp.where(active, vals, 0.0).sum() / jnp.maximum(active.sum(), 1))


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    lr = float(sys.argv[3]) if len(sys.argv) > 3 else 3e-4
    print("backend:", jax.default_backend(), flush=True)

    rng = np.random.default_rng(7)
    n_pool = 16
    pool = np.stack([synth_stems(rng) for _ in range(n_pool)])  # (16,4,2,T)
    evals = np.stack([synth_stems(rng) for _ in range(4)])

    pool_dev = jnp.asarray(pool)
    eval_stems = jnp.asarray(evals)
    eval_mixes = eval_stems.sum(axis=1)  # (4, 2, T)

    model = UNetSeparator()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), eval_mixes[:bs])
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, stems):
        mix = stems.sum(axis=1)

        def loss_fn(p):
            sep = model.apply(p, mix, train=True)
            return jnp.mean(jnp.abs(sep - stems))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def unet_sep(p, x):
        return model.apply(p, x)

    baselines = {
        "band_split": heldout_sisdr(band_split_separator, eval_mixes, eval_stems),
        "hpss": heldout_sisdr(hpss_separator, eval_mixes, eval_stems),
        "unet_init": heldout_sisdr(
            lambda x: unet_sep(params, x), eval_mixes, eval_stems
        ),
    }
    print("held-out SI-SDR baselines:", baselines, flush=True)

    key = jax.random.PRNGKey(1)
    trail, losses = [], []
    eval_every = max(50, steps // 20)
    t0 = time.time()
    for i in range(steps):
        key, k = jax.random.split(key)
        idx = jax.random.choice(k, n_pool, (bs,), replace=False)
        params, opt_state, loss = train_step(params, opt_state, pool_dev[idx])
        if (i + 1) % 50 == 0:
            losses.append(round(float(loss), 5))
        if (i + 1) % eval_every == 0:
            sdr = heldout_sisdr(lambda x: unet_sep(params, x), eval_mixes, eval_stems)
            trail.append({"step": i + 1, "heldout_sisdr_db": round(sdr, 3)})
            print(f"step {i+1}: train L1 {float(loss):.5f}  "
                  f"held-out SI-SDR {sdr:.2f} dB", flush=True)
    wall = time.time() - t0

    final = trail[-1]["heldout_sisdr_db"] if trail else baselines["unet_init"]
    summary = {
        "backend": jax.default_backend(),
        "steps": steps,
        "batch_size": bs,
        "lr": lr,
        "wall_s": round(wall, 1),
        "heldout_sisdr_baselines_db": {k: round(v, 3) for k, v in baselines.items()},
        "heldout_sisdr_trained_db": final,
        "train_l1_trail": losses,
        "heldout_sisdr_trail": trail,
        "beats_init": bool(final > baselines["unet_init"]),
        "beats_band_split": bool(final > baselines["band_split"]),
        "captured_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    os.makedirs("logs", exist_ok=True)
    with open("logs/unet_separator_demo.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
