"""End-to-end `main.py fit` on the TPU over the REAL data pipeline.

Closes the last untested seam in the training story: every prior on-chip
training number used synthetic device-resident batches; this run drives the
actual CLI config path — MultitrackDataModule buffer reload, native
decode+BS.1770, prefetch thread, Trainer, orbax, CSV — at the flagship
recipe (configs/models/naive+tpu.yaml, batch 4 x 8 x 262,144; reference
entry /root/reference/main.py:15 + mst/dataloader.py:251-382) on a
generated WAV corpus, and attributes the sustained rate to its bounds:

  * host pipeline standalone rate (decode+LUFS+collate, no device),
  * host->device transfer bandwidth and bytes/step (through the axon
    tunnel this is the binding constraint of the dev harness — ~21 MB/s
    against ~34 MB/step; on a real TPU VM the same transfer rides PCIe
    at GB/s and the prefetch thread hides it),
  * the device-only step rate (synthetic device-resident batches).

Writes logs/train_fit_e2e_tpu.json. Run from /root/repo on the TPU session:
    python scripts/train_fit_e2e_tpu.py [steps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SR = 44100.0
BS, NT, T = 4, 8, 262144
CORPUS = "/tmp/diffmst_synth_corpus"


def ensure_corpus():
    if not os.path.exists(os.path.join(CORPUS, "meta.yaml")):
        from scripts.make_synth_corpus import make_corpus

        make_corpus(CORPUS, 10, 2, 12.0)


def host_pipeline_rate(n_batches: int = 40):
    """Standalone data-plane rate: no device involved."""
    from diffmst_tpu.data import MultitrackDataModule

    dm = MultitrackDataModule(
        track_root_dirs=[CORPUS], metadata_files=[f"{CORPUS}/meta.yaml"],
        length=T, min_tracks=NT, max_tracks=NT, batch_size=BS,
        num_train_passes=1, train_buffer_size_gb=0.35, val_buffer_size_gb=0.05,
    )
    ds = dm.train_dataset
    t0 = time.time()
    ds.reload_track_buffer()
    ds.reload_mix_buffer()
    reload_s = time.time() - t0
    ds.items_since_reload = 1
    it = dm.train_dataloader()
    n, t0 = 0, time.time()
    for _ in it:
        n += 1
        if n == n_batches:
            break
    rate = n / (time.time() - t0)
    return {"buffer_reload_s": round(reload_s, 1),
            "buffered_examples": len(ds.track_buffer),
            "steady_batches_per_sec": round(rate, 2)}


def transfer_bandwidth():
    """Upload bandwidth with a device->host DATA-READ fence.

    ``block_until_ready`` is not a reliable completion fence on the axon
    backend (PERF.md "per-dispatch measurement footgun") — fenced that way
    this function once reported a 45 steps/s "tunnel bound", i.e. 1.5 GB/s
    through a ~21 MB/s tunnel. Reading one element of the uploaded array
    cannot resolve before the upload has actually landed on device. A fresh
    array per rep also defeats any content-identity caching in the client.
    """
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = rng.normal(size=(BS, NT, T)).astype(np.float32)
    float(jnp.ravel(jax.device_put(x))[0])  # warm the path
    reps, dt = 3, 0.0
    for _ in range(reps):
        x = rng.normal(size=(BS, NT, T)).astype(np.float32)
        t0 = time.time()
        d = jax.device_put(x)
        float(jnp.ravel(d)[0])  # data-read fence
        dt += time.time() - t0
    dt /= reps
    return {"bytes_per_batch": int(x.nbytes),
            "upload_s_per_batch": round(dt, 3),
            "bandwidth_mb_s": round(x.nbytes / dt / 1e6, 1)}


def main():
    # >=1000 steps across >=3 buffer reload cycles (VERDICT round-4 #6):
    # steady-state evidence for the host-pipeline headroom claim, not a
    # single-buffer pilot.
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    ensure_corpus()

    import jax

    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    host = host_pipeline_rate()
    print("host pipeline:", host, flush=True)
    xfer = transfer_bandwidth()
    print("transfer:", xfer, flush=True)

    # the real CLI path: same overlaid-YAML build main.py executes
    import yaml

    import main as cli
    from diffmst_tpu.utils.config import load_config

    # 3 epochs: the buffer reloads once per epoch's worth of items
    # (dataloader.py:384-419 semantics), so >=3 reload cycles requires >=3
    # epochs — a single long epoch sees only the initial fill + the
    # end-of-epoch wraparound.
    epochs = 3
    trainer_overlay = "/tmp/e2e_trainer_overlay.yaml"
    with open(trainer_overlay, "w") as f:
        yaml.safe_dump({
            "seed_everything": 42,
            "trainer": {
                "max_epochs": epochs,
                "log_every_n_steps": 10,
                "default_root_dir": "logs/train_fit_e2e_ckpt",
                # no val pass: the eval graph is a separate multi-minute
                # compile; validation is exercised by tests and the CPU CLI
                "check_val_every_n_epoch": epochs + 1,
                # ... and the CLI's Lightning-parity sanity default (2)
                # would run that same eval compile inside the timed window
                "num_sanity_val_steps": 0,
            },
        }, f)
    cfg = load_config([
        "configs/models/naive+tpu.yaml",
        "configs/optimizer.yaml",
        "configs/data/synthetic-8.yaml",
        trainer_overlay,
    ])
    # Size each epoch at steps/epochs train steps: epoch items =
    # num_examples_per_pass * num_train_passes, one buffer reload per epoch.
    passes = int(cfg["data"]["init_args"].get("num_train_passes", 20))
    cfg["data"]["init_args"]["num_examples_per_pass"] = (
        steps * BS // (epochs * passes)
    )
    system, datamodule, trainer = cli.build_from_config(cfg)

    # Per-reload host-pipeline stats: wrap the dataset's reload (it runs
    # inside the prefetch thread) to time each cycle and record the buffer
    # fill it produced.
    ds = datamodule.train_dataset
    reloads = []
    orig_tracks, orig_mix = ds.reload_track_buffer, ds.reload_mix_buffer

    def timed_tracks():
        t0 = time.time()
        orig_tracks()
        reloads.append({
            "at_wall_s": round(time.time() - fit_t0, 1) if fit_t0 else 0.0,
            "track_reload_s": round(time.time() - t0, 1),
            "buffered_examples": len(ds.track_buffer),
        })

    def timed_mix():
        t0 = time.time()
        orig_mix()
        if reloads:
            reloads[-1]["mix_reload_s"] = round(time.time() - t0, 1)

    ds.reload_track_buffer = timed_tracks
    ds.reload_mix_buffer = timed_mix

    fit_t0 = time.time()
    state = trainer.fit()
    wall = time.time() - fit_t0

    losses = [h["loss"] for h in trainer.history if "loss" in h]
    sps = [h["steps_per_sec"] for h in trainer.history if "steps_per_sec" in h]
    third = max(1, len(losses) // 3)
    sustained = float(np.median(sps)) if sps else None

    tunnel_bound = xfer["bandwidth_mb_s"] * 1e6 / xfer["bytes_per_batch"]
    summary = {
        "backend": jax.default_backend(),
        "entry": "main.build_from_config over configs/models/naive+tpu.yaml + configs/data/synthetic-8.yaml (the CLI fit path)",
        "data_plane": "MultitrackDataModule: RAM buffer + native decode/BS.1770 + prefetch thread (real pipeline, host-resident WAV corpus)",
        "shape": f"{BS}x{NT}x{T}",
        "steps": int(state.step),
        "wall_s": round(wall, 1),
        "sustained_steps_per_sec": round(sustained, 3) if sustained else None,
        "realtime_factor": round(sustained * BS * T / SR, 1) if sustained else None,
        "loss_first_third": round(float(np.mean(losses[:third])), 4) if losses else None,
        "loss_last_third": round(float(np.mean(losses[-third:])), 4) if losses else None,
        "host_pipeline": host,
        "buffer_reloads": {
            "count": len(reloads),
            "per_reload": reloads,
            "what": (
                "each entry = one RAM-buffer reload cycle inside the "
                "prefetch thread during fit (reference reloads once per "
                "epoch, dataloader.py:384-419)"
            ),
        },
        "transfer": xfer,
        "attribution": {
            "host_headroom_x": round(host["steady_batches_per_sec"] / 6.12, 2),
            "tunnel_bound_steps_per_sec": round(tunnel_bound, 2),
            "device_only_steps_per_sec_ref": 6.12,
            "note": (
                "through the dev-harness axon tunnel the binding constraint is "
                "host->device upload; on a TPU VM the same 34 MB/step rides PCIe "
                "(>10 GB/s, ~3 ms) and the prefetch thread hides it, so the "
                "host pipeline's measured headroom is the number that matters"
            ),
        },
        "captured_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    os.makedirs("logs", exist_ok=True)
    with open("logs/train_fit_e2e_tpu.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
