"""CLI: train/validate from overlaid YAML configs.

Mirrors the reference's LightningCLI surface (/root/reference/main.py,
README.md:84-110):

    python main.py fit -c configs/config.yaml -c configs/optimizer.yaml \
        -c configs/data/medley+cambridge-8.yaml -c configs/models/naive.yaml

Reference class_path YAMLs load unchanged (aliases in
diffmst_tpu/utils/config.py map ``mst.*``/``auraloss.*`` onto this
framework). Trainer flags come from the ``trainer:`` section; the optimizer
section maps onto System's lr.
"""

from __future__ import annotations

import argparse
import sys

import jax


def build_from_config(cfg: dict):
    from diffmst_tpu.callbacks import CSVLogger
    from diffmst_tpu.train import System, Trainer
    from diffmst_tpu.utils.config import instantiate

    model_cfg = cfg.get("model", {})
    init_args = dict(model_cfg.get("init_args", model_cfg))

    model = instantiate(init_args.pop("model"))
    mix_console = instantiate(init_args.pop("mix_console"))
    loss = instantiate(init_args.pop("loss"))
    mix_fn = instantiate(init_args.pop("mix_fn", "mst.mixing.naive_random_mix"))

    trainer_cfg = dict(cfg.get("trainer", {}))
    opt_cfg = cfg.get("optimizer", {}).get("init_args", {})
    if "lr" in opt_cfg:
        init_args.setdefault("lr", opt_cfg["lr"])
    if "max_epochs" in trainer_cfg:
        init_args.setdefault("max_epochs", trainer_cfg["max_epochs"])
    if "accumulate_grad_batches" in trainer_cfg:
        init_args.setdefault(
            "accumulate_grad_batches", trainer_cfg["accumulate_grad_batches"]
        )

    system = System(model, mix_console, loss, mix_fn=mix_fn, **init_args)

    data_cfg = cfg.get("data")
    datamodule = instantiate(data_cfg) if data_cfg else None

    callbacks = [CSVLogger()]
    for cb in trainer_cfg.get("callbacks", []) or []:
        try:
            callbacks.append(instantiate(cb))
        except (ImportError, AttributeError, TypeError):
            pass  # reference-only callbacks (ModelSummary etc.) are cosmetic

    # Multi-device: the reference's `trainer.devices` (configs/config.yaml:34)
    # maps onto a dp mesh; `devices: auto` / -1 uses every chip. An optional
    # `trainer.mesh: {dp: N, mp: M}` section exposes the 2-D mesh directly.
    mesh = None
    devices = trainer_cfg.get("devices", 1)
    mesh_cfg = trainer_cfg.get("mesh")
    if mesh_cfg:
        from diffmst_tpu.parallel import make_mesh

        mesh = make_mesh(dp=mesh_cfg.get("dp"), mp=mesh_cfg.get("mp", 1))
    elif devices in ("auto", -1) or (isinstance(devices, int) and devices > 1):
        from diffmst_tpu.parallel import make_mesh

        n = len(jax.devices()) if devices in ("auto", -1) else devices
        if n > len(jax.devices()):
            raise SystemExit(
                f"trainer.devices={n} but only {len(jax.devices())} present"
            )
        mesh = make_mesh(dp=n, devices=jax.devices()[:n])

    trainer = Trainer(
        system,
        datamodule,
        max_epochs=trainer_cfg.get("max_epochs"),
        ckpt_dir=trainer_cfg.get("default_root_dir") or "checkpoints",
        log_every_n_steps=trainer_cfg.get("log_every_n_steps", 50),
        check_val_every_n_epoch=trainer_cfg.get("check_val_every_n_epoch", 1),
        callbacks=callbacks,
        mesh=mesh,
        seed=cfg.get("seed_everything", 42),
        ckpt_every_n_steps=trainer_cfg.get("ckpt_every_n_steps", 500),
        fused_steps=trainer_cfg.get("fused_steps", 1),
        # Lightning's Trainer(enable_checkpointing=...) passthrough
        # (/root/reference/configs/config.yaml trainer section)
        enable_checkpointing=trainer_cfg.get("enable_checkpointing", True),
        deterministic_val=trainer_cfg.get("deterministic_val", False),
        # Lightning's pre-fit sanity check; the reference pins 2
        # (/root/reference/configs/config.yaml:44)
        num_sanity_val_steps=trainer_cfg.get("num_sanity_val_steps", 2),
    )
    return system, datamodule, trainer


def main(argv=None):
    parser = argparse.ArgumentParser(description="diffmst_tpu trainer")
    parser.add_argument(
        "command", choices=["fit", "validate", "test", "predict", "export"]
    )
    parser.add_argument(
        "-c", "--config", action="append", required=True,
        help="YAML config (repeatable; later files overlay earlier)",
    )
    parser.add_argument("--ckpt_path", default=None, help="resume checkpoint")
    # predict-only arguments (LightningCLI's predict stage, adapted to this
    # workload: full-song style transfer over a stem directory)
    parser.add_argument("--track_dir", default=None, help="predict: stem dir")
    parser.add_argument("--ref", default=None, help="predict: reference mix wav")
    parser.add_argument(
        "--output", default="pred_mix.wav", help="predict: output wav"
    )
    parser.add_argument(
        "--render_mode", default="ola", choices=["ola", "streaming"],
        help="predict: OLA (reference) or seam-free streaming rendering",
    )
    # export-only arguments (AOT serving graph, utils/export.py)
    parser.add_argument(
        "--num_tracks", type=int, default=8,
        help="export: static track count of the serving graph",
    )
    parser.add_argument(
        "--analysis_len", type=int, default=262144,
        help="export: analysis/render window length in samples",
    )
    parser.add_argument(
        "--render_bs", type=int, default=8,
        help="export: static window-batch size of the serving render graph",
    )
    args = parser.parse_args(argv)

    from diffmst_tpu.utils.config import load_config

    cfg = load_config(args.config)
    print(f"devices: {jax.devices()}")
    system, datamodule, trainer = build_from_config(cfg)

    if args.command == "predict":
        return _predict(system, args)
    if args.command == "export":
        return _export(system, args)
    if datamodule is None:
        raise SystemExit("config has no `data:` section")

    if args.command == "fit":
        trainer.fit(resume=args.ckpt_path)
    elif args.command == "validate":
        metrics = trainer.validate(resume=args.ckpt_path)
        print(f"validate: {metrics}")
    else:
        metrics = trainer.test(resume=args.ckpt_path)
        print(f"test: {metrics}")


def _predict(system, args):
    """Full-song inference from the config's model/console (the reference
    exposes this via scripts, e.g. /root/reference/scripts/run.py; here it is
    also a first-class CLI stage)."""
    import os

    import jax.numpy as jnp
    import numpy as np

    from diffmst_tpu.data import read_audio, write_audio
    from diffmst_tpu.utils.inference import run_diffmst

    if not args.track_dir or not args.ref:
        raise SystemExit("predict requires --track_dir and --ref")

    stems = []
    for f in sorted(os.listdir(args.track_dir)):
        if f.endswith(".wav"):
            a, _ = read_audio(os.path.join(args.track_dir, f))
            stems.append(a.mean(axis=0))
    if not stems:
        raise SystemExit(f"no .wav stems in {args.track_dir}")
    total = min(s.shape[-1] for s in stems)
    tracks = np.stack([s[:total] for s in stems])[None]
    ref, _ = read_audio(args.ref)

    model = system.model
    n = min(2, tracks.shape[1])
    seg = min(262144, total)
    variables = _load_variables(
        model, args.ckpt_path,
        lambda: jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.asarray(tracks[:, :n, :seg]),
            jnp.asarray(ref[None, :, :seg]),
            jnp.zeros((1, n), bool),
        ),
    )

    # weights as jit ARGUMENTS, not closure constants: captured variables
    # are inlined into the compiled program (763 MB for the flagship),
    # bloating the executable (and through the dev tunnel, aborting the
    # remote compile upload)
    _apply = jax.jit(model.apply)
    apply = lambda t, r: _apply(variables, t, r)  # noqa: E731
    mix, *_ = run_diffmst(
        tracks, ref[None], apply, system.mix_console,
        render_mode=args.render_mode,
    )
    write_audio(args.output, mix[0] / max(np.abs(mix).max(), 1e-8), 44100)
    print(f"predict: wrote {args.output}")


def _load_variables(model, ckpt_path, init_fn):
    """Model variables from an orbax checkpoint, or random init (warned)."""
    if ckpt_path:
        from diffmst_tpu.utils.checkpoint import restore_state

        state = restore_state(ckpt_path)
        params = state["params"] if isinstance(state, dict) else state.params
        bstats = (
            state.get("batch_stats", {})
            if isinstance(state, dict)
            else state.batch_stats
        )
        return {
            "params": params,
            **({"batch_stats": bstats} if bstats else {}),
        }
    print("warning: no --ckpt_path; using random init")
    return init_fn()


def _export(system, args):
    """AOT-export the inference graph for serving (utils/export.py)."""
    import jax.numpy as jnp

    from diffmst_tpu.utils.export import save_inference_export

    model = system.model
    n = min(2, args.num_tracks)
    seg = args.analysis_len
    variables = _load_variables(
        model, args.ckpt_path,
        lambda: jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, n, seg), jnp.float32),
            jnp.zeros((1, 2, seg), jnp.float32),
            jnp.zeros((1, n), bool),
        ),
    )
    out_dir = args.output if args.output != "pred_mix.wav" else "serving_export"
    manifest = save_inference_export(
        out_dir, model, variables, system.mix_console,
        num_tracks=args.num_tracks, analysis_len=args.analysis_len,
        render_bs=args.render_bs,
    )
    print(f"export: wrote {out_dir} ({manifest['platforms']})")


if __name__ == "__main__":
    main()
