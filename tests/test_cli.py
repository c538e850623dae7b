"""CLI + Trainer end-to-end on the synthetic dataset (1 tiny epoch),
plus param-estimation system and remixer tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import yaml

from tests.test_data import dataset_dir  # fixture reuse  # noqa: F401

SR = 44100


def _write_cfg(tmp_path, root, meta, mix_meta):
    cfg = {
        "seed_everything": 42,
        "trainer": {
            "max_epochs": 1,
            "log_every_n_steps": 1,
            "default_root_dir": str(tmp_path / "ckpts"),
        },
        "model": {
            "class_path": "diffmst_tpu.train.System",
            "init_args": {
                "generate_mix": True,
                "active_fx_bus_epoch": 1000,
                "lr": 1e-4,
                "steps_per_epoch": 2,
                "mix_console": {
                    "class_path": "mst.modules.AdvancedMixConsole",
                    "init_args": {"sample_rate": 44100},
                },
                "model": {
                    "class_path": "diffmst_tpu.models.MixStyleTransferModel",
                    "init_args": {
                        "track_encoder": {
                            "class_path": "diffmst_tpu.models.SpectrogramEncoder",
                            "init_args": {
                                "embed_dim": 32, "n_fft": 2048,
                                "hop_length": 128, "cnn_base_width": 4,
                            },
                        },
                        "mix_encoder": {
                            "class_path": "diffmst_tpu.models.SpectrogramEncoder",
                            "init_args": {
                                "embed_dim": 32, "n_fft": 2048,
                                "hop_length": 128, "cnn_base_width": 4,
                            },
                        },
                        "controller": {
                            "class_path": "diffmst_tpu.models.TransformerController",
                            "init_args": {
                                "embed_dim": 32,
                                "num_track_control_params": 27,
                                "num_fx_bus_control_params": 25,
                                "num_master_bus_control_params": 26,
                                "num_layers": 1, "nhead": 4,
                            },
                        },
                    },
                },
                "loss": {
                    "class_path": "auraloss.freq.MultiResolutionSTFTLoss",
                    "init_args": {
                        "fft_sizes": [512], "hop_sizes": [256], "win_lengths": [512],
                    },
                },
            },
        },
        "data": {
            "class_path": "mst.dataloader.MultitrackDataModule",
            "init_args": {
                "track_root_dirs": [str(root)],
                "metadata_files": [meta],
                "length": 32768,
                "min_tracks": 2,
                "max_tracks": 4,
                "batch_size": 2,
                "num_train_passes": 0,  # -> small epoch below
                "train_buffer_size_gb": 0.001,
                "val_buffer_size_gb": 0.001,
                "min_track_lufs_db": -60.0,
            },
        },
    }
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return str(p)


def test_cli_fit_one_epoch(tmp_path, dataset_dir, capsys):  # noqa: F811
    root, meta, mix_meta = dataset_dir
    import main as cli

    # keep the synthetic epoch tiny: patch dataset length post-build
    cfg_path = _write_cfg(tmp_path, root, meta, mix_meta)
    from diffmst_tpu.utils.config import load_config

    system, datamodule, trainer = cli.build_from_config(load_config([cfg_path]))
    datamodule.train_dataset.num_examples_per_epoch = 4
    datamodule.val_dataset.num_examples_per_epoch = 2
    state = trainer.fit()
    out = capsys.readouterr().out
    assert "[train]" in out and "[epoch]" in out
    assert int(state.step) == 2  # 4 examples / batch 2
    assert (tmp_path / "ckpts").exists()
    # resume from the checkpoint
    trainer.max_epochs = 1
    state2 = trainer.fit(resume=str(tmp_path / "ckpts" / "last"))
    assert int(state2.step) >= 2


def test_remixer_and_param_system():
    from diffmst_tpu.console import AdvancedMixConsole
    from diffmst_tpu.models import ParameterProjector, SpectrogramEncoder
    from diffmst_tpu.train import ParameterEstimationSystem, Remixer, band_split_separator

    T = 32768
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 2, T)) * 0.1

    stems = band_split_separator(x)
    assert stems.shape == (2, 4, 2, T)
    np.testing.assert_allclose(
        np.asarray(stems.sum(axis=1)), np.asarray(x), atol=1e-4
    )

    # small reverb IR: the fx bus is ON in the Remixer render (reference
    # parity) and the default 65536-tap IR makes this CPU test minutes-slow
    console = AdvancedMixConsole(
        44100.0, reverb_num_samples=16384, reverb_num_taps=255
    )
    remix, tp, fp, mp = Remixer(44100.0)(x, console, jax.random.PRNGKey(1))
    assert remix.shape == x.shape
    assert np.isfinite(np.asarray(remix)).all()
    assert np.abs(np.asarray(remix)).max() <= 4.0 + 1e-5  # tanh clip

    enc = SpectrogramEncoder(embed_dim=16, n_fft=2048, hop_length=128, cnn_base_width=4)
    proj = ParameterProjector(
        embed_dim=32, num_tracks=8, num_track_control_params=27,
        num_fx_bus_control_params=25, num_master_bus_control_params=26,
    )
    # fx-bus params must be OBSERVABLE in the remix: the reference Remixer
    # renders with use_output_fader=False only, fx bus ON (modules.py:540-546
    # + forward default modules.py:327) — so two fx param draws change the mix
    tracks8 = stems.reshape(2, 8, T) * 10 ** (-48 / 20.0)
    tp0 = jnp.full((2, 8, 27), 0.5)
    mp0 = jnp.full((2, 26), 0.5)
    fp_a = jnp.full((2, 25), 0.2)
    fp_b = jnp.full((2, 25), 0.9)
    out_a = console(tracks8, tp0, fp_a, mp0, use_output_fader=False,
                    key=jax.random.PRNGKey(7)).mix
    out_b = console(tracks8, tp0, fp_b, mp0, use_output_fader=False,
                    key=jax.random.PRNGKey(7)).mix
    assert float(jnp.abs(out_a - out_b).max()) > 1e-6

    system = ParameterEstimationSystem(enc, proj, console, steps_per_epoch=2, max_epochs=2)
    state = system.init(jax.random.PRNGKey(2), x)
    step = system.make_train_step()
    losses = []
    for i in range(3):
        state, m = step(state, x, jax.random.PRNGKey(10))
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]
    assert {"track_param_loss", "fx_bus_param_loss", "master_bus_param_loss"} <= set(m)

    # fixed-target eval step: deterministic, finite, eval-mode BN
    eval_fn = system.make_eval_step()
    remix2, tp2, fp2, mp2 = system.remixer(x, console, jax.random.PRNGKey(3))
    m1 = eval_fn(state, x, remix2, tp2, fp2, mp2)
    m2 = eval_fn(state, x, remix2, tp2, fp2, mp2)
    assert np.isfinite(float(m1["loss"]))
    assert float(m1["loss"]) == float(m2["loss"])


def test_cli_validate_runs_real_pass(tmp_path, dataset_dir, capsys):  # noqa: F811
    """`validate` performs an actual validation pass (the reference CLI's
    subcommand, /root/reference/main.py:14-22) — round-1 made it a no-op."""
    root, meta, mix_meta = dataset_dir
    import main as cli
    from diffmst_tpu.utils.config import load_config

    cfg_path = _write_cfg(tmp_path, root, meta, mix_meta)
    system, datamodule, trainer = cli.build_from_config(load_config([cfg_path]))
    datamodule.val_dataset.num_examples_per_epoch = 2
    metrics = trainer.validate()
    assert "loss" in metrics and np.isfinite(metrics["loss"])
    out = capsys.readouterr().out
    assert "[val]" in out


def test_cli_test_subcommand_runs_test_split(tmp_path, dataset_dir, capsys):  # noqa: F811
    """`test` runs a real pass over the test split (LightningCLI's test
    subcommand; reference test dataset at dataloader.py:496-516)."""
    root, meta, mix_meta = dataset_dir
    import main as cli
    from diffmst_tpu.utils.config import load_config

    # The fixture ships train/val only; give it a test split.
    m = yaml.safe_load(open(meta))
    m["test"] = m["val"]
    meta2 = tmp_path / "meta_with_test.yaml"
    meta2.write_text(yaml.safe_dump(m))
    mm = yaml.safe_load(open(mix_meta))
    mm["test"] = mm["val"]
    mix2 = tmp_path / "mixes_with_test.yaml"
    mix2.write_text(yaml.safe_dump(mm))

    cfg_path = _write_cfg(tmp_path, root, str(meta2), str(mix2))
    system, datamodule, trainer = cli.build_from_config(load_config([cfg_path]))
    datamodule._test_kwargs["num_examples_per_epoch"] = 2
    metrics = trainer.test()
    assert "loss" in metrics and np.isfinite(metrics["loss"])
    out = capsys.readouterr().out
    assert "[test]" in out


def test_cli_predict_writes_mix(tmp_path, dataset_dir, capsys):  # noqa: F811
    """`predict` renders a full-song mix from stems + reference via the
    config's model/console (reference scripts/run.py role, as a CLI stage)."""
    root, meta, mix_meta = dataset_dir
    import main as cli
    from diffmst_tpu.data import read_audio

    cfg_path = _write_cfg(tmp_path, root, meta, mix_meta)
    track_dir = root / "train_song0"
    ref = root / "mixes" / "train_mix0.wav"
    out = tmp_path / "pred.wav"
    cli.main([
        "predict", "-c", cfg_path,
        "--track_dir", str(track_dir), "--ref", str(ref),
        "--output", str(out),
    ])
    assert out.exists()
    mix, sr = read_audio(str(out))
    assert mix.shape[0] == 2 and mix.shape[1] > 0
    assert np.all(np.isfinite(mix))
    assert "predict: wrote" in capsys.readouterr().out


def test_cli_export_writes_serving_graph(tmp_path, dataset_dir, capsys):  # noqa: F811
    """`export` AOT-serializes the inference graph (utils/export.py) from
    the config's model/console."""
    root, meta, mix_meta = dataset_dir
    import main as cli
    from diffmst_tpu.utils.export import load_inference_export

    cfg_path = _write_cfg(tmp_path, root, meta, mix_meta)
    out = tmp_path / "serving"
    cli.main([
        "export", "-c", cfg_path,
        "--output", str(out), "--num_tracks", "3",
        "--analysis_len", "16384",
    ])
    exported = load_inference_export(str(out))
    assert exported.manifest["num_tracks"] == 3
    tp, fp, mp = exported.predict_params(
        jnp.zeros((1, 3, 16384), jnp.float32),
        jnp.zeros((1, 2, 16384), jnp.float32),
    )
    assert tp.shape == (1, 3, 27) and fp.shape == (1, 25) and mp.shape == (1, 26)
    assert "export: wrote" in capsys.readouterr().out


def test_cli_mesh_wiring(tmp_path, dataset_dir):  # noqa: F811
    """trainer.devices > 1 in the YAML builds a dp mesh (round-1 gap: CLI
    could only ever train single-device)."""
    root, meta, mix_meta = dataset_dir
    import main as cli
    import yaml as _yaml
    from diffmst_tpu.utils.config import load_config

    cfg_path = _write_cfg(tmp_path, root, meta, mix_meta)
    cfg = _yaml.safe_load(open(cfg_path))
    cfg["trainer"]["devices"] = len(jax.devices())
    cfg_path2 = tmp_path / "cfg_mesh.yaml"
    cfg_path2.write_text(_yaml.safe_dump(cfg))

    system, datamodule, trainer = cli.build_from_config(load_config([str(cfg_path2)]))
    assert trainer.mesh is not None
    assert trainer.mesh.shape["dp"] == len(jax.devices())

    # and a dp-sharded fit smoke: 1 tiny epoch through the mesh path
    datamodule.train_dataset.num_examples_per_epoch = len(jax.devices())
    datamodule.val_dataset.num_examples_per_epoch = 2
    datamodule.batch_size = len(jax.devices())
    state = trainer.fit()
    assert int(state.step) == 1


def test_cli_trainer_flag_passthrough(tmp_path, dataset_dir):  # noqa: F811
    """trainer.{enable_checkpointing,deterministic_val,fused_steps} in the
    YAML reach the Trainer (Lightning's Trainer(enable_checkpointing=...)
    equivalent, /root/reference/configs/config.yaml trainer section)."""
    root, meta, mix_meta = dataset_dir
    import main as cli
    import yaml as _yaml
    from diffmst_tpu.utils.config import load_config

    cfg_path = _write_cfg(tmp_path, root, meta, mix_meta)
    cfg = _yaml.safe_load(open(cfg_path))
    cfg["trainer"]["enable_checkpointing"] = False
    cfg["trainer"]["deterministic_val"] = True
    cfg["trainer"]["fused_steps"] = 2
    cfg["trainer"]["num_sanity_val_steps"] = 0
    cfg_path2 = tmp_path / "cfg_flags.yaml"
    cfg_path2.write_text(_yaml.safe_dump(cfg))

    _, _, trainer = cli.build_from_config(load_config([str(cfg_path2)]))
    assert trainer.enable_checkpointing is False
    assert trainer.deterministic_val is True
    assert trainer.fused_steps == 2
    assert trainer.num_sanity_val_steps == 0

    # unset -> Lightning's default of 2 at the CLI surface (the reference
    # pins the same value, /root/reference/configs/config.yaml:44)
    _, _, trainer_def = cli.build_from_config(load_config([str(cfg_path)]))
    assert trainer_def.num_sanity_val_steps == 2


@pytest.mark.smoke
def test_csvlogger_stays_aligned(tmp_path):
    """New keys in later rows widen the header instead of shifting columns
    (round-1 weak #5)."""
    import csv

    from diffmst_tpu.callbacks import CSVLogger

    path = tmp_path / "m.csv"
    lg = CSVLogger(str(path))
    lg.on_log("train", {"loss": 1.0, "steps_per_sec": 2.0})
    lg.on_log("train", {"loss": 0.5, "steps_per_sec": 2.1})
    lg.on_log("epoch", {"epoch": 0, "epoch_seconds": 12.5})
    lg.on_log("train", {"loss": 0.4, "steps_per_sec": 2.2})

    rows = list(csv.DictReader(open(path)))
    assert len(rows) == 4
    assert rows[0]["loss"] == "1.0" and rows[0]["epoch"] == ""
    assert rows[2]["tag"] == "epoch"
    assert rows[2]["epoch_seconds"] == "12.5" and rows[2]["loss"] == ""
    assert rows[3]["loss"] == "0.4"

    # reopening appends with the widened header intact
    lg2 = CSVLogger(str(path))
    lg2.on_log("val", {"loss": 0.3})
    rows = list(csv.DictReader(open(path)))
    assert rows[4]["tag"] == "val" and rows[4]["loss"] == "0.3"


@pytest.mark.smoke
def test_prefetch_pipeline():
    """Background prefetch yields identical batches in order and propagates
    loader exceptions."""
    from diffmst_tpu.train.trainer import _prefetch, _to_batch

    def loader(n=5, fail_at=None):
        for i in range(n):
            if fail_at is not None and i == fail_at:
                raise RuntimeError("boom")
            tracks = np.full((1, 2, 64), float(i), np.float32)
            zeros = np.zeros((1, 2), np.int32)
            yield tracks, zeros, zeros, zeros.astype(bool), np.zeros(
                (1, 2, 64), np.float32
            ), ["s"]

    got = list(_prefetch(loader(), lambda x: x))
    assert len(got) == 5
    for i, b in enumerate(got):
        assert float(b.tracks[0, 0, 0]) == float(i)

    with pytest.raises(RuntimeError, match="boom"):
        list(_prefetch(loader(fail_at=2), lambda x: x))
