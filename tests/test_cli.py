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

    console = AdvancedMixConsole(44100.0)
    remix, tp, fp, mp = Remixer(44100.0)(x, console, jax.random.PRNGKey(1))
    assert remix.shape == x.shape
    assert np.isfinite(np.asarray(remix)).all()
    assert np.abs(np.asarray(remix)).max() <= 4.0 + 1e-5  # tanh clip

    enc = SpectrogramEncoder(embed_dim=16, n_fft=2048, hop_length=128, cnn_base_width=4)
    proj = ParameterProjector(
        embed_dim=32, num_tracks=8, num_track_control_params=27,
        num_fx_bus_control_params=25, num_master_bus_control_params=26,
    )
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
