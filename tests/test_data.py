"""Data pipeline tests on synthesized WAV fixtures (no external datasets)."""

import os

import numpy as np
import pytest
import yaml

from diffmst_tpu.data import (
    MultitrackDataModule,
    MultitrackDataset,
    audio_info,
    read_audio,
    write_audio,
)

SR = 44100
LEN = 32768


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    """Synthesize 3 songs x 4 stems (one stereo) + metadata YAML + 2 mixes."""
    root = tmp_path_factory.mktemp("mtk")
    rng = np.random.default_rng(0)
    meta = {"train": {}, "val": {}}
    song_len = LEN * 3
    for split in ("train", "val"):
        for s in range(3 if split == "train" else 1):
            song = f"{split}_song{s}"
            tracks = {}
            for t in range(3):
                name = f"track{t}.wav"
                audio = (rng.normal(size=(1, song_len)) * 0.1).astype(np.float32)
                write_audio(str(root / song / name), audio, SR)
                tracks[name] = ["kick", "vocals", "bass"][t]
            # one stereo stem -> becomes 2 mono tracks
            audio = (rng.normal(size=(2, song_len)) * 0.1).astype(np.float32)
            write_audio(str(root / song / "gtr_st.wav"), audio, SR)
            tracks["gtr_st.wav"] = "electric guitar"
            # one silent stem -> must be rejected by the LUFS gate
            write_audio(
                str(root / song / "silent.wav"),
                np.zeros((1, song_len), np.float32),
                SR,
            )
            tracks["silent.wav"] = "silence"
            meta[split][song] = tracks
    meta_path = root / "meta.yaml"
    meta_path.write_text(yaml.safe_dump(meta))

    mixes = {"train": [], "val": []}
    for split in ("train", "val"):
        for m in range(2):
            rel = f"mixes/{split}_mix{m}.wav"
            audio = (rng.normal(size=(2, song_len)) * 0.2).astype(np.float32)
            write_audio(str(root / rel), audio, SR)
            mixes[split].append(rel)
    mix_meta = root / "mixes.yaml"
    mix_meta.write_text(yaml.safe_dump(mixes))
    return root, str(meta_path), str(mix_meta)


def test_audio_io_roundtrip(tmp_path):
    x = (np.random.default_rng(0).normal(size=(2, 1000)) * 0.1).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_audio(p, x, SR)
    frames, chs, sr = audio_info(p)
    assert (frames, chs, sr) == (1000, 2, SR)
    y, sr2 = read_audio(p)
    assert sr2 == SR and y.shape == (2, 1000)
    np.testing.assert_allclose(y, x, atol=1e-4)
    # sliced read
    y2, _ = read_audio(p, start=100, frames=50)
    np.testing.assert_allclose(y2, y[:, 100:150])


def test_multitrack_dataset_item_contract(dataset_dir):
    root, meta, mix_meta = dataset_dir
    ds = MultitrackDataset(
        track_root_dirs=[str(root)],
        metadata_files=[meta],
        length=LEN,
        min_tracks=2,
        max_tracks=6,
        subset="train",
        buffer_size_gb=0.001,
        num_examples_per_epoch=10,
        min_track_lufs_db=-60.0,
        mix_root_dirs=[str(root)],
        mix_metadata_files=[mix_meta],
    )
    tracks, stereo, instr, padding, mix, name = ds[0]
    assert tracks.shape == (6, LEN)
    assert mix.shape == (2, LEN)
    assert padding.dtype == bool
    # at least min_tracks real tracks; padded tails are silent
    n_real = int((~padding).sum())
    assert n_real >= 2
    assert np.abs(tracks[n_real:]).max() == 0.0
    # stereo pair marking: exactly one first-of-pair flag per loaded song
    assert stereo[:n_real].sum() >= 1
    # loudness-normalized: every real track near -48 LUFS
    from diffmst_tpu.ops.loudness import integrated_loudness

    for i in range(n_real):
        lufs = integrated_loudness(tracks[i], SR)
        # mono stems land at -48; stereo-split channels ~3 dB lower (the file
        # is normalized jointly as stereo, then split — reference behavior)
        assert -52.5 < lufs < -47.0, (i, lufs)
    # real ref mix near -16 LUFS
    assert abs(integrated_loudness(mix.T, SR) - (-16.0)) < 1.0


def test_silent_track_rejected(dataset_dir):
    root, meta, _ = dataset_dir
    ds = MultitrackDataset(
        track_root_dirs=[str(root)],
        metadata_files=[meta],
        length=LEN,
        min_tracks=2,
        max_tracks=8,
        subset="train",
        buffer_size_gb=0.001,
        num_examples_per_epoch=4,
        min_track_lufs_db=-60.0,
    )
    ds.reload_track_buffer()
    for ex in ds.track_buffer:
        # silent.wav must never appear: all buffered tracks are near -48 LUFS
        assert np.abs(ex.tracks).max() > 0


def test_datamodule_batching(dataset_dir):
    root, meta, mix_meta = dataset_dir
    dm = MultitrackDataModule(
        track_root_dirs=[str(root)],
        metadata_files=[meta],
        length=LEN,
        min_tracks=2,
        max_tracks=4,
        batch_size=2,
        num_train_passes=1,
        train_buffer_size_gb=0.001,
        val_buffer_size_gb=0.001,
        min_track_lufs_db=-60.0,
        mix_root_dirs=[str(root)],
        mix_metadata_files=[mix_meta],
    )
    it = dm.train_dataloader()
    tracks, stereo, instr, padding, mix, names = next(it)
    assert tracks.shape == (2, 4, LEN)
    assert mix.shape == (2, 2, LEN)
    assert len(names) == 2


def test_process_sharding_splits_songs(dataset_dir):
    root, meta, _ = dataset_dir
    def mk(pidx):
        return MultitrackDataset(
            track_root_dirs=[str(root)], metadata_files=[meta], length=LEN,
            min_tracks=2, max_tracks=4, subset="train",
            buffer_size_gb=0.001, min_track_lufs_db=-60.0,
            process_index=pidx, process_count=3,
        )
    all_songs = [s for p in range(3) for s, _ in mk(p).songs]
    assert sorted(all_songs) == sorted(
        s for s, _ in MultitrackDataset(
            track_root_dirs=[str(root)], metadata_files=[meta], length=LEN,
            min_tracks=2, max_tracks=4, subset="train",
            buffer_size_gb=0.001, min_track_lufs_db=-60.0,
        ).songs
    )
