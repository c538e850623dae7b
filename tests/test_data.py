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


@pytest.mark.smoke
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


def test_vendored_metadata_and_reference_configs():
    """The vendored data/*.yaml + configs/data twins resolve without editing
    (round-1 missing #4): every metadata file parses, splits are non-empty,
    and the reference-named configs instantiate a DataModule."""
    import glob

    from diffmst_tpu.utils.config import load_config

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in ("medley.yaml", "cambridge.yaml"):
        with open(os.path.join(repo, "data", name)) as f:
            meta = yaml.safe_load(f)
        assert meta.get("train") and meta.get("val"), name
    assert os.path.exists(os.path.join(repo, "data", "instrument_name2id.json"))
    assert os.path.exists(os.path.join(repo, "data", "knowledge_engineering.yaml"))

    cfgs = glob.glob(os.path.join(repo, "configs", "data", "medley+cambridge*.yaml"))
    assert len(cfgs) >= 4
    for cfg_path in cfgs:
        cfg = load_config([cfg_path])["data"]
        # metadata paths are repo-relative; resolve and construct the module
        args = dict(cfg["init_args"])
        args["metadata_files"] = [
            os.path.join(repo, p.lstrip("./")) for p in args["metadata_files"]
        ]
        args["instrument_name2id_json"] = os.path.join(
            repo, args["instrument_name2id_json"].lstrip("./")
        )
        args["mix_root_dirs"] = []  # no jamendo audio in CI
        dm = MultitrackDataModule(**args)
        assert len(dm.train_dataset.songs) > 50
        assert len(dm.val_dataset.songs) > 5
        assert dm.train_dataset.instrument_name2id.get("kick drum") is not None


def test_randomize_ref_mix_gain(dataset_dir):
    root, meta, mix_meta = dataset_dir
    kwargs = dict(
        track_root_dirs=[str(root)],
        metadata_files=[meta],
        mix_root_dirs=[str(root)],
        mix_metadata_files=[mix_meta],
        length=LEN,
        min_tracks=2,
        max_tracks=4,
        buffer_size_gb=0.001,
        min_track_lufs_db=-60.0,
        seed=7,
    )
    ds_plain = MultitrackDataset(**kwargs)
    ds_rand = MultitrackDataset(randomize_ref_mix_gain=True, **kwargs)
    # same seed -> same buffered mixes; the randomized one applies a
    # -16..+12 dB gain on top (dataloader.py:411-414)
    m0 = ds_plain[0][4]
    m1 = ds_rand[0][4]
    assert m0.shape == m1.shape
    ratios = m1[np.abs(m0) > 1e-6] / m0[np.abs(m0) > 1e-6]
    assert ratios.std() < 1e-4  # a single scalar gain
    r = float(np.median(np.abs(ratios)))
    assert 10 ** (-16 / 20) * 0.9 <= r <= 10 ** (12 / 20) * 1.1
    assert abs(r - 1.0) > 1e-3  # actually applied


def test_test_dataloader_split(dataset_dir):
    """DataModule builds a test split lazily with batch_size=1
    (dataloader.py:496-516; round-1 partial #27)."""
    root, meta, mix_meta = dataset_dir
    # add a "test" split to a copy of the metadata
    with open(meta) as f:
        m = yaml.safe_load(f)
    m["test"] = m["val"]
    meta2 = os.path.join(os.path.dirname(meta), "meta_with_test.yaml")
    with open(meta2, "w") as f:
        yaml.safe_dump(m, f)

    dm = MultitrackDataModule(
        track_root_dirs=[str(root)],
        metadata_files=[meta2],
        length=LEN,
        min_tracks=2,
        max_tracks=4,
        batch_size=2,
        num_train_passes=0,
        train_buffer_size_gb=0.001,
        val_buffer_size_gb=0.001,
        test_buffer_size_gb=0.001,
        min_track_lufs_db=-60.0,
    )
    assert dm.test_dataset is None  # lazy
    it = dm.test_dataloader()
    batch = next(it)
    assert batch[0].shape[0] == 1  # batch_size 1 (reference contract)
    assert dm.test_dataset is not None
    assert dm.test_dataset.subset == "test"


def test_mix_glob_discovery(dataset_dir):
    """MixDataset/mix buffer discover wavs by recursive glob when no
    metadata list is given (reference dataloader.py:25-26)."""
    from diffmst_tpu.data import MixDataset

    root, meta, mix_meta = dataset_dir
    ds = MixDataset(root_dirs=[str(root)], length=LEN, seed=3)
    assert len(ds.paths) > 4  # found the synthesized wavs
    x = ds[0]
    assert x.shape == (2, LEN) or x.shape[0] in (1, 2)


@pytest.mark.smoke
def test_compressed_formats_fail_loudly(tmp_path):
    """Decode contract: FLAC/OGG/MP3 raise a named error with the remedy,
    not a silent unreadable-file skip (reference reads these via soundfile,
    dataloader.py:205 — here the offline preprocessor owns transcoding)."""
    from diffmst_tpu.data.audio_io import UnsupportedAudioFormat

    cases = {
        "a.flac": b"fLaC\x00\x00\x00\x22" + b"\x00" * 64,
        "b.ogg": b"OggS\x00\x02" + b"\x00" * 64,
        "c.mp3": b"ID3\x04\x00" + b"\x00" * 64,
        "d.m4a": b"\x00\x00\x00\x20ftypM4A " + b"\x00" * 64,
    }
    for name, payload in cases.items():
        p = tmp_path / name
        p.write_bytes(payload)
        with pytest.raises(UnsupportedAudioFormat, match="scripts/datasets.py"):
            audio_info(str(p))
        with pytest.raises(UnsupportedAudioFormat, match="WAV only"):
            read_audio(str(p))
    # the error must propagate out of the buffered dataset load, not be
    # swallowed by its skip-unreadable path
    song = tmp_path / "song"
    song.mkdir()
    (song / "gtr.flac").write_bytes(cases["a.flac"])
    meta = tmp_path / "meta.yaml"
    meta.write_text(yaml.safe_dump({"train": {"song": {"gtr.flac": "electric guitar"}}}))
    ds = MultitrackDataset(
        track_root_dirs=[str(tmp_path)],
        metadata_files=[str(meta)],
        mix_root_dirs=[],
        mix_metadata_files=[],
        length=LEN,
        min_tracks=1,
        max_tracks=4,
        buffer_size_gb=0.001,
        num_examples_per_epoch=2,
        subset="train",
    )
    with pytest.raises(UnsupportedAudioFormat):
        ds.reload_track_buffer()


def test_truncated_wav_skipped_not_crash(tmp_path):
    """Skip-unreadable invariant: a damaged WAV (truncated header →
    wave.Error / EOFError, neither an OSError) is skipped by every dataset
    decode site, mirroring the reference's silent soundfile-failure skip
    (dataloader.py:205) — only *recognizable compressed formats* fail
    loudly."""
    from diffmst_tpu.data import MixDataset

    rng = np.random.default_rng(0)
    good = rng.normal(size=(2, LEN * 2)).astype(np.float32) * 0.25
    write_audio(str(tmp_path / "good.wav"), good, SR)
    # a RIFF header that dies mid-parse: valid magic, garbage after
    (tmp_path / "bad.wav").write_bytes(b"RIFF\x24\x00\x00\x00WAVE" + b"\x01" * 8)
    ds = MixDataset(root_dirs=[str(tmp_path)], length=LEN, seed=0,
                    num_examples_per_epoch=2)
    assert len(ds.paths) == 2
    x = ds[0]  # must skip bad.wav and land on good.wav, not raise
    assert x.shape == (2, LEN)


def test_wav_size_field_spelling_magic_not_rejected(tmp_path):
    """A genuine RIFF/WAV whose little-endian size field happens to spell a
    compressed-format magic (e.g. 'ftyp' at offset 4) must NOT be rejected
    by the sniffer — RIFF files are exempt from magic matching."""
    from diffmst_tpu.data.audio_io import _reject_compressed

    p = tmp_path / "odd_size.wav"
    p.write_bytes(b"RIFF" + b"ftyp" + b"WAVE" + b"\x00" * 32)
    _reject_compressed(str(p))  # must not raise
