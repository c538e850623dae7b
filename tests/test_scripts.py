"""Script-level tests: direct optimization converges (the cleanest proof that
loss gradients flow through the full console DSP), eval CSV machinery."""

import csv
import pytest
import sys
import os

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffmst_tpu.console import AdvancedMixConsole
from diffmst_tpu.losses import MultiResolutionSTFTLoss

SR = 44100.0


def test_online_optimization_recovers_gain():
    """Optimize console params so a quiet mix matches a louder target of the
    same material: loss must drop substantially (gradient flow through
    fader+EQ+comp+pan) and the learned gains must boost."""
    from scripts.online import optimize_params

    rng = np.random.default_rng(0)
    t = 16384
    tracks = jnp.asarray(rng.normal(size=(1, 2, t)).astype(np.float32) * 0.01)
    console = AdvancedMixConsole(SR)

    # target: the same tracks rendered with known, louder params
    target_tp = jnp.full((1, 2, 27), 0.5).at[..., 0].set(0.7)  # +19 dB fader
    target_fp = jnp.full((1, 25), 0.5)
    target_mp = jnp.full((1, 26), 0.5)
    target = console(tracks, target_tp, target_fp, target_mp, use_fx_bus=False).mix

    loss = MultiResolutionSTFTLoss(
        fft_sizes=(512,), hop_sizes=(256,), win_lengths=(512,)
    )
    tp, fp, mp, hist = optimize_params(
        tracks, target, console, loss_fn=loss, n_iters=60, lr=0.05, log_every=30
    )
    assert hist[-1] < hist[0] * 0.5, hist
    # learned fader above the 0.5 midpoint (i.e., a boost toward +19 dB)
    assert float(tp[..., 0].mean()) > 0.55


def test_eval_features_and_sum_baseline():
    from scripts.eval_all_combo import equal_loudness_sum, mix_features

    rng = np.random.default_rng(1)
    tracks = (rng.normal(size=(1, 3, 44100)) * 0.1).astype(np.float32)
    tracks[0, 2] *= 1e-6  # near-silent -> excluded from the sum
    mix = equal_loudness_sum(tracks)
    assert mix.shape == (1, 2, 44100)
    assert np.isfinite(mix).all() and np.abs(mix).max() > 0

    feats = mix_features(mix)
    assert set(feats) == {
        "rms", "crest_factor", "stereo_width", "stereo_imbalance",
        "barkspectrum_mean",
    }
    assert all(np.isfinite(v) for v in feats.values())
    # identical channels -> zero width/imbalance
    assert abs(feats["stereo_width"]) < 1e-6
    assert abs(feats["stereo_imbalance"]) < 1e-6


def test_eval_all_combo_main_sum_baseline(tmp_path):
    """eval_all_combo end-to-end (sum baseline, no ckpt): wavs + CSV out."""
    import wave

    import yaml  # noqa: F401  (parity with other tests' imports)

    rng = np.random.default_rng(0)
    song = tmp_path / "examples" / "songA"
    (song / "tracks").mkdir(parents=True)
    sr, total = 44100, 44100 * 2

    def write_wav(path, chans):
        x = (rng.normal(size=(total, chans)) * 0.05 * 32767).astype(np.int16)
        with wave.open(str(path), "wb") as w:
            w.setnchannels(chans)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(x.tobytes())

    for i in range(3):
        write_wav(song / "tracks" / f"t{i}.wav", 1)
    write_wav(song / "ref.wav", 2)

    out_dir = tmp_path / "out"
    import scripts.eval_all_combo as eac

    argv = [
        "--examples_dir", str(tmp_path / "examples"),
        "--output_dir", str(out_dir),
        "--section_len", str(sr),
        "--num_sections", "1",
    ]
    old = sys.argv
    sys.argv = ["eval_all_combo.py"] + argv
    try:
        eac.main()
    finally:
        sys.argv = old

    rows = list(csv.DictReader(open(out_dir / "results.csv")))
    assert len(rows) == 1 and rows[0]["method"] == "sum"
    assert float(rows[0]["mix_rms"]) > 0
    wavs = [f for f in os.listdir(out_dir) if f.endswith(".wav")]
    assert len(wavs) == 1


def _tiny_ckpt_and_song(tmp_path, rng):
    """Save a tiny-model checkpoint + a synthetic 2-second song dir."""
    import wave

    from diffmst_tpu.models import MixStyleTransferModel
    from diffmst_tpu.utils.checkpoint import save_state

    model = MixStyleTransferModel.build(
        embed_dim=32, num_layers=1, cnn_base_width=4,
    )
    t = 44100 * 2
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, t)), jnp.zeros((1, 2, t)),
        jnp.zeros((1, 2), bool),
    )
    ckpt = str(tmp_path / "ckpt")
    save_state(ckpt, {"params": variables["params"],
                      "batch_stats": variables.get("batch_stats", {})})

    song = tmp_path / "examples" / "songA"
    (song / "tracks").mkdir(parents=True)

    def write_wav(path, chans):
        x = (rng.normal(size=(t, chans)) * 0.05 * 32767).astype(np.int16)
        with wave.open(str(path), "wb") as w:
            w.setnchannels(chans)
            w.setsampwidth(2)
            w.setframerate(44100)
            w.writeframes(x.tobytes())

    for i in range(2):
        write_wav(song / "tracks" / f"t{i}.wav", 1)
    write_wav(song / "ref.wav", 2)
    return ckpt, str(tmp_path / "examples")


def test_eval_listen_main(tmp_path):
    """eval_listen end-to-end with a tiny checkpoint: one wav per
    (section, level), reference loudness sweep applied."""
    import scripts.eval_listen as el

    rng = np.random.default_rng(1)
    ckpt, examples = _tiny_ckpt_and_song(tmp_path, rng)
    out_dir = str(tmp_path / "out")
    old = sys.argv
    sys.argv = ["eval_listen.py", "--examples_dir", examples,
                "--output_dir", out_dir, "--ckpt", ckpt,
                "--levels", "-24", "-12",
                "--embed_dim", "32", "--num_layers", "1",
                "--cnn_base_width", "4"]
    try:
        el.main()
    finally:
        sys.argv = old
    wavs = sorted(os.listdir(os.path.join(out_dir, "songA")))
    assert wavs == ["sec0_ref-12lufs.wav", "sec0_ref-24lufs.wav"]


def test_eval_ablation_main(tmp_path):
    """eval_ablation end-to-end: full/mono/quiet/lowpassed renders + CSV."""
    import scripts.eval_ablation as ea

    rng = np.random.default_rng(2)
    ckpt, examples = _tiny_ckpt_and_song(tmp_path, rng)
    out_dir = str(tmp_path / "out")
    old = sys.argv
    sys.argv = ["eval_ablation.py", "--examples_dir", examples,
                "--output_dir", out_dir, "--ckpt", ckpt,
                "--embed_dim", "32", "--num_layers", "1",
                "--cnn_base_width", "4"]
    try:
        ea.main()
    finally:
        sys.argv = old
    rows = list(csv.DictReader(open(os.path.join(out_dir, "ablation.csv"))))
    assert {r["ablation"] for r in rows} == {"full", "mono", "quiet", "lowpassed"}
    wavs = [f for f in os.listdir(out_dir) if f.endswith(".wav")]
    assert len(wavs) == 4


def test_datasets_and_info_scripts(tmp_path, capsys):
    """datasets.py splits stereo to L/R mono + resamples; info.py censuses."""
    import wave

    import scripts.datasets as ds
    import scripts.info as info

    rng = np.random.default_rng(3)
    in_dir = tmp_path / "in" / "song"
    in_dir.mkdir(parents=True)
    x = (rng.normal(size=(48000, 2)) * 0.05 * 32767).astype(np.int16)
    with wave.open(str(in_dir / "st.wav"), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(48000)
        w.writeframes(x.tobytes())

    out_dir = tmp_path / "out"
    old = sys.argv
    sys.argv = ["datasets.py", "--input_dir", str(tmp_path / "in"),
                "--output_dir", str(out_dir), "--sr", "44100"]
    try:
        ds.main()
    finally:
        sys.argv = old
    made = sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(out_dir) for f in fs if f.endswith(".wav")
    )
    assert len(made) == 2  # L and R mono
    from diffmst_tpu.data import audio_info

    frames, chs, sr = audio_info(made[0])
    assert (chs, sr) == (1, 44100)
    assert abs(frames - 44100) <= 2  # 1 s resampled

    sys.argv = ["info.py", "--root", str(out_dir)]
    try:
        info.main()
    finally:
        sys.argv = old
    out = capsys.readouterr().out
    assert "1ch" in out or "1" in out


def test_gain_testing_script(tmp_path, capsys):
    """gain_testing prints per-track predicted gains against a single-stem
    reference (random-weights model: just the plumbing contract)."""
    import wave

    import scripts.gain_testing as gt

    rng = np.random.default_rng(4)
    tdir = tmp_path / "tracks"
    tdir.mkdir()
    t = 44100 * 2
    for i in range(2):
        x = (rng.normal(size=(t, 1)) * 0.05 * 32767).astype(np.int16)
        with wave.open(str(tdir / f"t{i}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(44100)
            w.writeframes(x.tobytes())

    old = sys.argv
    sys.argv = ["gain_testing.py", "--track_dir", str(tdir),
                "--embed_dim", "32", "--num_layers", "1",
                "--cnn_base_width", "4", "--length", str(t)]
    try:
        gt.main()
    finally:
        sys.argv = old
    out = capsys.readouterr().out
    assert "t0.wav" in out and "dB" in out  # per-track gain lines printed


@pytest.mark.smoke
def test_compare_script(tmp_path):
    """compare.py (ref scripts/compare.py:33-59): two synthetic mixes ->
    features.csv with the five AFLoss scalars + a bark-spectrum plot; the
    louder mix must show higher RMS and the wider mix higher stereo width."""
    from diffmst_tpu.data import write_audio

    import scripts.compare as cmp

    rng = np.random.default_rng(7)
    t = 44100
    base = rng.normal(size=(1, t)).astype(np.float32) * 0.05
    # a: near-mono, quiet; b: louder with decorrelated channels (wider)
    a = np.concatenate([base, base * 0.98], axis=0)
    b = np.concatenate(
        [base * 4.0, rng.normal(size=(1, t)).astype(np.float32) * 0.2], axis=0
    )
    pa, pb = str(tmp_path / "mix_a.wav"), str(tmp_path / "mix_b.wav")
    write_audio(pa, a, 44100)
    write_audio(pb, b, 44100)

    out_dir = cmp.main([pa, pb, "--output_dir", str(tmp_path / "out")])

    csv_path = os.path.join(out_dir, "features.csv")
    assert os.path.exists(csv_path)
    rows = {}
    with open(csv_path) as f:
        for r in csv.DictReader(f):
            rows[(r["feature"], r["mix"])] = float(r["value"])
    assert rows[("rms_l", "b")] > rows[("rms_l", "a")]
    assert rows[("stereo_width", "b")] > rows[("stereo_width", "a")]
    # bark spectrum: mid-band log magnitude of b above a (b is louder)
    feats = cmp.compare_mixes(pa, pb)
    assert feats["b"]["barkspectrum"][:, 0].mean() > feats["a"]["barkspectrum"][:, 0].mean()
    # plot written iff matplotlib available
    try:
        import matplotlib  # noqa: F401

        assert os.path.exists(os.path.join(out_dir, "bark_spectrum.png"))
    except ImportError:
        pass


def test_summarize_eval_table(tmp_path, capsys):
    """summarize_eval aggregates per-method feature distances and declares
    wins on the right side of each metric (distance down, sisdr up)."""
    import scripts.summarize_eval as se

    csv_path = tmp_path / "results.csv"
    fields = ["song", "method", "track_start", "ref_start"]
    for f in se.FEATURES:
        fields += [f"mix_{f}", f"ref_{f}"]
    fields += ["mrstft_to_ref", "sisdr_to_ref"]
    with open(csv_path, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=fields)
        w.writeheader()
        for method, off, mr, sd in (("diffmst", 0.1, 1.0, -5.0),
                                    ("sum", 0.5, 2.0, -20.0)):
            row = {"song": "s0", "method": method, "track_start": 0,
                   "ref_start": 0, "mrstft_to_ref": mr, "sisdr_to_ref": sd}
            for f in se.FEATURES:
                row[f"mix_{f}"] = 1.0 + off
                row[f"ref_{f}"] = 1.0
            w.writerow(row)

    out_md = tmp_path / "summary.md"
    old_argv = sys.argv
    try:
        sys.argv = ["summarize_eval", str(csv_path), "--out", str(out_md)]
        se.main()
    finally:
        sys.argv = old_argv
    text = out_md.read_text()
    # diffmst is closer on every feature, lower mrstft, higher sisdr
    assert "diffmst beats the equal-loudness sum on 7/7 metrics" in text
    assert "| diffmst | 1 | " in text


def test_make_eval_songs_layout(tmp_path):
    """make_eval_songs writes the reference eval layout (tracks/ + ref.wav)
    with finite audio and the naive-mix reference at the training flags."""
    from scripts.make_eval_songs import main as make_main
    from diffmst_tpu.data import read_audio

    out = tmp_path / "songs"
    old_argv = sys.argv
    try:
        sys.argv = ["make_eval_songs", "--out", str(out), "--n", "1",
                    "--t", "16384"]
        make_main()
    finally:
        sys.argv = old_argv

    song = out / "song_00"
    stems = sorted((song / "tracks").glob("*.wav"))
    assert len(stems) == 8
    a, sr = read_audio(str(stems[0]))
    assert sr == 44100 and a.shape[-1] == 16384
    assert np.isfinite(a).all()
    # stems staged at -48 dB peak
    assert np.abs(a).max() == pytest.approx(10 ** (-48 / 20), rel=0.1)
    ref, _ = read_audio(str(song / "ref.wav"))
    assert ref.shape == (2, 16384)
    assert np.isfinite(ref).all()
    # reference mix is peak-normalized
    assert np.abs(ref).max() == pytest.approx(1.0, rel=0.05)
