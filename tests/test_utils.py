"""Tests for inference OLA, config registry, and torch checkpoint porting."""

import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import yaml

from diffmst_tpu.console import BasicMixConsole
from diffmst_tpu.utils import (
    batch_stereo_peak_normalize,
    instantiate,
    load_config,
    overlap_add_render,
    run_diffmst,
)

SR = 44100.0


@pytest.mark.smoke
def test_peak_normalize():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 2, 100)) * 5)
    y = np.asarray(batch_stereo_peak_normalize(x))
    assert np.allclose(np.abs(y).max(axis=(1, 2)), 1.0, atol=1e-5)


@pytest.mark.smoke
def test_overlap_add_identity():
    """With an identity 'console', Hann OLA must reconstruct the signal
    (hop = win/2 Hann pairs sum to 1; first-window-half forced to 1)."""
    rng = np.random.default_rng(0)
    total, win = 4096 * 3 + 123, 4096
    tracks = rng.normal(size=(1, 2, total)).astype(np.float32)

    def render(wins):
        return jnp.stack([wins[:, 0], wins[:, 1]], axis=1)

    out = overlap_add_render(render, tracks, win)
    # interior reconstructs exactly; tail may be attenuated by the final
    # half-window (reference behavior)
    np.testing.assert_allclose(out[0, :, : total - win // 2],
                               tracks[0, :, : total - win // 2], atol=1e-4)


def test_run_diffmst_gates_and_renders():
    rng = np.random.default_rng(1)
    total = 16384 * 3
    tracks = np.zeros((1, 3, total), np.float32)
    tracks[0, 0] = rng.normal(size=total) * 0.1
    tracks[0, 1] = rng.normal(size=total) * 0.05
    # track 2 stays silent -> gated out
    ref = (rng.normal(size=(1, 2, 16384)) * 0.1).astype(np.float32)

    calls = {}

    def fake_model(t, r):
        calls["tracks_shape"] = t.shape
        n = t.shape[1]
        return (jnp.full((1, n, 2), 0.5), jnp.zeros((1, 0)), jnp.zeros((1, 0)))

    console = BasicMixConsole(SR)
    mix, td, fd, md = run_diffmst(
        tracks, ref, fake_model, console, analysis_len=16384
    )
    assert calls["tracks_shape"][1] == 2  # silent track gated
    assert mix.shape == (1, 2, total)
    assert np.isfinite(mix).all()
    assert "input_fader" in td


def test_run_diffmst_pcm16_output():
    """output_format='pcm16' returns int16 that is exactly the float mix
    quantized with the PCM_16 mapping (device-side, 4x less transfer)."""
    rng = np.random.default_rng(3)
    total = 16384 * 3
    tracks = (rng.normal(size=(1, 2, total)) * 0.1).astype(np.float32)
    ref = (rng.normal(size=(1, 2, 16384)) * 0.1).astype(np.float32)

    def fake_model(t, r):
        n = t.shape[1]
        return (jnp.full((1, n, 2), 0.5), jnp.zeros((1, 0)), jnp.zeros((1, 0)))

    console = BasicMixConsole(SR)
    mix_f, *_ = run_diffmst(tracks, ref, fake_model, console, analysis_len=16384)
    mix_i, *_ = run_diffmst(
        tracks, ref, fake_model, console, analysis_len=16384,
        output_format="pcm16",
    )
    assert mix_i.dtype == np.int16
    assert mix_i.shape == (1, 2, total)
    expect = np.clip(np.round(mix_f * 32767.0), -32768, 32767).astype(np.int16)
    assert np.abs(mix_i.astype(np.int32) - expect.astype(np.int32)).max() <= 1

    with pytest.raises(ValueError):
        run_diffmst(
            tracks, ref, fake_model, console, analysis_len=16384,
            output_format="mp3",
        )


@pytest.mark.smoke
def test_config_instantiate_reference_yaml():
    """The reference's shipped model YAML structure loads via aliases."""
    node = yaml.safe_load(
        """
        class_path: mst.modules.AdvancedMixConsole
        init_args:
          sample_rate: 44100
          input_min_gain_db: -48.0
          input_max_gain_db: 48.0
        """
    )
    console = instantiate(node)
    from diffmst_tpu.console import AdvancedMixConsole

    assert isinstance(console, AdvancedMixConsole)
    assert console.num_track_control_params == 27

    fn = instantiate("mst.mixing.naive_random_mix")
    from diffmst_tpu.mixing import naive_random_mix

    assert fn is naive_random_mix


def test_config_classmethod_factory_and_tpu_recipe():
    """class_path may name a classmethod factory (Class.build), and the
    shipped TPU recipe config (configs/models/naive+tpu.yaml) instantiates
    a bf16-compute, rematerialized flagship model."""
    node = yaml.safe_load(
        """
        class_path: diffmst_tpu.models.MixStyleTransferModel.build
        init_args: {embed_dim: 32, num_layers: 1, nhead: 4, cnn_base_width: 4,
                    compute_dtype: bfloat16, remat_encoders: true}
        """
    )
    model = instantiate(node)
    from diffmst_tpu.models import MixStyleTransferModel

    assert isinstance(model, MixStyleTransferModel)
    assert model.controller.dtype == jnp.bfloat16

    cfg = yaml.safe_load(
        open(os.path.join(os.path.dirname(__file__), "..",
                          "configs", "models", "naive+tpu.yaml"))
    )
    system_node = cfg["model"]
    model_node = system_node["init_args"]["model"]
    assert model_node["class_path"].endswith("MixStyleTransferModel.build")
    # small-ify the flagship geometry so instantiation is cheap
    model_node["init_args"].update(
        embed_dim=32, num_layers=1, nhead=4, cnn_base_width=4
    )
    m2 = instantiate(model_node)
    assert isinstance(m2, MixStyleTransferModel)

    import pytest as _pytest

    with _pytest.raises(ImportError):
        instantiate({"class_path": "diffmst_tpu.models.NoSuchThing.build"})


def test_config_overlay(tmp_path):
    a = tmp_path / "a.yaml"
    b = tmp_path / "b.yaml"
    a.write_text("model:\n  lr: 1\n  x: 2\n")
    b.write_text("model:\n  lr: 3\n")
    cfg = load_config([str(a), str(b)])
    assert cfg["model"] == {"lr": 3, "x": 2}


def test_torch_checkpoint_port_roundtrip():
    """Port a freshly-built torch controller+encoder state dict and verify the
    Flax tree slots in (structure + a numerical spot check on the controller)."""
    torch = pytest.importorskip("torch")
    from diffmst_tpu.models import MixStyleTransferModel
    from diffmst_tpu.utils.checkpoint import port_torch_state_dict

    d = 64
    # build a torch state dict with the reference's naming
    sd = {}
    enc_layer = torch.nn.TransformerEncoderLayer(d, 4, batch_first=True, dropout=0.0)
    tenc = torch.nn.TransformerEncoder(enc_layer, num_layers=2)
    for k, v in tenc.state_dict().items():
        sd[f"model.controller.transformer_encoder.{k}"] = v
    for tok, shape in [("track_embedding", (1, 1, d)), ("mix_embedding", (1, 2, d)),
                       ("fx_bus_embedding", (1, 1, d)), ("master_bus_embedding", (1, 1, d))]:
        sd[f"model.controller.{tok}"] = torch.randn(*shape)
    for head, n in [("track_projection", 27), ("fx_bus_projection", 25),
                    ("master_bus_projection", 26)]:
        lin = torch.nn.Linear(d, n)
        sd[f"model.controller.{head}.weight"] = lin.weight.data
        sd[f"model.controller.{head}.bias"] = lin.bias.data

    ported = port_torch_state_dict({k: v.numpy() for k, v in sd.items()}, embed_dim=d)
    ctrl_params = ported["params"]["controller"]
    assert set(ctrl_params) >= {
        "track_embedding", "mix_embedding", "fx_bus_embedding",
        "master_bus_embedding", "transformer_encoder", "track_projection",
    }

    # numerical check: ported controller == torch controller on same inputs
    from diffmst_tpu.models import TransformerController

    ctrl = TransformerController(
        embed_dim=d, num_track_control_params=27,
        num_fx_bus_control_params=25, num_master_bus_control_params=26,
        num_layers=2, nhead=4,
    )
    te = np.random.default_rng(0).normal(size=(1, 3, d)).astype(np.float32)
    me = np.random.default_rng(1).normal(size=(1, 2, d)).astype(np.float32)
    ours_tp, ours_fp, ours_mp = ctrl.apply(
        {"params": ctrl_params}, jnp.asarray(te), jnp.asarray(me)
    )

    with torch.no_grad():
        t_te = torch.from_numpy(te) + sd["model.controller.track_embedding"].repeat(1, 3, 1)
        t_me = torch.from_numpy(me) + sd["model.controller.mix_embedding"]
        seq = torch.cat([t_te, t_me,
                         sd["model.controller.fx_bus_embedding"],
                         sd["model.controller.master_bus_embedding"]], dim=1)
        tenc.eval()
        z = tenc(seq)
        wt = sd["model.controller.track_projection.weight"]
        bt = sd["model.controller.track_projection.bias"]
        ref_tp = torch.sigmoid(z[:, :3, :] @ wt.T + bt).numpy()
    np.testing.assert_allclose(np.asarray(ours_tp), ref_tp, atol=3e-5)


def test_cnn14_torch_port_numerical():
    """Port a torch Cnn14 state dict and check numerical forward parity."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from diffmst_tpu.models import Cnn14
    from diffmst_tpu.utils.checkpoint import port_torch_state_dict

    # Single conv block torch-side (bn in eval mode with random stats)
    tconv1 = torch.nn.Conv2d(1, 8, 3, padding=1, bias=False)
    tbn1 = torch.nn.BatchNorm2d(8)
    tconv2 = torch.nn.Conv2d(8, 8, 3, padding=1, bias=False)
    tbn2 = torch.nn.BatchNorm2d(8)
    with torch.no_grad():
        for bn in (tbn1, tbn2):
            bn.running_mean.normal_(0, 0.1)
            bn.running_var.uniform_(0.5, 1.5)
            bn.weight.normal_(1, 0.1)
            bn.bias.normal_(0, 0.1)
    tbn1.eval(), tbn2.eval()

    sd = {}
    for name, mod in [("conv1", tconv1), ("bn1", tbn1), ("conv2", tconv2), ("bn2", tbn2)]:
        for k, v in mod.state_dict().items():
            if k == "num_batches_tracked":
                continue
            sd[f"model.track_encoder.model.conv_block1.{name}.{k}"] = v.numpy()

    ported = port_torch_state_dict(sd, embed_dim=8)
    blk = ported["params"]["track_encoder"]["model"]["conv_block1"]
    stats = ported["batch_stats"]["track_encoder"]["model"]["conv_block1"]

    from diffmst_tpu.models.cnn14 import ConvBlock

    x = np.random.default_rng(0).normal(size=(1, 8, 16, 1)).astype(np.float32)
    flax_blk = ConvBlock(out_channels=8)
    out = flax_blk.apply(
        {"params": blk, "batch_stats": stats}, jnp.asarray(x), (2, 2), train=False
    )
    with torch.no_grad():
        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))  # NHWC -> NCHW
        ty = F.relu(tbn1(tconv1(tx)))
        ty = F.relu(tbn2(tconv2(ty)))
        ty = F.avg_pool2d(ty, (2, 2))
        ref = np.transpose(ty.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5)


def test_full_model_port_numerical():
    """Port a COMPLETE torch MixStyleTransferModel state_dict (architecture
    twin of /root/reference/mst/modules.py:17-68 + panns.py Cnn14 + the
    transformer controller, built in tests/torch_model_ref.py with the
    reference's parameter naming) and assert end-to-end output parity of the
    whole model — STFT front end, 6-block Cnn14 encoders with eval-mode BN,
    controller, sigmoid heads (mst/utils.py:224-249's loader contract)."""
    torch = pytest.importorskip("torch")
    import torch_model_ref as tmr

    from diffmst_tpu.models import MixStyleTransferModel
    from diffmst_tpu.utils.checkpoint import port_torch_state_dict

    d, width = 32, 8
    torch.manual_seed(0)
    tmodel = tmr.MixStyleTransferModel(
        embed_dim=d, base_width=width, num_layers=2, nhead=4
    )
    tmr.randomize_batchnorm_stats(tmodel)
    tmodel.eval()

    sd = {f"model.{k}": v.numpy() for k, v in tmodel.state_dict().items()}
    ported = port_torch_state_dict(sd, embed_dim=d)

    model = MixStyleTransferModel.build(
        embed_dim=d, num_layers=2, nhead=4, cnn_base_width=width
    )

    rng = np.random.default_rng(0)
    seq = 512 * 128  # >= 128 frames for the Cnn14 pool schedule
    tracks = (rng.normal(size=(1, 2, seq)) * 0.1).astype(np.float32)
    ref = (rng.normal(size=(1, 2, seq)) * 0.1).astype(np.float32)

    tp, fp, mp = jax.jit(model.apply)(
        {"params": ported["params"], "batch_stats": ported["batch_stats"]},
        jnp.asarray(tracks), jnp.asarray(ref),
    )
    with torch.no_grad():
        ttp, tfp, tmp_ = tmodel(torch.from_numpy(tracks), torch.from_numpy(ref))

    np.testing.assert_allclose(np.asarray(tp), ttp.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(fp), tfp.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(mp), tmp_.numpy(), atol=2e-4)


@pytest.mark.smoke
def test_plotting_helpers(tmp_path):
    """plot_spectrograms / plot_confusion_matrix produce images and save to
    disk (reference callbacks/plotting.py:15-131)."""
    from diffmst_tpu.callbacks.plotting import (
        plot_confusion_matrix,
        plot_spectrograms,
    )

    rng = np.random.default_rng(0)
    sig = rng.normal(size=16384).astype(np.float32) * 0.1
    p = str(tmp_path / "spec.png")
    img = plot_spectrograms(sig, sig * 0.5, sig * 0.25, filename=p)
    assert img is not None and img.ndim == 3 and img.shape[2] == 3
    assert img.dtype == np.uint8
    assert os.path.exists(p)

    cm = plot_confusion_matrix(
        [0, 1, 2, 1], [0, 1, 1, 1], labels=["a", "b", "c"],
        filename=str(tmp_path / "cm.png"),
    )
    assert cm is not None and cm.dtype == np.uint8
    assert os.path.exists(str(tmp_path / "cm.png"))


def test_streaming_render_matches_one_shot():
    """Overlap-save streaming render == single full-length render in the
    interior (the causal-smoother state converges inside the context);
    Hann OLA — which cross-fades disagreeing renders — is an order of
    magnitude worse there. (SURVEY §5.7: state continuity across blocks.)"""
    from diffmst_tpu.console import AdvancedMixConsole
    from diffmst_tpu.utils.inference import (
        overlap_add_render,
        overlap_save_render,
    )

    console = AdvancedMixConsole(44100.0, comp_smoother="scan")
    key = jax.random.PRNGKey(0)
    T = 98304
    tracks = np.asarray(
        jax.random.normal(key, (1, 3, T), jnp.float32) * 10 ** (-24 / 20)
    )
    k1, k2, k3 = jax.random.split(key, 3)
    tp0 = jax.random.uniform(k1, (1, 3, 27))
    fp0 = jax.random.uniform(k2, (1, 25))
    mp0 = jax.random.uniform(k3, (1, 26))

    @jax.jit
    def render(wins):
        n = wins.shape[0]
        return console(
            wins, jnp.tile(tp0, (n, 1, 1)), jnp.tile(fp0, (n, 1)),
            jnp.tile(mp0, (n, 1)), use_fx_bus=False,
        ).mix

    one = np.asarray(render(jnp.asarray(tracks)))
    ols = overlap_save_render(render, tracks, block_len=16384, context_len=16384)
    ola = overlap_add_render(render, tracks, 32768)

    peak = np.abs(one).max()
    # skip the first block: every method (including the one-shot itself)
    # has circular-wrap artifacts at t=0 from the freq-sampling EQ and the
    # circular lookahead roll
    err_ols = np.abs(ols - one)[..., 16384:].max() / peak
    err_ola = np.abs(ola - one)[..., 16384:].max() / peak
    assert err_ols < 1e-3, err_ols
    assert err_ols < 0.1 * err_ola  # streaming strictly better than OLA


def test_device_ola_matches_host_ola():
    """run_diffmst's one-dispatch device OLA pipeline must reproduce the
    host-assembled Hann-OLA render exactly (same console, same params) —
    including the window-count padding bucket (total not a multiple of
    hop*group_bs)."""
    from diffmst_tpu.console import AdvancedMixConsole
    from diffmst_tpu.utils.inference import overlap_add_render

    console = AdvancedMixConsole(SR, comp_smoother="scan")
    rng = np.random.default_rng(3)
    total = 16384 * 2 + 5000  # ragged tail
    tracks = (rng.normal(size=(1, 3, total)) * 0.05).astype(np.float32)
    ref = (rng.normal(size=(1, 2, 16384)) * 0.1).astype(np.float32)

    tp0 = jnp.asarray(rng.uniform(size=(1, 3, 27)).astype(np.float32))
    fp0 = jnp.asarray(rng.uniform(size=(1, 25)).astype(np.float32))
    mp0 = jnp.asarray(rng.uniform(size=(1, 26)).astype(np.float32))

    def fake_model(t, r):
        return tp0, fp0, mp0

    mix_dev, *_ = run_diffmst(
        tracks, ref, fake_model, console, analysis_len=16384
    )

    key = jax.random.PRNGKey(0)

    @jax.jit
    def render(wins):
        n = wins.shape[0]
        return console(
            wins, jnp.tile(tp0, (n, 1, 1)), jnp.tile(fp0, (n, 1)),
            jnp.tile(mp0, (n, 1)), use_fx_bus=False, key=key,
        ).mix

    # host path on the already-normalized tracks run_diffmst derived
    from diffmst_tpu.ops.loudness import integrated_loudness

    norm = np.stack([
        tracks[0, i]
        * 10 ** ((-48.0 - integrated_loudness(tracks[0, i, :16384], SR)) / 20.0)
        for i in range(3)
    ])[None]
    mix_host = overlap_add_render(render, norm, 16384)
    np.testing.assert_allclose(mix_dev, mix_host, atol=2e-5)


def test_run_diffmst_streaming_mode():
    """render_mode='streaming' produces a full-length finite render close to
    the OLA render away from block boundaries."""
    rng = np.random.default_rng(2)
    total = 16384 * 3
    tracks = (rng.normal(size=(1, 2, total)) * 0.1).astype(np.float32)
    ref = (rng.normal(size=(1, 2, 16384)) * 0.1).astype(np.float32)

    def fake_model(t, r):
        n = t.shape[1]
        return (jnp.full((1, n, 2), 0.5), jnp.zeros((1, 0)), jnp.zeros((1, 0)))

    console = BasicMixConsole(SR)
    mix_s, *_ = run_diffmst(
        tracks, ref, fake_model, console, analysis_len=16384,
        render_mode="streaming",
    )
    mix_o, *_ = run_diffmst(
        tracks, ref, fake_model, console, analysis_len=16384,
    )
    assert mix_s.shape == (1, 2, total)
    assert np.isfinite(mix_s).all()
    # gain+pan console is stateless -> both methods must agree exactly
    np.testing.assert_allclose(mix_s, mix_o, atol=1e-4)


def test_audio_callbacks(tmp_path):
    """LogAudioCallback writes comparison clips; LogReferenceMix renders a
    fixed song; save_param_table dumps denormalized params."""
    from diffmst_tpu.callbacks.audio import (
        LogAudioCallback,
        LogReferenceMix,
        save_param_table,
    )
    from diffmst_tpu.console import BasicMixConsole
    from diffmst_tpu.data import write_audio

    rng = np.random.default_rng(0)
    audio = {
        "ref_mix_a": rng.normal(size=(2, 2, 4096)).astype(np.float32) * 0.1,
        "ref_mix_b": rng.normal(size=(2, 2, 4096)).astype(np.float32) * 0.1,
        "pred_mix_b": rng.normal(size=(2, 2, 4096)).astype(np.float32) * 0.1,
    }
    audio["pred_params"] = (
        np.full((2, 3, 2), 0.5, np.float32), np.zeros((2, 0)), np.zeros((2, 0))
    )
    cb = LogAudioCallback(
        output_dir=str(tmp_path / "aud"), num_examples=2,
        mix_console=BasicMixConsole(44100.0),
    )
    cb.on_validation_end(3, None, audio, {})
    files = sorted(os.listdir(tmp_path / "aud"))
    assert files == [
        "epoch0003_ex0.wav", "epoch0003_ex1.wav", "epoch0003_params.json"
    ]
    import json as _json

    table = _json.load(open(tmp_path / "aud" / "epoch0003_params.json"))
    assert table["input_fader"]["gain_db"][0][0] == 0.0  # 0.5 -> mid-range 0 dB

    # fixed-song render callback with a fake model
    song = tmp_path / "song"
    song.mkdir()
    t = 16384 * 3
    for i in range(2):
        write_audio(
            str(song / f"s{i}.wav"),
            rng.normal(size=(1, t)).astype(np.float32) * 0.1, 44100,
        )
    ref_path = str(tmp_path / "ref.wav")
    write_audio(ref_path, rng.normal(size=(2, t)).astype(np.float32) * 0.1, 44100)

    def model_apply(state):
        def apply(tr, r):
            n = tr.shape[1]
            return (jnp.full((1, n, 2), 0.5), jnp.zeros((1, 0)), jnp.zeros((1, 0)))
        return apply

    cb2 = LogReferenceMix(
        [str(song)], [ref_path], output_dir=str(tmp_path / "refmix"),
        length=16384, model_apply=model_apply,
        mix_console=BasicMixConsole(44100.0),
    )
    cb2.on_validation_end(1, None, {}, {})
    assert os.listdir(tmp_path / "refmix") == ["epoch0001_song.wav"]

    save_param_table(str(tmp_path / "params.json"),
                     {"input_fader": {"gain_db": np.zeros((1, 2))}})
    import json

    tab = json.load(open(tmp_path / "params.json"))
    assert tab["input_fader"]["gain_db"] == [[0.0, 0.0]]
