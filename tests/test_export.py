"""AOT inference export (jax.export serving path): save -> load -> run."""

import numpy as np
import jax
import jax.numpy as jnp

from diffmst_tpu.console import AdvancedMixConsole
from diffmst_tpu.models import (
    MixStyleTransferModel,
    SpectrogramEncoder,
    TransformerController,
)
from diffmst_tpu.utils.export import (
    load_inference_export,
    run_exported,
    save_inference_export,
)
from diffmst_tpu.utils.inference import run_diffmst

SR = 44100.0


def _tiny_model():
    enc = dict(embed_dim=32, n_fft=2048, hop_length=128, cnn_base_width=4)
    return MixStyleTransferModel(
        track_encoder=SpectrogramEncoder(**enc),
        mix_encoder=SpectrogramEncoder(**enc),
        controller=TransformerController(
            embed_dim=32,
            num_track_control_params=27,
            num_fx_bus_control_params=25,
            num_master_bus_control_params=26,
            num_layers=1,
            nhead=4,
        ),
    )


def test_export_roundtrip_matches_run_diffmst(tmp_path):
    """Exported graph, restored WITHOUT model code, reproduces run_diffmst."""
    num_tracks, analysis_len = 3, 16384
    total = analysis_len * 2 + 5000
    rng = np.random.default_rng(0)
    tracks = (rng.normal(size=(1, num_tracks, total)) * 0.1).astype(np.float32)
    ref = (rng.normal(size=(1, 2, analysis_len)) * 0.1).astype(np.float32)

    model = _tiny_model()
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(tracks[:, :, :analysis_len]),
        jnp.asarray(ref),
        jnp.zeros((1, num_tracks), bool),
    )
    console = AdvancedMixConsole(SR)

    out_dir = tmp_path / "export"
    manifest = save_inference_export(
        str(out_dir), model, variables, console,
        num_tracks=num_tracks, analysis_len=analysis_len,
    )
    assert manifest["num_tracks"] == num_tracks
    assert (out_dir / "manifest.json").exists()
    assert (out_dir / "predict_params.stablehlo").exists()

    exported = load_inference_export(str(out_dir))
    mix_exp = run_exported(exported, tracks, ref)

    apply = jax.jit(lambda t, r: model.apply(variables, t, r))
    mix_ref, *_ = run_diffmst(
        tracks, ref, apply, console, analysis_len=analysis_len
    )

    assert mix_exp.shape == mix_ref.shape == (1, 2, total)
    assert np.isfinite(mix_exp).all()
    peak = max(np.abs(mix_ref).max(), 1e-9)
    assert np.max(np.abs(mix_exp - mix_ref)) / peak < 1e-4


def test_export_gated_roundtrip_matches_run_diffmst(tmp_path):
    """With a gated track, the exported path (static slots + padding mask)
    reproduces run_diffmst (which removes gated tracks from the model call):
    key-padding masking == sequence removal (advisor round-1 finding)."""
    num_tracks, analysis_len = 3, 16384
    total = analysis_len * 2
    rng = np.random.default_rng(5)
    tracks = np.zeros((1, num_tracks, total), np.float32)
    tracks[0, 0] = rng.normal(size=total).astype(np.float32) * 0.1
    # track 1 silent -> gated; track 2 kept
    tracks[0, 2] = rng.normal(size=total).astype(np.float32) * 0.05
    ref = (rng.normal(size=(1, 2, analysis_len)) * 0.1).astype(np.float32)

    model = _tiny_model()
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(tracks[:, :, :analysis_len]),
        jnp.asarray(ref),
        jnp.zeros((1, num_tracks), bool),
    )
    console = AdvancedMixConsole(SR)
    out_dir = tmp_path / "export"
    save_inference_export(
        str(out_dir), model, variables, console,
        num_tracks=num_tracks, analysis_len=analysis_len,
    )
    exported = load_inference_export(str(out_dir))
    assert exported.manifest["mask_input"] is True
    mix_exp = run_exported(exported, tracks, ref)

    apply = jax.jit(
        lambda t, r: model.apply(variables, t, r)
    )
    mix_ref, *_ = run_diffmst(
        tracks, ref, apply, console, analysis_len=analysis_len
    )
    assert mix_exp.shape == mix_ref.shape == (1, 2, total)
    peak = max(np.abs(mix_ref).max(), 1e-9)
    assert np.max(np.abs(mix_exp - mix_ref)) / peak < 1e-4


def test_export_gates_silent_tracks(tmp_path):
    """run_exported applies the -80 LUFS gate; gated slots render silence."""
    num_tracks, analysis_len = 3, 16384
    total = analysis_len * 2
    rng = np.random.default_rng(1)
    tracks = np.zeros((1, num_tracks, total), np.float32)
    tracks[0, 0] = rng.normal(size=total).astype(np.float32) * 0.1
    # tracks 1..2 silent -> gated
    ref = (rng.normal(size=(1, 2, analysis_len)) * 0.1).astype(np.float32)

    model = _tiny_model()
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(tracks[:, :, :analysis_len]),
        jnp.asarray(ref),
        jnp.zeros((1, num_tracks), bool),
    )
    console = AdvancedMixConsole(SR)
    out_dir = tmp_path / "export"
    save_inference_export(
        str(out_dir), model, variables, console,
        num_tracks=num_tracks, analysis_len=analysis_len,
    )
    exported = load_inference_export(str(out_dir))
    mix = run_exported(exported, tracks, ref, render_mode="streaming")
    assert mix.shape == (1, 2, total)
    assert np.isfinite(mix).all()
    assert np.abs(mix).max() > 0.0


def test_export_gated_track_position_invariance(tmp_path):
    """Kept tracks are compacted to the FRONT of the static track slots
    (run_diffmst's post-gate ordering): a silent track contributes nothing
    and its position doesn't change the output (advisor round-1 finding —
    pre-fix, the silent row stayed in place and shifted which tokens the
    maskless exported controller saw)."""
    num_tracks, analysis_len = 3, 16384
    total = analysis_len * 2
    rng = np.random.default_rng(2)
    a = rng.normal(size=total).astype(np.float32) * 0.1
    b = rng.normal(size=total).astype(np.float32) * 0.05
    ref = (rng.normal(size=(1, 2, analysis_len)) * 0.1).astype(np.float32)

    def stack(order):
        x = np.zeros((1, num_tracks, total), np.float32)
        for slot, sig in order.items():
            x[0, slot] = sig
        return x

    model = _tiny_model()
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(stack({0: a, 1: b})[:, :, :analysis_len]),
        jnp.asarray(ref),
        jnp.zeros((1, num_tracks), bool),
    )
    console = AdvancedMixConsole(SR)
    out_dir = tmp_path / "export"
    save_inference_export(
        str(out_dir), model, variables, console,
        num_tracks=num_tracks, analysis_len=analysis_len,
    )
    exported = load_inference_export(str(out_dir))

    # silent track in the middle vs at the end: identical compacted input
    mix_mid = run_exported(exported, stack({0: a, 2: b}), ref)
    mix_end = run_exported(exported, stack({0: a, 1: b}), ref)
    np.testing.assert_allclose(mix_mid, mix_end, atol=1e-6)
