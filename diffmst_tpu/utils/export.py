"""AOT export of the inference graph for serving (jax.export).

A production serving host should not need the Python model definitions, the
Flax module tree, or the console code — only the compiled computation. This
module serializes the two fixed-shape functions that full-song style
transfer needs (the same split run_diffmst uses, utils/inference.py; the
reference exposes inference only through Python scripts,
/root/reference/scripts/run.py and mst/utils.py:32-173):

  * ``predict_params(tracks, ref) -> (track_params, fx_params, master_params)``
    — one model call on the analysis windows (reference utils.py:117-119).
  * ``render_window(wins, tp, fp, mp) -> mix`` — the batched console render
    used by the OLA / overlap-save renderers (fixed window batch of
    ``render_bs``, matching ``_render_batched``).

Both are serialized with ``jax.export`` (StableHLO) into a directory with a
JSON manifest; ``load_inference_export`` restores them without touching
model code, and ``run_exported`` reproduces run_diffmst's host pipeline
(LUFS gate/normalize + windowed render) on top of the restored functions.
"""

from __future__ import annotations

import json
import os
from typing import Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from jax import export as _jax_export

from diffmst_tpu.ops.loudness import integrated_loudness
from diffmst_tpu.utils.inference import overlap_add_render, overlap_save_render

__all__ = [
    "save_inference_export",
    "load_inference_export",
    "run_exported",
    "ExportedInference",
]

_MANIFEST = "manifest.json"
_PREDICT = "predict_params.stablehlo"
_RENDER = "render_window.stablehlo"


class ExportedInference(NamedTuple):
    """Deserialized inference graph + its static geometry."""

    predict_params: Callable
    render_window: Callable
    manifest: dict


def save_inference_export(
    path: str,
    model,
    variables: dict,
    mix_console,
    *,
    num_tracks: int,
    analysis_len: int = 262144,
    render_bs: int = 8,
    use_fx_bus: bool = False,
    sample_rate: float = 44100.0,
    platforms: Optional[Sequence[str]] = None,
    key: Optional[jax.Array] = None,
) -> dict:
    """Serialize the inference graph to ``path`` (a directory).

    Args:
      model / variables: the Flax model and its restored variables.
      mix_console: console instance (its settings are baked into the graph).
      num_tracks: static track count the export is specialized to (pad the
        input with silent tracks to reuse one export across songs).
      analysis_len: model analysis window (reference: 262,144).
      render_bs: windows per render call — must match the renderers'
        fixed batching (inference._RENDER_BS).
      platforms: lowering platforms (e.g. ["tpu", "cpu"]); None = current.

    Returns the manifest dict.
    """
    if key is None:
        key = jax.random.PRNGKey(0)

    def predict(tracks, ref, mask):
        # mask: (1, num_tracks) True = padded slot. Key-padding masking in
        # the controller excludes masked tokens everywhere they act as
        # attention keys, which is numerically identical to removing them
        # from the sequence (per-token LayerNorm/MLP, shared weights) — so
        # a padded export matches run_diffmst's remove-gated-tracks model
        # call exactly (tests/test_export.py::test_export_gated_roundtrip).
        return model.apply(variables, tracks, ref, mask)

    def render(wins, tp, fp, mp):
        n = wins.shape[0]
        out = mix_console(
            wins,
            jnp.tile(tp, (n, 1, 1)),
            jnp.tile(fp, (n, 1)),
            jnp.tile(mp, (n, 1)),
            use_fx_bus=use_fx_bus,
            key=key,
        )
        return out.mix

    t_spec = jax.ShapeDtypeStruct((1, num_tracks, analysis_len), jnp.float32)
    r_spec = jax.ShapeDtypeStruct((1, 2, analysis_len), jnp.float32)
    m_spec = jax.ShapeDtypeStruct((1, num_tracks), jnp.bool_)
    w_spec = jax.ShapeDtypeStruct(
        (render_bs, num_tracks, analysis_len), jnp.float32
    )
    tp_spec = jax.ShapeDtypeStruct(
        (1, num_tracks, mix_console.num_track_control_params), jnp.float32
    )
    fp_spec = jax.ShapeDtypeStruct(
        (1, mix_console.num_fx_bus_control_params), jnp.float32
    )
    mp_spec = jax.ShapeDtypeStruct(
        (1, mix_console.num_master_bus_control_params), jnp.float32
    )

    kwargs = {"platforms": tuple(platforms)} if platforms else {}
    exp_predict = _jax_export.export(jax.jit(predict), **kwargs)(
        t_spec, r_spec, m_spec
    )
    exp_render = _jax_export.export(jax.jit(render), **kwargs)(
        w_spec, tp_spec, fp_spec, mp_spec
    )

    manifest = {
        "format": "diffmst_tpu.inference_export.v2",
        "mask_input": True,  # predict_params takes (tracks, ref, pad_mask)
        "num_tracks": num_tracks,
        "analysis_len": analysis_len,
        "render_bs": render_bs,
        "use_fx_bus": use_fx_bus,
        "sample_rate": sample_rate,
        "platforms": list(exp_predict.platforms),
        "param_layout": [
            mix_console.num_track_control_params,
            mix_console.num_fx_bus_control_params,
            mix_console.num_master_bus_control_params,
        ],
    }
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _PREDICT), "wb") as f:
        f.write(exp_predict.serialize())
    with open(os.path.join(path, _RENDER), "wb") as f:
        f.write(exp_render.serialize())
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def load_inference_export(path: str) -> ExportedInference:
    """Restore an export directory into callables (no model code needed)."""
    with open(os.path.join(path, _MANIFEST)) as f:
        manifest = json.load(f)
    if manifest.get("format") not in (
        "diffmst_tpu.inference_export.v1",  # pre-mask exports still load
        "diffmst_tpu.inference_export.v2",
    ):
        raise ValueError(f"not an inference export: {path}")
    with open(os.path.join(path, _PREDICT), "rb") as f:
        exp_predict = _jax_export.deserialize(f.read())
    with open(os.path.join(path, _RENDER), "rb") as f:
        exp_render = _jax_export.deserialize(f.read())
    predict_params = jax.jit(exp_predict.call)
    if manifest.get("mask_input"):
        # v2 graphs take (tracks, ref, pad_mask); keep the mask optional at
        # the API surface — omitting it means "no padded slots", the common
        # serving case where the caller filled every track.
        raw_predict, n_tracks = predict_params, manifest["num_tracks"]

        def predict_params(tracks, ref, mask=None):
            if mask is None:
                mask = jnp.zeros((tracks.shape[0], n_tracks), jnp.bool_)
            return raw_predict(tracks, ref, mask)

    return ExportedInference(
        predict_params=predict_params,
        render_window=jax.jit(exp_render.call),
        manifest=manifest,
    )


def run_exported(
    exported: ExportedInference,
    tracks: np.ndarray,
    ref: np.ndarray,
    render_mode: str = "ola",
) -> np.ndarray:
    """run_diffmst's host pipeline on a restored export.

    Mirrors utils/inference.py::run_diffmst: per-track LUFS gate (< -80
    skipped) + normalize to -48, one predict call on the analysis windows,
    windowed full-length render. The exported graph has a STATIC
    ``num_tracks``: kept tracks are compacted to the FRONT (matching
    run_diffmst's track ordering after gating) and the remaining rows are
    silence.

    v2 exports take a padding mask: the trailing silent slots are MASKED in
    the controller's attention, which is numerically identical to
    run_diffmst's remove-gated-tracks model call (key-padding masking ==
    sequence removal for per-token LayerNorm/MLP transformers), so gated
    songs render identically through both paths
    (test_export_gated_roundtrip_matches_run_diffmst). Legacy v1 exports
    (no mask input) keep the old divergence: the controller sees the silent
    slots unmasked, and surviving tracks' parameters can differ when any
    track is gated — re-export, or specialize the export to the exact
    track count.

    Args:
      tracks: (1, n, total_len) raw mono stems, n <= manifest num_tracks.
      ref: (1, 2, ref_len) stereo reference mix.

    Returns:
      (1, 2, total_len) rendered mix (host array).
    """
    m = exported.manifest
    num_tracks = m["num_tracks"]
    analysis_len = m["analysis_len"]
    sr = m["sample_rate"]
    if tracks.shape[1] > num_tracks:
        raise ValueError(
            f"{tracks.shape[1]} tracks > export's static {num_tracks}"
        )
    total = tracks.shape[-1]

    def crop_or_pad(x, n):
        if x.shape[-1] >= n:
            return x[..., :n]
        return np.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])])

    analysis_tracks = crop_or_pad(tracks, analysis_len)
    analysis_ref = crop_or_pad(ref, analysis_len).astype(np.float32)

    norm = np.zeros((1, num_tracks, total), np.float32)
    norm_analysis = np.zeros((1, num_tracks, analysis_len), np.float32)
    kept = 0
    for i in range(tracks.shape[1]):
        lufs = integrated_loudness(np.asarray(analysis_tracks[0, i]), sr)
        if not np.isfinite(lufs) or lufs < -80.0:
            continue
        g = np.float32(10.0 ** ((-48.0 - lufs) / 20.0))
        # compact kept tracks to the front (run_diffmst's post-gate order)
        norm[0, kept] = tracks[0, i] * g
        norm_analysis[0, kept] = analysis_tracks[0, i] * g
        kept += 1
    if kept == 0:
        raise ValueError("all tracks gated out (< -80 LUFS)")

    if m.get("mask_input"):
        pad_mask = np.zeros((1, num_tracks), bool)
        pad_mask[0, kept:] = True  # silent filler slots: masked in attention
        tp, fp, mp = exported.predict_params(
            jnp.asarray(norm_analysis),
            jnp.asarray(analysis_ref),
            jnp.asarray(pad_mask),
        )
    else:  # legacy v1 export: no mask input (documented divergence above)
        tp, fp, mp = exported.predict_params(
            jnp.asarray(norm_analysis), jnp.asarray(analysis_ref)
        )

    def render(wins):
        return exported.render_window(wins, tp, fp, mp)

    # The exported render graph has a STATIC window-batch shape: group
    # windows by the manifest's render_bs, not the process-wide default
    # (serving with a mismatched DIFFMST_RENDER_BS would shape-error).
    render_bs = m.get("render_bs", 8)
    if render_mode == "streaming":
        # context + block must equal the export's static window length, so
        # streaming uses a half-window context (more warm-up than the
        # default quarter — same compute factor as OLA, still seam-free).
        return overlap_save_render(
            render, norm, block_len=analysis_len // 2,
            context_len=analysis_len - analysis_len // 2,
            render_bs=render_bs,
        )
    return overlap_add_render(render, norm, analysis_len, render_bs=render_bs)
