"""Audio-logging callbacks.

Rebuilds of the reference's observability callbacks:
  * ``LogAudioCallback`` (/root/reference/mst/callbacks/audio.py:10-134) —
    after validation, write ref/pred/sum comparison audio (concatenated with
    1 s gaps like the wandb clip) and a per-track parameter table. Artifacts
    go to disk (wandb optional via callbacks.metrics.WandbLogger).
  * ``LogReferenceMix`` (/root/reference/mst/callbacks/mix.py:16-234) — fixed
    real songs + reference mixes rendered at every validation epoch for
    qualitative tracking.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np

from diffmst_tpu.data.audio_io import read_audio, write_audio

__all__ = ["LogAudioCallback", "LogReferenceMix"]


class LogAudioCallback:
    def __init__(
        self,
        output_dir: str = "logs/audio",
        sample_rate: int = 44100,
        num_examples: int = 2,
        gap_seconds: float = 1.0,
        mix_console=None,
    ) -> None:
        self.output_dir = output_dir
        self.sample_rate = sample_rate
        self.num_examples = num_examples
        self.gap_seconds = gap_seconds
        self.mix_console = mix_console

    def on_validation_end(self, epoch: int, state, audio: dict, metrics: dict):
        os.makedirs(self.output_dir, exist_ok=True)
        gap = np.zeros((2, int(self.gap_seconds * self.sample_rate)), np.float32)
        n = min(self.num_examples, np.asarray(audio["pred_mix_b"]).shape[0])
        for i in range(n):
            clips = []
            for k in ("ref_mix_a", "ref_mix_b", "pred_mix_b"):
                if k in audio:
                    a = np.asarray(audio[k])[i]
                    peak = np.abs(a).max()
                    clips.extend([a / max(peak, 1e-8), gap])
            cat = np.concatenate(clips, axis=-1)
            write_audio(
                os.path.join(self.output_dir, f"epoch{epoch:04d}_ex{i}.wav"),
                cat,
                self.sample_rate,
            )
        # per-track parameter table (the reference's wandb.Table,
        # callbacks/audio.py:96-134) — denormalized via the console when one
        # is attached, else the raw normalized vectors
        if "pred_params" in audio:
            tp, fp, mp = audio["pred_params"]
            if self.mix_console is not None:
                td, _, _ = self.mix_console.param_dicts(
                    np.asarray(tp), np.asarray(fp), np.asarray(mp)
                )
                save_param_table(
                    os.path.join(self.output_dir, f"epoch{epoch:04d}_params.json"),
                    td,
                )
            else:
                save_param_table(
                    os.path.join(self.output_dir, f"epoch{epoch:04d}_params.json"),
                    {"normalized": {
                        "track": np.asarray(tp),
                        "fx_bus": np.asarray(fp),
                        "master_bus": np.asarray(mp),
                    }},
                )

    def on_log(self, tag: str, metrics: dict) -> None:
        pass


class LogReferenceMix:
    """Render fixed songs against fixed reference mixes each val epoch."""

    def __init__(
        self,
        root_dirs: Sequence[str],
        ref_mixes: Sequence[str],
        output_dir: str = "logs/reference_mix",
        sample_rate: int = 44100,
        length: int = 131072,
        model_apply=None,
        mix_console=None,
    ) -> None:
        self.root_dirs = list(root_dirs)
        self.ref_mixes = list(ref_mixes)
        self.output_dir = output_dir
        self.sample_rate = sample_rate
        self.length = length
        self.model_apply = model_apply
        self.mix_console = mix_console

    def on_validation_end(self, epoch: int, state, audio: dict, metrics: dict):
        if self.model_apply is None or self.mix_console is None:
            return
        from diffmst_tpu.utils.inference import run_diffmst

        os.makedirs(self.output_dir, exist_ok=True)
        for song_dir, ref_path in zip(self.root_dirs, self.ref_mixes):
            try:
                stems = []
                for f in sorted(os.listdir(song_dir)):
                    if f.endswith(".wav"):
                        a, _ = read_audio(os.path.join(song_dir, f), 0, self.length * 2)
                        stems.append(a.mean(axis=0))
                if not stems:
                    continue
                tracks = np.stack(stems)[None]
                ref, _ = read_audio(ref_path, 0, self.length * 2)
                mix, *_ = run_diffmst(
                    tracks, ref[None], self.model_apply(state), self.mix_console,
                    analysis_len=self.length,
                )
                name = os.path.basename(song_dir.rstrip("/"))
                write_audio(
                    os.path.join(self.output_dir, f"epoch{epoch:04d}_{name}.wav"),
                    mix[0] / max(np.abs(mix).max(), 1e-8),
                    self.sample_rate,
                )
            except (OSError, ValueError):
                continue

    def on_log(self, tag: str, metrics: dict) -> None:
        pass


def save_param_table(path: str, track_param_dict: dict) -> None:
    """Write the per-track denormalized parameter table (the reference logs a
    wandb.Table, audio.py:96-134); here JSON."""
    table = {
        eff: {k: np.asarray(v).tolist() for k, v in params.items()}
        for eff, params in track_param_dict.items()
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump(table, f, indent=1)
