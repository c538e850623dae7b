"""class_path-style config registry (LightningCLI YAML surface compatibility).

The reference instantiates every module from overlaid YAMLs of
``{class_path: pkg.Cls, init_args: {...}}`` nodes (README.md:84-110,
main.py:14-22). This module reproduces that surface: ``instantiate``
recursively builds objects from such dicts, and reference class paths
(``mst.modules.AdvancedMixConsole`` etc.) are aliased onto this framework's
equivalents so the reference's shipped YAML configs load unchanged.

``load_config`` overlays multiple ``-c`` files exactly like jsonargparse:
later files deep-merge over earlier ones.
"""

from __future__ import annotations

import importlib
from typing import Any, Dict, List, Sequence

import yaml

__all__ = ["CLASS_ALIASES", "instantiate", "load_config", "deep_merge"]

# reference class_path -> this framework's implementation
CLASS_ALIASES: Dict[str, str] = {
    "mst.modules.AdvancedMixConsole": "diffmst_tpu.console.AdvancedMixConsole",
    "mst.modules.BasicMixConsole": "diffmst_tpu.console.BasicMixConsole",
    "mst.modules.MixStyleTransferModel": "diffmst_tpu.models.MixStyleTransferModel",
    "mst.modules.SpectrogramEncoder": "diffmst_tpu.models.SpectrogramEncoder",
    "mst.modules.TransformerController": "diffmst_tpu.models.TransformerController",
    "mst.modules.WaveformTransformerEncoder": (
        "diffmst_tpu.models.WaveformTransformerEncoder"
    ),
    "mst.modules.ParameterProjector": "diffmst_tpu.models.ParameterProjector",
    "mst.modules.Remixer": "diffmst_tpu.train.Remixer",
    "mst.fx_encoder.FXencoder": "diffmst_tpu.models.FXencoder",
    "mst.panns.Cnn14": "diffmst_tpu.models.Cnn14",
    "mst.system.System": "diffmst_tpu.train.System",
    "mst.param_system.ParameterEstimationSystem": (
        "diffmst_tpu.train.ParameterEstimationSystem"
    ),
    "mst.loss.AudioFeatureLoss": "diffmst_tpu.losses.AudioFeatureLoss",
    "auraloss.freq.MultiResolutionSTFTLoss": (
        "diffmst_tpu.losses.MultiResolutionSTFTLoss"
    ),
    "mst.dataloader.MultitrackDataModule": "diffmst_tpu.data.MultitrackDataModule",
    "mst.dataloader.MixDataModule": "diffmst_tpu.data.MixDataModule",
    "mst.mixing.naive_random_mix": "diffmst_tpu.mixing.naive_random_mix",
    "mst.mixing.knowledge_engineering_mix": (
        "diffmst_tpu.mixing.knowledge_engineering_mix"
    ),
}


def resolve(class_path: str) -> Any:
    """Import the object named by a dotted path (after aliasing).

    Walks attribute chains past the module boundary, so classmethod
    factories work as class paths too (e.g.
    ``diffmst_tpu.models.MixStyleTransferModel.build``).
    """
    class_path = CLASS_ALIASES.get(class_path, class_path)
    parts = class_path.split(".")
    last_err: Exception | None = None
    for i in range(len(parts) - 1, 0, -1):
        mod_name = ".".join(parts[:i])
        try:
            obj = importlib.import_module(mod_name)
        except ModuleNotFoundError as e:
            # only "this prefix isn't a module" continues the walk; a
            # missing dependency INSIDE an existing module is a real error
            # that must surface, not be retried at shorter prefixes
            if e.name and (mod_name == e.name or mod_name.startswith(e.name + ".")):
                last_err = e
                continue
            raise  # missing dependency raised from inside the module
        # any other ImportError (circular import, bad native lib) propagates
        try:
            for attr in parts[i:]:
                obj = getattr(obj, attr)
        except AttributeError as e:
            raise ImportError(f"cannot resolve {class_path!r}: {e}") from e
        return obj
    raise ImportError(f"cannot resolve {class_path!r}: {last_err}")


def instantiate(node: Any, **overrides: Any) -> Any:
    """Recursively build a config node.

    ``{class_path: X, init_args: {...}}`` becomes ``X(**init_args)`` with
    nested nodes instantiated first. A bare class_path string that resolves
    to a callable is returned as the callable (the reference passes
    ``mix_fn: mst.mixing.naive_random_mix`` that way).
    """
    if isinstance(node, dict) and "class_path" in node:
        cls = resolve(node["class_path"])
        kwargs = {
            k: instantiate(v) for k, v in (node.get("init_args") or {}).items()
        }
        kwargs.update(overrides)
        return cls(**kwargs)
    if isinstance(node, str) and node in CLASS_ALIASES:
        return resolve(node)
    if isinstance(node, dict):
        return {k: instantiate(v) for k, v in node.items()}
    if isinstance(node, list):
        return [instantiate(v) for v in node]
    return node


def deep_merge(base: Dict, over: Dict) -> Dict:
    out = dict(base)
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def load_config(paths: Sequence[str]) -> Dict[str, Any]:
    """Overlay YAML config files left-to-right (repeated ``-c`` semantics)."""
    merged: Dict[str, Any] = {}
    for p in paths:
        with open(p) as f:
            cfg = yaml.safe_load(f) or {}
        merged = deep_merge(merged, cfg)
    return merged
