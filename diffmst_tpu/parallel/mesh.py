"""Device mesh + sharding rules.

The reference's only parallelism is Lightning DDP over NCCL
(configs/config.yaml:40-41) — gradient all-reduce over data-parallel
replicas. The TPU-native equivalent is a 2-D ``jax.sharding.Mesh``:

  * ``dp`` — data parallel over the batch axis. Gradients all-reduce over ICI
    implicitly when the jitted train step consumes dp-sharded batches with
    replicated parameters.
  * ``mp`` — intra-example parallelism over the track axis (the reference
    folds tracks into the batch at modules.py:223; that axis is
    embarrassingly parallel through the per-track chain and the track
    encoder, so it shards cleanly even at batch size 1 — the 16-track recipe
    trains with batch 1). Implemented with explicit locality: the console's
    per-track chain (console/console.py::_track_chain) and the model's
    encoders (train/system.py::_apply_model_mp) run under shard_map on
    local track shards — their FFTs never cross devices — while the
    controller and losses stay global-view (XLA gathers embeddings over
    ICI). Verified by tests/test_train.py::
    test_mp_sharded_step_matches_single_device (dp=4 x mp=2 == unsharded)
    and the driver dryrun.

TP/PP/SP/EP are deliberately absent: the model is ~200M params (fits per
chip), sequences are handled by windowing (SURVEY.md §5.7), and there are no
MoE layers. The mesh is the extension point if that changes.

BatchNorm under dp: the jitted step sees the *global* batch, so batch-stat
reductions are global automatically — equivalent to the reference's
sync_batchnorm without explicit cross-replica code.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "stacked_batch_sharding",
    "replicated",
    "shard_batch",
    "assert_mesh_divisible",
    "P",
]


def assert_mesh_divisible(mesh: Mesh, batch: int, tracks: int, where: str) -> None:
    """Clear error when (batch, tracks) can't shard over the (dp, mp) mesh.

    shard_map with in_specs P("dp", "mp", ...) rejects non-divisible axes
    with an opaque trace-time error; this names the fix instead. Tracks are
    padded to ``max_tracks`` upstream (data/dataset.py), so the remedy is to
    pick ``max_tracks`` a multiple of mp (pad with silent masked tracks —
    they render to silence and are masked in the controller), and a global
    batch a multiple of dp.
    """
    dp = mesh.shape.get("dp", 1)
    mp = mesh.shape.get("mp", 1)
    if batch % dp != 0:
        raise ValueError(
            f"{where}: global batch {batch} not divisible by dp={dp}; "
            "use a batch size that is a multiple of the dp mesh axis"
        )
    if tracks % mp != 0:
        raise ValueError(
            f"{where}: track axis {tracks} not divisible by mp={mp}; "
            "set max_tracks to a multiple of the mp mesh axis (padded "
            "tracks are masked and render to silence, so rounding up is "
            "behavior-neutral)"
        )


def make_mesh(
    dp: Optional[int] = None,
    mp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (dp, mp) mesh over the available devices.

    With defaults, all devices go to data parallelism. ICI-adjacent device
    order (as returned by jax.devices()) keeps dp collectives on-ring.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // mp
    if dp * mp != n:
        raise ValueError(f"dp*mp = {dp}*{mp} != device count {n}")
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, ("dp", "mp"))


def batch_sharding(mesh: Mesh, ndim: int, batch_axes: int = 1) -> NamedSharding:
    """Shard the leading batch axis over dp, replicate everything else."""
    spec = ("dp",) + (None,) * (ndim - batch_axes)
    return NamedSharding(mesh, P(*spec))


def stacked_batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Sharding for K stacked batches (fused multi-step dispatch).

    Leading axis = the lax.scan axis (replicated — each inner step consumes
    one whole slice), second axis = the batch axis over dp.
    """
    spec = (None, "dp") + (None,) * (ndim - 2)
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of batch arrays with the batch axis over dp."""
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), batch
    )
