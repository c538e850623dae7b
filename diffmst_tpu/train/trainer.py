"""Training loop: epochs, curriculum staging, metrics, checkpoints, prefetch.

The Lightning-Trainer role of the reference (configs/config.yaml:4-46),
TPU-native: a plain Python loop around the System's jitted steps.

  * curriculum: one compiled step per effect-flag stage (recompiles only at
    stage boundaries; <= 5 stages).
  * async dispatch: steps are dispatched without host sync; metrics are
    fetched every ``log_every_n_steps`` — the device pipeline stays full
    while the host collates the next batch (fixing the reference's
    synchronous once-per-epoch buffer-reload stall is the data side's job).
  * dp sharding: pass a mesh to shard batches over ``dp`` and replicate
    state (gradient all-reduce over ICI happens inside the jitted step).
  * checkpoints: orbax save per epoch + best-val tracking (Lightning
    enable_checkpointing equivalent); resume via ``fit(resume=path)``.
  * metrics: steps/sec and audio-realtime-factor meters (the BASELINE
    instruments) + optional jax.profiler trace of a few steps.
"""

from __future__ import annotations

import collections
import itertools
import os
import queue
import threading
import time
from typing import Callable, Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffmst_tpu.train.system import Batch, System, TrainState
from diffmst_tpu.utils.checkpoint import load_meta, restore_state, save_state

__all__ = ["Trainer"]


def _to_batch(raw, device_put: Callable) -> Batch:
    tracks, stereo, instr, padding, mix, _names = raw
    return Batch(
        tracks=device_put(jnp.asarray(tracks)),
        instrument_id=device_put(jnp.asarray(instr)),
        stereo_info=device_put(jnp.asarray(stereo)),
        track_padding=device_put(jnp.asarray(padding)),
        ref_mix=device_put(jnp.asarray(mix)),
    )


def _prefetch(
    loader, device_put: Callable, depth: int = 2
) -> Iterator[Batch]:
    """Background-thread batch pipeline with double-buffered device_put.

    The producer thread walks the (host-side, possibly buffer-reloading)
    dataloader and pushes already-device_put batches into a bounded queue, so
    disk decode / LUFS gating / collate overlap with device compute — fixing
    the reference's synchronous once-per-epoch buffer-reload stall
    (/root/reference/mst/dataloader.py:386-390). ``depth=2`` keeps one batch
    on device while the next is being staged (double buffering).
    """
    q: queue.Queue = queue.Queue(maxsize=depth)
    _END = object()

    def producer():
        try:
            for raw in loader:
                q.put(_to_batch(raw, device_put))
            q.put(_END)
        except BaseException as exc:  # surface loader errors on the consumer
            q.put(exc)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


class Trainer:
    def __init__(
        self,
        system: System,
        datamodule,
        max_epochs: Optional[int] = None,
        ckpt_dir: str = "checkpoints",
        log_every_n_steps: int = 50,
        check_val_every_n_epoch: int = 1,
        callbacks: Optional[List] = None,
        mesh=None,
        seed: int = 42,
        profile_steps: Optional[range] = None,
        profile_dir: str = "profiles",
        ckpt_every_n_steps: Optional[int] = None,
        fused_steps: int = 1,
        deterministic_val: bool = False,
        enable_checkpointing: bool = True,
        num_sanity_val_steps: int = 0,
    ) -> None:
        self.system = system
        self.datamodule = datamodule
        self.max_epochs = max_epochs or system.config.max_epochs
        self.ckpt_dir = ckpt_dir
        self.log_every_n_steps = log_every_n_steps
        self.check_val_every_n_epoch = check_val_every_n_epoch
        self.callbacks = callbacks or []
        self.mesh = mesh
        self.seed = seed
        self.profile_steps = profile_steps
        self.profile_dir = profile_dir
        # Mid-epoch "last" saves every N steps: a reference-scale epoch is
        # ~5,000 steps (>20 min on one chip) — a crash must not lose it.
        self.ckpt_every_n_steps = ckpt_every_n_steps
        # fused_steps > 1: dispatch K train steps per device call
        # (lax.scan over K stacked batches inside one jit). The step
        # sequence — batch order, per-step PRNG splits, optimizer updates —
        # is identical to K sequential dispatches; only the host/device
        # round-trip count changes. This is the lever when dispatch latency
        # rivals step time (remote/tunneled TPU: the 16-track demo measured
        # ~95 ms of device time inside ~2 s of per-dispatch wall).
        # With a mesh, _group_batches re-lays the stacked group so the scan
        # axis is replicated and the batch axis stays sharded over dp.
        self.fused_steps = max(1, int(fused_steps))
        # deterministic_val: derive the per-batch validation PRNG key from
        # (seed, batch index) instead of the advancing training key, so every
        # validation pass draws the SAME reference-mix parameters. Method-1
        # val loss is otherwise a fresh random task per pass (the reference
        # inherits this through torch's advancing global RNG,
        # /root/reference/mst/system.py:221-263), which makes epoch-over-epoch
        # val curves — and therefore best-checkpoint selection — noise-bound.
        # Off by default for reference parity.
        self.deterministic_val = deterministic_val
        # Lightning's Trainer(enable_checkpointing=...) equivalent
        # (/root/reference/configs/config.yaml:4-46). False skips the
        # per-epoch "last"/"best" orbax saves: on a remote-tunneled device a
        # full-state fetch is minutes per epoch, which a throughput demo or
        # sweep must not pay.
        self.enable_checkpointing = enable_checkpointing
        # Lightning's num_sanity_val_steps (the reference pins it to 2,
        # /root/reference/configs/config.yaml:44): run N val batches BEFORE
        # the first training epoch so a broken val loop fails in seconds,
        # not after a 20-min epoch. Logged under the "sanity" tag; not fed
        # to best-checkpoint selection or validation-end callbacks
        # (Lightning likewise suppresses logging during the sanity check).
        # Library default 0 (no hidden eval compile in programmatic runs);
        # the CLI applies Lightning's default of 2 (main.py).
        self.num_sanity_val_steps = int(num_sanity_val_steps)
        self.history: List[Dict[str, float]] = []

        if mesh is not None:
            from diffmst_tpu.parallel import batch_sharding, replicated

            self._put_batch = lambda x: jax.device_put(
                x, batch_sharding(mesh, x.ndim)
            )
            self._put_state = lambda s: jax.device_put(s, replicated(mesh))
        else:
            self._put_batch = lambda x: x
            self._put_state = lambda s: s

    # --------------------------------------------------------------- fit
    def fit(self, resume: Optional[str] = None) -> TrainState:
        key = jax.random.PRNGKey(self.seed)
        dm = self.datamodule

        first = next(iter(dm.train_dataloader()))
        example = _to_batch(first, lambda x: x)
        state = self.system.init(key, example)
        if resume:
            state = restore_state(resume, state)
            start_epoch = self._resume_epoch(resume, state)
        else:
            start_epoch = 0
        state = self._put_state(state)

        if self.num_sanity_val_steps:
            # Dedicated key: the sanity check must not perturb the training
            # PRNG stream (same-seed runs stay bit-identical whether the
            # knob is 0 or 2, matching Lightning where sanity is a no-op on
            # training randomness). seed+1 is the deterministic-val base.
            k_sanity = jax.random.PRNGKey(self.seed + 2)
            self._run_validation(
                state, self.system.effect_flags(start_epoch), k_sanity,
                epoch=start_epoch, tag="sanity",
                limit_batches=self.num_sanity_val_steps,
            )

        best_val = float("inf")
        seconds_per_example = example.tracks.shape[-1] / 44100.0

        bs = example.tracks.shape[0]
        fused_k = self.fused_steps
        for epoch in range(start_epoch, self.max_epochs):
            flags = self.system.effect_flags(epoch)
            if fused_k > 1:
                fused_fn = self._make_fused_step(flags)
            else:
                step_fn = self.system.make_train_step(flags)
            t_epoch = time.time()
            n_steps = 0
            logged_blocks = saved_blocks = 0
            pending = None
            # Honest throughput: steps are dispatched asynchronously, so
            # per-step wall clocks measure only dispatch. Instead, sync at
            # every log point and average wall time over the whole window
            # (device compute + host overlap included).
            t_sync = time.time()
            steps_since_sync = 0

            batches = _prefetch(dm.train_dataloader(), self._put_batch)
            for i, batch in enumerate(self._group_batches(batches)):
                if self.profile_steps and i == self.profile_steps.start:
                    jax.profiler.start_trace(self.profile_dir)
                if fused_k > 1:
                    state, key, metrics = fused_fn(state, batch, key)
                else:
                    key, k_step = jax.random.split(key)
                    state, metrics = step_fn(state, batch, k_step)
                if self.profile_steps and i == self.profile_steps.stop:
                    jax.block_until_ready(metrics["loss"])
                    jax.profiler.stop_trace()
                n_steps += fused_k
                steps_since_sync += fused_k
                if n_steps // self.log_every_n_steps > logged_blocks:
                    logged_blocks = n_steps // self.log_every_n_steps
                    host = {k: float(v) for k, v in metrics.items()}  # syncs
                    now = time.time()
                    sps = steps_since_sync / max(now - t_sync, 1e-9)
                    t_sync, steps_since_sync = now, 0
                    host.update(
                        epoch=epoch,
                        steps_per_sec=sps,
                        realtime_factor=sps * bs * seconds_per_example,
                    )
                    self.history.append(host)
                    self._log("train", host)
                if (
                    self.enable_checkpointing
                    and self.ckpt_every_n_steps
                    and n_steps // self.ckpt_every_n_steps > saved_blocks
                ):
                    saved_blocks = n_steps // self.ckpt_every_n_steps
                    # mid-epoch save: resume restarts THIS epoch (the
                    # dataloader has no mid-stream state), optimizer and
                    # step counter carry over exactly
                    self._save_last(state, next_epoch=epoch)
                pending = metrics

            if pending is not None:
                jax.block_until_ready(pending["loss"])
            epoch_time = time.time() - t_epoch

            # ------------------------------------------------------- val
            val_metrics: Dict[str, float] = {}
            if (epoch + 1) % self.check_val_every_n_epoch == 0:
                key, k_val = jax.random.split(key)
                val_metrics = self._run_validation(state, flags, k_val, epoch)

            # ----------------------------------------------------- ckpt
            if self.enable_checkpointing:
                self._save_last(state, next_epoch=epoch + 1)
            if self.enable_checkpointing and val_metrics.get(
                "loss", float("inf")
            ) < best_val:
                best_val = val_metrics["loss"]
                save_state(
                    os.path.join(self.ckpt_dir, "best"), state,
                    meta=self._meta(next_epoch=epoch + 1, state=state),
                )

            self._log(
                "epoch",
                {
                    "epoch": epoch,
                    "steps": n_steps,
                    "epoch_seconds": epoch_time,
                    **{f"val/{k}": v for k, v in val_metrics.items()},
                },
            )
        return state

    def _group_batches(self, batches: Iterator[Batch]) -> Iterator[Batch]:
        """fused_steps==1: pass through. Otherwise stack groups of K batches
        along a new leading axis (the lax.scan axis of the fused step)."""
        if self.fused_steps == 1:
            yield from batches
            return
        group: List[Batch] = []
        for b in batches:
            group.append(b)
            if len(group) == self.fused_steps:
                stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *group)
                if self.mesh is not None:
                    # jnp.stack of dp-sharded arrays leaves the output
                    # layout to XLA's propagation; pin it so the scan axis
                    # is replicated and the batch axis stays on dp.
                    from diffmst_tpu.parallel import stacked_batch_sharding

                    stacked = jax.tree.map(
                        lambda x: jax.device_put(
                            x, stacked_batch_sharding(self.mesh, x.ndim)
                        ),
                        stacked,
                    )
                yield stacked
                group = []
        if group:
            raise ValueError(
                f"epoch length not divisible by fused_steps="
                f"{self.fused_steps}: {len(group)} batches left over — set "
                "steps_per_epoch to a multiple of fused_steps"
            )

    def _make_fused_step(self, flags):
        """One device dispatch = ``fused_steps`` sequential train steps.

        lax.scan over the stacked-batch axis; the PRNG key is carried and
        split per inner step exactly like the sequential loop, so the
        (batch, key, update) sequence is identical — parity is asserted by
        tests/test_train.py::test_fused_steps_matches_sequential. Returns
        (state, key, last step's metrics).
        """
        step_fn = self.system.make_train_step(flags, donate=False)

        def fused(state, batches, key):
            def body(carry, b):
                state, key = carry
                key, k_step = jax.random.split(key)
                state, metrics = step_fn(state, b, k_step)
                return (state, key), metrics

            (state, key), ms = jax.lax.scan(body, (state, key), batches)
            return state, key, jax.tree.map(lambda m: m[-1], ms)

        return jax.jit(fused, donate_argnums=(0,))

    def _meta(self, next_epoch: int, state: TrainState) -> Dict:
        return {
            "next_epoch": int(next_epoch),
            "step": int(jax.device_get(state.step)),
            "steps_per_epoch": int(self.system.config.steps_per_epoch),
        }

    def _save_last(self, state: TrainState, next_epoch: int) -> None:
        os.makedirs(self.ckpt_dir, exist_ok=True)
        save_state(
            os.path.join(self.ckpt_dir, "last"), state,
            meta=self._meta(next_epoch=next_epoch, state=state),
        )

    def _resume_epoch(self, resume: str, state: TrainState) -> int:
        """Epoch to resume at: the checkpoint's recorded progress, never a
        derivation from ``state.step`` (correct only when steps_per_epoch
        matches the original run). Derivation remains the fallback for
        checkpoints written before the meta sidecar existed."""
        meta = load_meta(resume)
        if "next_epoch" in meta:
            return int(meta["next_epoch"])
        return int(state.step) // max(1, self.system.config.steps_per_epoch)

    def _run_validation(
        self, state: TrainState, flags, key, epoch: int,
        dataloader=None, tag: str = "val",
        limit_batches: Optional[int] = None,
    ) -> Dict[str, float]:
        """One pass over an eval dataloader (val by default); logs +
        callbacks. ``limit_batches`` truncates the pass (Lightning's sanity
        check runs only ``num_sanity_val_steps`` batches)."""
        eval_fn = self.system.make_eval_step(flags)
        agg: Dict[str, list] = collections.defaultdict(list)
        audio = None
        if dataloader is None:
            dataloader = self.datamodule.val_dataloader()
        if limit_batches is not None:
            dataloader = itertools.islice(dataloader, limit_batches)
        if self.deterministic_val:
            val_base = jax.random.PRNGKey(self.seed + 1)
        for i, batch in enumerate(_prefetch(dataloader, self._put_batch)):
            if self.deterministic_val:
                k_step = jax.random.fold_in(val_base, i)
            else:
                key, k_step = jax.random.split(key)
            metrics, audio = eval_fn(state, batch, k_step)
            for k, v in metrics.items():
                agg[k].append(float(v))
        val_metrics = {k: float(np.mean(v)) for k, v in agg.items()}
        self._log(tag, {**val_metrics, "epoch": epoch})
        if tag != "sanity":  # Lightning suppresses user hooks during sanity
            # (but they DO fire for val and test passes alike)
            for cb in self.callbacks:
                if hasattr(cb, "on_validation_end") and audio is not None:
                    cb.on_validation_end(epoch, state, audio, val_metrics)
        return val_metrics

    def _eval_pass(
        self, resume: Optional[str], loader_fn, tag: str
    ) -> Dict[str, float]:
        """Restore (or init) state, run one pass over ``loader_fn()``.

        ``loader_fn`` is a zero-arg dataloader *factory*: the loaders are
        one-shot generators, and the init example and the eval pass each
        need a fresh one (otherwise the first batch would be skipped).
        """
        key = jax.random.PRNGKey(self.seed)
        first = next(iter(loader_fn()))
        example = _to_batch(first, lambda x: x)
        state = self.system.init(key, example)
        epoch = 0
        if resume:
            state = restore_state(resume, state)
            epoch = self._resume_epoch(resume, state)
        state = self._put_state(state)
        flags = self.system.effect_flags(epoch)
        key, k_val = jax.random.split(key)
        return self._run_validation(
            state, flags, k_val, epoch, dataloader=loader_fn(), tag=tag
        )

    def validate(self, resume: Optional[str] = None) -> Dict[str, float]:
        """A single validation pass (the reference CLI's ``validate``
        subcommand, /root/reference/main.py:14-22): restore (or init) state,
        run the val dataloader once, return aggregated metrics."""
        return self._eval_pass(resume, self.datamodule.val_dataloader, "val")

    def test(self, resume: Optional[str] = None) -> Dict[str, float]:
        """A single pass over the test split (LightningCLI's ``test``
        subcommand; reference DataModule builds a test dataset at
        /root/reference/mst/dataloader.py:423-516)."""
        return self._eval_pass(resume, self.datamodule.test_dataloader, "test")

    def _log(self, tag: str, metrics: Dict[str, float]) -> None:
        parts = " ".join(
            f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
            for k, v in metrics.items()
        )
        print(f"[{tag}] {parts}", flush=True)
        for cb in self.callbacks:
            if hasattr(cb, "on_log"):
                cb.on_log(tag, metrics)
