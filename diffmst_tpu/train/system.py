"""Training system: the Method-1/Method-2 train step as a pure jitted function.

Rebuild of the reference ``System`` LightningModule
(/root/reference/mst/system.py). The reference's ``common_step`` contains a
duplicated ref-mix-generation block and a dead param-loss accumulator (see
SURVEY.md §7 "quirks" 1-2); this implementation is the *effective* behavior,
implemented once:

  generate ref mix (random console params, no input/output fader)
  -> peak-normalize -> A/B halving (model sees ref_mix_a = first half and
  tracks_b = second half; loss compares the render of tracks_b against
  ref_mix_b = second half)  [system.py:221-263]
  -> model forward [system.py:267-271] -> console render [system.py:274-292]
  -> mix loss (scalar or named dict) [system.py:330-352].

Method 2 (``generate_mix=False``, configs/models/unpaired+feat.yaml:4): the
batch's real reference mix feeds both the model and the loss.

Curriculum staging (active_*_epoch, system.py:123-133) becomes a set of
*static* effect flags: each stage compiles its own XLA program (<= 5 stages).

The param-loss path (use_param_loss) is implemented *working* (the reference
wires it but then zeroes it, system.py:314-330); default off for parity.

Parallelism: the step is written global-view. Jit it with dp-sharded batches
and replicated params (see parallel/mesh.py) and XLA inserts the gradient
all-reduce over ICI; batch-stat reductions are global (sync-BN semantics).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from diffmst_tpu.mixing import naive_random_mix
from diffmst_tpu.utils.audio import batch_stereo_peak_normalize

__all__ = ["SystemConfig", "EffectFlags", "TrainState", "System", "Batch"]


def _resolve_repo_path(path: str) -> str:
    """Resolve the reference's relative default paths (``data/...``,
    system.py:27-28) against the repo root when they don't exist from cwd."""
    import os

    if os.path.isabs(path) or os.path.exists(path):
        return path
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, path)


def _load_repo_json(path: str):
    import json

    with open(_resolve_repo_path(path)) as f:
        return json.load(f)


def _load_repo_yaml(path: str):
    import yaml

    with open(_resolve_repo_path(path)) as f:
        return yaml.safe_load(f)


class Batch(NamedTuple):
    """One training batch (mirrors the dataset item, dataloader.py:419)."""

    tracks: jnp.ndarray  # (bs, max_tracks, seq_len) mono stems
    instrument_id: jnp.ndarray  # (bs, max_tracks) int32
    stereo_info: jnp.ndarray  # (bs, max_tracks) int32
    track_padding: jnp.ndarray  # (bs, max_tracks) bool, True = padded
    ref_mix: jnp.ndarray  # (bs, 2, seq_len) real reference (Method 2)


class EffectFlags(NamedTuple):
    """Static console toggles for one curriculum stage."""

    use_track_eq: bool = True
    use_track_compressor: bool = True
    use_fx_bus: bool = False
    use_master_bus: bool = True


@dataclasses.dataclass(frozen=True)
class SystemConfig:
    generate_mix: bool = True
    use_mix_loss: bool = True
    use_param_loss: bool = False
    active_eq_epoch: int = 0
    active_compressor_epoch: int = 0
    active_fx_bus_epoch: int = 1000  # fx bus disabled in all shipped configs
    active_master_bus_epoch: int = 0
    lr: float = 1e-5
    max_epochs: int = 800
    steps_per_epoch: int = 5000  # 20k examples / batch 4
    schedule: str = "step"  # "step" (MultiStepLR 0.85/0.95, gamma 0.1) | "cosine" | "none"
    grad_clip: float = 10.0
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    # Lightning's accumulate_grad_batches (configs/config.yaml:46 — the
    # reference declares the knob but leaves it at 1): grads average over N
    # micro-batches before one optimizer update (optax.MultiSteps).
    accumulate_grad_batches: int = 1
    # Failure containment (SURVEY §5.3 — the reference just raises on NaN,
    # system.py:251-253): when > 0, non-finite updates are dropped and
    # parameters held, up to this many consecutive bad steps
    # (optax.apply_if_finite); the step metric ``notfinite_count`` reports
    # the running count. 0 preserves reference behavior (poisoned params).
    skip_nonfinite_updates: int = 0
    # dtype of Adam's first moment (optax ``mu_dtype``). "bfloat16" halves
    # the mu state (~0.6 GB on the flagship), buying HBM headroom on one
    # chip; nu and the params stay float32 so the update math is unchanged
    # apart from the mu rounding. None = float32 (reference numerics).
    adam_mu_dtype: Optional[str] = None
    # Run the optimizer over one ravelled parameter vector (optax.flatten).
    # Numerically identical to per-leaf state (global-norm clip and Adam are
    # elementwise / whole-tree reductions). Measured SLOWER on TPU v5e at
    # the flagship recipe (3.99 vs 4.19 steps/s, logs/train_step_variants
    # .json "noremat_mubf16_flat"): the per-step ravel/unravel copies cost
    # more than the per-leaf fusion overhead they remove — keep False there.
    # Changes the opt_state pytree layout — checkpoints are not
    # interchangeable with flatten_optimizer=False runs.
    flatten_optimizer: bool = False


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


class System:
    """Wires model + console + mix_fn + loss into jitted train/eval steps."""

    def __init__(
        self,
        model,
        mix_console,
        loss,
        config: Optional[SystemConfig] = None,
        mix_fn: Callable = naive_random_mix,
        mesh=None,
        **kwargs,
    ):
        """Extra keyword arguments use the reference ctor's flat names
        (generate_mix, active_eq_epoch, lr, max_epochs, schedule, ...;
        system.py:17-36) and override fields of ``config`` — so the shipped
        YAML configs instantiate this class directly. Unknown keys are
        ignored like the reference's **kwargs.

        ``mesh``: optional 2-D (dp, mp) device mesh. With ``mp > 1`` the
        track axis is model-parallel: the track/mix encoders run under
        shard_map on local track shards (build the model with
        ``bn_axis_name=("dp", "mp")`` so BatchNorm statistics stay global),
        while the controller and losses stay global-view. The console
        must be constructed with the same mesh (its per-track chain shards
        the same way)."""
        base = dataclasses.asdict(config) if config else {}
        names = {f.name for f in dataclasses.fields(SystemConfig)}
        base.update({k: v for k, v in kwargs.items() if k in names})
        self.model = model
        self.mix_console = mix_console
        self.loss = loss
        self.config = SystemConfig(**base)
        self.mix_fn = mix_fn
        self.mesh = mesh
        self._train_step_cache: Dict[tuple, Callable] = {}
        self.optimizer = self._make_optimizer()
        # KE mix support (reference system.py:72-80): a host-side mix_fn
        # (string-metadata + NumPy RNG — knowledge_engineering_mix) cannot
        # be traced into the jitted step, so the System loads its metadata
        # here and samples the reference-mix parameters on the host each
        # step (_host_sample_ke); only the console render of those params
        # runs on device.
        self.instrument_number_lookup = None
        self.knowledge_engineering_dict = None
        if getattr(mix_fn, "host_side", False):
            self.instrument_number_lookup = _load_repo_json(
                kwargs.get("instrument_id_json", "data/instrument_name2id.json")
            )
            self.knowledge_engineering_dict = _load_repo_yaml(
                kwargs.get(
                    "knowledge_engineering_yaml", "data/knowledge_engineering.yaml"
                )
            )

    @property
    def _mp_sharded(self) -> bool:
        return self.mesh is not None and self.mesh.shape.get("mp", 1) > 1

    # ------------------------------------------------------------ optimizer
    def _make_optimizer(self) -> optax.GradientTransformation:
        cfg = self.config
        total_steps = cfg.max_epochs * cfg.steps_per_epoch
        if cfg.schedule == "step":
            lr = optax.piecewise_constant_schedule(
                cfg.lr,
                {
                    int(total_steps * 0.85): 0.1,
                    int(total_steps * 0.95): 0.1,
                },
            )
        elif cfg.schedule == "cosine":
            lr = optax.cosine_decay_schedule(cfg.lr, total_steps)
        else:
            lr = cfg.lr
        tx = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            optax.adam(
                lr,
                b1=cfg.adam_b1,
                b2=cfg.adam_b2,
                mu_dtype=jnp.dtype(cfg.adam_mu_dtype) if cfg.adam_mu_dtype else None,
            ),
        )
        if cfg.flatten_optimizer:
            tx = optax.flatten(tx)
        if cfg.accumulate_grad_batches > 1:
            tx = optax.MultiSteps(tx, cfg.accumulate_grad_batches)
        if cfg.skip_nonfinite_updates > 0:
            tx = optax.apply_if_finite(tx, cfg.skip_nonfinite_updates)
        return tx

    # ----------------------------------------------------------- lifecycle
    def init(self, key: jax.Array, example_batch: Batch) -> TrainState:
        """Initialize parameters/optimizer from an example batch (on host or
        a single device; shard/replicate afterwards)."""
        # Mirror the lengths the step actually feeds the model: with
        # generate_mix the model sees the second half of the tracks and the
        # first half of the generated (full-length) ref mix; in Method 2 it
        # sees full-length tracks and the batch's real ref mix.
        n = min(2, example_batch.tracks.shape[1])
        if self.config.generate_mix:
            middle = example_batch.tracks.shape[-1] // 2
            tracks = example_batch.tracks[:1, :n, :middle]
            # ref mix is always stereo, even for a 1-track example
            first = example_batch.tracks[:1, :1, :middle]
            ref = jnp.concatenate([first, first], axis=1)
        else:
            tracks = example_batch.tracks[:1, :n]
            ref = example_batch.ref_mix[:1]
        mask = example_batch.track_padding[:1, :n]
        # jit the init: eager flax init dispatches thousands of single
        # ops (one device round trip each — minutes through a remote
        # tunnel); jitted it is one compile + one execution
        variables = jax.jit(self.model.init)(key, tracks, ref, mask)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.optimizer.init(params)
        return TrainState(params, batch_stats, opt_state, jnp.zeros((), jnp.int32))

    def effect_flags(self, epoch: int) -> EffectFlags:
        cfg = self.config
        return EffectFlags(
            use_track_eq=epoch >= cfg.active_eq_epoch,
            use_track_compressor=epoch >= cfg.active_compressor_epoch,
            use_fx_bus=epoch >= cfg.active_fx_bus_epoch,
            use_master_bus=epoch >= cfg.active_master_bus_epoch,
        )

    # ------------------------------------------------- mp-sharded encoders
    def _apply_model_mp(
        self, variables, tracks_b, ref_mix_a, padding, train, mutable, batch_stats,
        key=None,
    ):
        """Track-parallel model application over the (dp, mp) mesh.

        The encoders (embarrassingly parallel over tracks / channels, and the
        only FFT consumers in the model) run inside shard_map with tracks
        sharded over ``mp``; the controller — which attends across all tracks
        — runs global-view on the gathered embeddings (XLA inserts the
        all-gather over ICI). BatchNorm must be built with
        ``bn_axis_name=("dp", "mp")`` so batch statistics psum globally;
        the resulting batch_stats are then identical on every device, which
        is what the replicated out_spec asserts.
        """
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from diffmst_tpu.parallel.mesh import assert_mesh_divisible

        assert_mesh_divisible(
            self.mesh, tracks_b.shape[0], tracks_b.shape[1], "mp-sharded encoders"
        )
        model = self.model
        if train and mutable:
            enc = getattr(model.track_encoder, "bn_axis_name", None)
            if enc is None:
                raise ValueError(
                    "mp-sharded training needs the model built with "
                    f"bn_axis_name={tuple(self.mesh.axis_names)!r} so BatchNorm "
                    "statistics reduce globally inside shard_map"
                )

        if key is None:
            key = jax.random.PRNGKey(0)

        def encode(v, t, r, k):
            # dropout rngs: same replicated key on every shard, distinct
            # streams per encoder — each shard draws its mask for its local
            # track slice (an active-dropout model regularizes validly; the
            # mask layout differs from the single-device one, so exact-parity
            # tests use dropout-free models)
            rngs = {"dropout": jax.random.fold_in(k, 0)} if train else None
            te_out = model.apply(
                v, t, train=train, mutable=mutable, method="encode_tracks",
                rngs=rngs,
            )
            rngs = {"dropout": jax.random.fold_in(k, 1)} if train else None
            me_out = model.apply(
                v, r, train=train, mutable=mutable, method="encode_mix",
                rngs=rngs,
            )
            if mutable:
                te, upd_t = te_out
                me, upd_m = me_out
                upd = {
                    "batch_stats": {
                        **upd_t.get("batch_stats", {}),
                        **upd_m.get("batch_stats", {}),
                    }
                }
                return te, me, upd
            return te_out, me_out, {}

        te, me, upd = shard_map(
            encode,
            mesh=self.mesh,
            in_specs=(P(), P("dp", "mp", None), P("dp", None, None), P()),
            out_specs=(P("dp", "mp", None), P("dp", None, None), P()),
            check_vma=False,
        )(variables, tracks_b, ref_mix_a, key)

        # merge INTO the incoming stats: the encoders' updates overwrite
        # their own entries, anything owned by other submodules survives
        # (matching the non-mp path, whose full-forward updates carry the
        # whole tree)
        if mutable:
            new_batch_stats = {**batch_stats, **upd.get("batch_stats", {})}
        else:
            new_batch_stats = batch_stats

        ctrl_out = model.apply(
            variables, te, me, padding, train=train, method="control",
            mutable=False,
            rngs={"dropout": jax.random.fold_in(key, 2)} if train else None,
        )
        return ctrl_out, new_batch_stats

    # ---------------------------------------------------------- the step
    def _common(
        self,
        params,
        batch_stats,
        batch: Batch,
        key: jax.Array,
        flags: EffectFlags,
        train: bool,
        ke_params: Optional[Tuple] = None,
    ):
        cfg = self.config
        k_mix, k_model, k_render = jax.random.split(key, 3)
        tracks = batch.tracks
        middle = tracks.shape[-1] // 2

        ref_params = None
        if cfg.generate_mix:
            if getattr(self.mix_fn, "host_side", False):
                # Host-side mix_fn (KE): the parameters were sampled on the
                # host by the step wrapper (_host_sample_ke) — only the
                # console render runs here, on device (reference renders
                # eagerly per step, system.py:232-242).
                if ke_params is None:
                    raise ValueError(
                        "host-side mix_fn needs ke_params — dispatch the "
                        "step through System.make_train_step/make_eval_step"
                    )
                tp_ref, fx_ref, mp_ref = ke_params
                out = self.mix_console(
                    tracks,
                    tp_ref,
                    fx_ref,
                    mp_ref,
                    use_track_input_fader=False,  # system.py:235
                    use_track_eq=flags.use_track_eq,
                    use_track_compressor=flags.use_track_compressor,
                    use_fx_bus=flags.use_fx_bus,
                    use_master_bus=flags.use_master_bus,
                    use_output_fader=False,  # system.py:241
                    key=k_mix,
                )
                ref_mix_raw = jax.lax.stop_gradient(out.mix)
                ref_param_arrays = (tp_ref, fx_ref, mp_ref)
            else:
                ref = self.mix_fn(
                    tracks,
                    self.mix_console,
                    k_mix,
                    use_track_input_fader=False,  # system.py:235
                    use_track_eq=flags.use_track_eq,
                    use_track_compressor=flags.use_track_compressor,
                    use_fx_bus=flags.use_fx_bus,
                    use_master_bus=flags.use_master_bus,
                    use_output_fader=False,  # system.py:241
                )
                ref_mix_raw = ref.mix
                ref_param_arrays = (
                    ref.track_params, ref.fx_bus_params, ref.master_bus_params
                )
            ref_mix = batch_stereo_peak_normalize(ref_mix_raw)
            ref_mix_a = ref_mix[..., :middle]
            ref_mix_b = ref_mix[..., middle:]
            tracks_b = tracks[..., middle:]
            ref_params = ref_param_arrays
        else:
            ref_mix_a = batch.ref_mix
            ref_mix_b = batch.ref_mix
            tracks_b = tracks

        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        mutable = ["batch_stats"] if (train and batch_stats) else False
        if self._mp_sharded:
            (pred_track, pred_fx, pred_master), new_batch_stats = (
                self._apply_model_mp(
                    variables, tracks_b, ref_mix_a, batch.track_padding,
                    train, mutable, batch_stats, key=k_model,
                )
            )
        else:
            out = self.model.apply(
                variables,
                tracks_b,
                ref_mix_a,
                batch.track_padding,
                train=train,
                mutable=mutable,
                # dropout rng (flax ignores it for dropout-free models;
                # without it an active nn.Dropout — e.g.
                # WaveformTransformerEncoder's PositionalEncoding,
                # encoders.py:97 — raises at trace time)
                rngs={"dropout": k_model} if train else None,
            )
            if mutable:
                (pred_track, pred_fx, pred_master), updates = out
                new_batch_stats = updates.get("batch_stats", batch_stats)
            else:
                pred_track, pred_fx, pred_master = out
                new_batch_stats = batch_stats

        render = self.mix_console(
            tracks_b,
            pred_track,
            pred_fx,
            pred_master,
            use_track_input_fader=True,
            use_track_eq=flags.use_track_eq,
            use_track_compressor=flags.use_track_compressor,
            use_fx_bus=flags.use_fx_bus,
            use_master_bus=flags.use_master_bus,
            use_output_fader=True,
            key=k_render,
        )
        pred_mix_b = render.mix

        loss = jnp.zeros(())
        metrics: Dict[str, jnp.ndarray] = {}
        if cfg.use_mix_loss:
            mix_loss = self.loss(pred_mix_b, ref_mix_b)
            if isinstance(mix_loss, dict):
                for name, val in mix_loss.items():
                    v = jnp.mean(val)
                    loss = loss + v
                    metrics[name] = v
            else:
                loss = loss + mix_loss
        if cfg.use_param_loss and ref_params is not None:
            tp, fp, mp = ref_params
            p_loss = jnp.mean(jnp.square(pred_track - tp))
            if flags.use_fx_bus:
                p_loss = p_loss + jnp.mean(jnp.square(pred_fx - fp))
            if flags.use_master_bus:
                p_loss = p_loss + jnp.mean(jnp.square(pred_master - mp))
            loss = loss + p_loss
            metrics["param_loss"] = p_loss

        metrics["loss"] = loss
        metrics["ref_mix_nonfinite"] = jnp.sum(~jnp.isfinite(ref_mix_b))
        metrics["pred_mix_nonfinite"] = jnp.sum(~jnp.isfinite(pred_mix_b))
        aux = {
            "metrics": metrics,
            "batch_stats": new_batch_stats,
            "pred_mix_b": pred_mix_b,
            "ref_mix_a": ref_mix_a,
            "ref_mix_b": ref_mix_b,
            "pred_params": (pred_track, pred_fx, pred_master),
        }
        return loss, aux

    @property
    def _host_side_mix(self) -> bool:
        return self.config.generate_mix and getattr(self.mix_fn, "host_side", False)

    def _host_sample_ke(self, batch: Batch, key: jax.Array) -> Tuple:
        """Sample KE reference-mix parameters on the host for one step.

        Reads the batch's tiny metadata arrays back to host (instrument ids
        + stereo flags, (bs, tracks) ints), seeds a NumPy generator from the
        step's jax key (distinct keys -> distinct mixes; a fixed key — e.g.
        deterministic_val — repeats the draw exactly), and returns the three
        normalized parameter arrays for the device render. Mirrors the
        reference's per-step metadata forwarding (system.py:232-242)."""
        import numpy as np

        from diffmst_tpu.mixing.knowledge import (
            instrument_metadata,
            sample_ke_params,
        )

        iid = np.asarray(batch.instrument_id)
        if self.instrument_number_lookup:
            mdata = instrument_metadata(iid, self.instrument_number_lookup)
        else:
            mdata = [["unknown"] * iid.shape[1] for _ in range(iid.shape[0])]
        stereo = np.asarray(batch.stereo_info)
        seed = int(np.asarray(jax.random.key_data(key)).ravel()[-1]) & 0x7FFFFFFF
        rng = np.random.default_rng(seed)
        tp, fx, mp = sample_ke_params(
            self.knowledge_engineering_dict or {}, mdata, stereo, rng,
            self.mix_console,
        )
        return jnp.asarray(tp), jnp.asarray(fx), jnp.asarray(mp)

    def make_train_step(self, flags: EffectFlags, donate: bool = True) -> Callable:
        """Build (and cache) the jitted train step for one curriculum stage.

        The cache key includes ``donate``: the fused-dispatch trainer asks
        for a non-donating step to trace inside its lax.scan, and that must
        not shadow (or be shadowed by) the donating step the sequential
        loop dispatches directly.

        With a host-side mix_fn (KE) the returned callable is a thin host
        wrapper: it samples the KE parameters outside jit, then dispatches
        the jitted step with them — same (state, batch, key) signature.
        Such a step cannot be traced into a fused lax.scan dispatch
        (``donate=False`` is how the fused trainer asks), so that combo
        raises.
        """
        cache_key = (flags, donate)
        if cache_key in self._train_step_cache:
            return self._train_step_cache[cache_key]
        if self._host_side_mix and not donate:
            raise ValueError(
                "fused_steps > 1 cannot host a host-side mix_fn (KE): the "
                "per-step parameter sampling runs outside jit and a fused "
                "lax.scan dispatch has no per-step host boundary. Set "
                "fused_steps=1 for knowledge_engineering_mix runs."
            )

        def train_step(
            state: TrainState, batch: Batch, key: jax.Array, ke_params=None
        ):
            def loss_fn(params):
                return self._common(
                    params, state.batch_stats, batch, key, flags, train=True,
                    ke_params=ke_params,
                )

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            updates, new_opt = self.optimizer.update(
                grads, state.opt_state, state.params
            )
            new_params = optax.apply_updates(state.params, updates)
            metrics = aux["metrics"]
            metrics["grad_norm"] = optax.global_norm(grads)
            if self.config.skip_nonfinite_updates > 0:
                metrics["notfinite_count"] = new_opt.notfinite_count
            new_state = TrainState(
                new_params, aux["batch_stats"], new_opt, state.step + 1
            )
            return new_state, metrics

        fn = jax.jit(train_step, donate_argnums=(0,) if donate else ())
        if self._host_side_mix:
            inner = fn

            def fn(state, batch, key):
                return inner(state, batch, key, self._host_sample_ke(batch, key))

        self._train_step_cache[cache_key] = fn
        return fn

    def make_eval_step(self, flags: EffectFlags) -> Callable:
        """Build (and cache) the jitted eval step for one curriculum stage.

        Cached for the same reason as :meth:`make_train_step` — a fresh
        ``jax.jit`` closure per validation pass is a new entry in JAX's
        trace cache, so every per-epoch probe/val pass would pay a retrace
        (and, on a remote backend, a compile-cache round trip measured in
        minutes through the dev tunnel).
        """
        cache_key = ("eval", flags)
        if cache_key in self._train_step_cache:
            return self._train_step_cache[cache_key]

        def eval_step(
            state: TrainState, batch: Batch, key: jax.Array, ke_params=None
        ):
            _, aux = self._common(
                state.params, state.batch_stats, batch, key, flags, train=False,
                ke_params=ke_params,
            )
            return aux["metrics"], {
                "pred_mix_b": aux["pred_mix_b"],
                "ref_mix_a": aux["ref_mix_a"],
                "ref_mix_b": aux["ref_mix_b"],
                # normalized (0,1) predicted parameter vectors — the audio
                # callback logs the denormalized table (the reference logs a
                # wandb.Table per val batch, callbacks/audio.py:96-134)
                "pred_params": aux["pred_params"],
            }

        fn = jax.jit(eval_step)
        if self._host_side_mix:
            inner = fn

            def fn(state, batch, key):
                return inner(state, batch, key, self._host_sample_ke(batch, key))

        self._train_step_cache[cache_key] = fn
        return fn
