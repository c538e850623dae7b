"""Self-supervised parameter-estimation pretraining (Remixer + regressor).

Rebuild of /root/reference/mst/param_system.py and the ``Remixer``
(modules.py:490-554): take real mixes, split them into stems with a source
separator, render a random remix through the console (no output fader,
-48 dB headroom, tanh soft-clip at 4.0), then train an encoder+projector to
regress the random console parameters from the (input, remix) pair — MSE per
parameter group scaled by parameter counts (param_system.py:89-107).

Source separation: the reference uses torchaudio's HDEMUCS_HIGH_MUSDB_PLUS
(modules.py:496) — its pretrained weights are not downloadable in this
environment. The separator is pluggable: any ``(bs, 2, T) -> (bs, 4, 2, T)``
callable. The default is ``models.separator.hpss_separator`` — real
(unsupervised) spectral-mask separation into drums/bass/other/vocals that
needs no weights; ``models.separator.UNetSeparator`` is the trainable /
weight-loadable alternative, and ``band_split_separator`` remains as the
trivial deterministic fallback.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

__all__ = [
    "band_split_separator",
    "Remixer",
    "ParameterEstimationSystem",
    "ParamTrainState",
]


def band_split_separator(x: jnp.ndarray) -> jnp.ndarray:
    """Split a stereo mix into 4 'stems' by frequency band (0-200, 200-1k,
    1k-5k, 5k+ Hz at 44.1 kHz). Exact reconstruction: stems sum to x."""
    bs, chs, t = x.shape
    X = jnp.fft.rfft(x, axis=-1)
    freqs = jnp.fft.rfftfreq(t, 1.0 / 44100.0)
    edges = [(0.0, 200.0), (200.0, 1000.0), (1000.0, 5000.0), (5000.0, 1e9)]
    stems = []
    for lo, hi in edges:
        mask = ((freqs >= lo) & (freqs < hi)).astype(X.real.dtype)
        stems.append(jnp.fft.irfft(X * mask[None, None, :], n=t, axis=-1))
    return jnp.stack(stems, axis=1)  # (bs, 4, 2, t)


def _default_separator(x: jnp.ndarray) -> jnp.ndarray:
    from diffmst_tpu.models.separator import hpss_separator

    return hpss_separator(x)


@dataclasses.dataclass(frozen=True)
class Remixer:
    """Separate -> randomize console params -> remix (modules.py:502-554)."""

    sample_rate: float = 44100.0
    separator: Callable = _default_separator
    headroom_db: float = -48.0
    clip_level: float = 4.0

    def __call__(
        self, x: jnp.ndarray, mix_console, key: jax.Array
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        bs, chs, seq_len = x.shape
        sources = jax.lax.stop_gradient(self.separator(x))  # (bs, 4, 2, t)
        tracks = sources.reshape(bs, 8, seq_len)  # 4 stereo stems -> 8 mono
        tracks = tracks * 10.0 ** (self.headroom_db / 20.0)

        k1, k2, k3, k4 = jax.random.split(key, 4)
        tp = jax.random.uniform(k1, (bs, 8, mix_console.num_track_control_params))
        fp = jax.random.uniform(k2, (bs, mix_console.num_fx_bus_control_params))
        mp = jax.random.uniform(k3, (bs, mix_console.num_master_bus_control_params))

        # reference renders with use_output_fader=False ONLY (modules.py:540-546)
        # — the fx bus stays ON (console forward default, modules.py:327), so
        # the 25 fx-bus params actually shape the remix and are learnable
        out = mix_console(tracks, tp, fp, mp, use_output_fader=False, key=k4)
        remix = jax.lax.stop_gradient(out.mix)
        remix = jnp.tanh(remix / self.clip_level) * self.clip_level
        return remix, tp, fp, mp


class ParamTrainState(NamedTuple):
    params: dict
    batch_stats: dict
    opt_state: tuple
    step: jnp.ndarray


class ParameterEstimationSystem:
    """Encoder-per-channel embedding differences -> ParameterProjector."""

    def __init__(
        self,
        encoder,
        projector,
        mix_console,
        remixer: Optional[Remixer] = None,
        lr: float = 3e-4,
        max_epochs: int = 500,
        steps_per_epoch: int = 1000,
        schedule: str = "step",
        **_unused,
    ) -> None:
        self.encoder = encoder
        self.projector = projector
        self.mix_console = mix_console
        self.remixer = remixer or Remixer(mix_console.sample_rate)
        total = max_epochs * steps_per_epoch
        if schedule == "step":
            lr_s = optax.piecewise_constant_schedule(
                lr, {int(total * 0.85): 0.1, int(total * 0.95): 0.1}
            )
        elif schedule == "cosine":
            lr_s = optax.cosine_decay_schedule(lr, total)
        else:
            lr_s = lr
        self.optimizer = optax.adam(lr_s)

    # ------------------------------------------------------------ forward
    def _forward(self, variables, input_mix, output_mix, train: bool):
        """Embed each channel of both mixes, difference, project
        (param_system.py:37-60).

        The four mono signals (input L/R, output L/R) are stacked along the
        batch axis and embedded in ONE encoder apply — numerically identical
        to the reference's four separate calls for conv/eval-BN, one device
        dispatch instead of four, and a single batch-stats update in train
        mode (train-mode BN then normalizes over the combined 4*bs batch; a
        documented, better-conditioned deviation from per-call stats).
        Returns ((tp, fp, mp), new_encoder_batch_stats).
        """
        enc_vars = variables["encoder"]
        proj_vars = variables["projector"]

        bs = input_mix.shape[0]
        sigs = jnp.concatenate(
            [
                input_mix[:, 0:1, :],
                input_mix[:, 1:2, :],
                output_mix[:, 0:1, :],
                output_mix[:, 1:2, :],
            ],
            axis=0,
        )  # (4*bs, 1, t)
        v = {"params": enc_vars["params"]}
        if enc_vars.get("batch_stats"):
            v["batch_stats"] = enc_vars["batch_stats"]
        mutable = ["batch_stats"] if (train and enc_vars.get("batch_stats")) else False
        out = self.encoder.apply(v, sigs, train=train, mutable=mutable)
        if mutable:
            z_all, upd = out
            new_stats = upd.get("batch_stats", enc_vars.get("batch_stats", {}))
        else:
            z_all = out
            new_stats = enc_vars.get("batch_stats", {})
        z_in_l, z_in_r, z_out_l, z_out_r = (
            z_all[:bs], z_all[bs : 2 * bs], z_all[2 * bs : 3 * bs], z_all[3 * bs :]
        )
        z = jnp.concatenate([z_out_l - z_in_l, z_out_r - z_in_r], axis=-1)
        return self.projector.apply({"params": proj_vars["params"]}, z), new_stats

    def init(self, key: jax.Array, example_mix: jnp.ndarray) -> ParamTrainState:
        k1, k2 = jax.random.split(key)
        enc_vars = self.encoder.init(k1, example_mix[:, 0:1, :])
        d = self.encoder.apply(enc_vars, example_mix[:, 0:1, :]).shape[-1]
        proj_vars = self.projector.init(k2, jnp.zeros((1, 2 * d)))
        params = {
            "encoder": {
                "params": enc_vars["params"],
                "batch_stats": enc_vars.get("batch_stats", {}),
            },
            "projector": {"params": proj_vars["params"]},
        }
        trainable = {
            "encoder": params["encoder"]["params"],
            "projector": params["projector"]["params"],
        }
        return ParamTrainState(
            params,
            params["encoder"]["batch_stats"],
            self.optimizer.init(trainable),
            jnp.zeros((), jnp.int32),
        )

    def _group_losses(self, preds, tp, fp, mp):
        """Per-group MSE scaled by parameter counts (param_system.py:100-105)."""
        tp_hat, fp_hat, mp_hat = preds
        tl = jnp.mean(jnp.square(tp_hat - tp)) * (tp.shape[-1] + tp.shape[-2])
        fl = jnp.mean(jnp.square(fp_hat - fp)) * fp.shape[-1]
        ml = jnp.mean(jnp.square(mp_hat - mp)) * mp.shape[-1]
        loss = tl + fl + ml
        return loss, {
            "loss": loss,
            "track_param_loss": tl,
            "fx_bus_param_loss": fl,
            "master_bus_param_loss": ml,
        }

    def make_train_step(self):
        def train_step(state: ParamTrainState, input_mix: jnp.ndarray, key):
            k_remix, k_fwd = jax.random.split(key)
            remix, tp, fp, mp = self.remixer(input_mix, self.mix_console, k_remix)

            def loss_fn(trainable):
                variables = {
                    "encoder": {
                        "params": trainable["encoder"],
                        "batch_stats": state.batch_stats,
                    },
                    "projector": {"params": trainable["projector"]},
                }
                # train-mode BN (batch statistics + running-stats update),
                # matching the reference's Lightning training semantics
                preds, new_stats = self._forward(
                    variables, input_mix, remix, train=True
                )
                loss, metrics = self._group_losses(preds, tp, fp, mp)
                return loss, (metrics, new_stats)

            trainable = {
                "encoder": state.params["encoder"]["params"],
                "projector": state.params["projector"]["params"],
            }
            (loss, (metrics, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(trainable)
            updates, new_opt = self.optimizer.update(grads, state.opt_state, trainable)
            new_trainable = optax.apply_updates(trainable, updates)
            new_params = {
                "encoder": {
                    "params": new_trainable["encoder"],
                    "batch_stats": new_stats,
                },
                "projector": {"params": new_trainable["projector"]},
            }
            return (
                ParamTrainState(new_params, new_stats, new_opt, state.step + 1),
                metrics,
            )

        return jax.jit(train_step)

    def make_eval_step(self):
        """Jitted fixed-target evaluation: score the current weights against a
        frozen (input_mix, remix, params) tuple with eval-mode BN. Low-variance
        convergence evidence — the targets don't resample per step."""

        def eval_step(state: ParamTrainState, input_mix, remix, tp, fp, mp):
            variables = {
                "encoder": {
                    "params": state.params["encoder"]["params"],
                    "batch_stats": state.batch_stats,
                },
                "projector": {"params": state.params["projector"]["params"]},
            }
            preds, _ = self._forward(variables, input_mix, remix, train=False)
            _, metrics = self._group_losses(preds, tp, fp, mp)
            return metrics

        return jax.jit(eval_step)
