"""FXencoder: 1-D convolutional audio-effects embedding network.

Rebuild of /root/reference/mst/fx_encoder.py:19-207 (the contrastive FX
embedding encoder): a stack of residual or plain 1-D conv blocks configured
by a dict (channels/kernels/strides/dilation/norm/activation), stereo input,
global average pooling. Used by the Method-2/AFLoss experiments and the
parameter-estimation system.

Deviations: reflection padding and BatchNorm1d semantics are reproduced;
the reference's unused "deconv"/"alias_free" conv modes are not ported
(they are dead paths there).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["FXencoder", "default_fx_encoder_config"]


def default_fx_encoder_config() -> Dict[str, Any]:
    """A reasonable FXencoder config matching the upstream work's shape."""
    return {
        "channels": [16, 32, 64, 128, 256, 256, 512, 512, 1024, 1024, 2048, 2048],
        "kernels": [25, 25, 15, 15, 10, 10, 10, 10, 5, 5, 5, 5],
        "strides": [4, 4, 4, 4, 2, 2, 2, 2, 2, 2, 2, 2],
        "dilation": [1] * 12,
        "bias": True,
        "norm": "batch",
        "conv_block": "res",
        "activation": "relu",
    }


class _Conv1dLayer(nn.Module):
    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    padding: str = "SAME"  # "SAME" -> reflection pad, "VALID" -> none
    use_bias: bool = True
    norm: str = "batch"
    activation: str = "relu"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: (bs, length, channels) NLC."""
        if self.padding == "SAME":
            pad = (self.kernel_size - 1) * self.dilation
            lpad, rpad = pad // 2, pad - pad // 2
            x = jnp.pad(x, ((0, 0), (lpad, rpad), (0, 0)), mode="reflect")
        x = nn.Conv(
            self.out_channels,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            kernel_dilation=(self.dilation,),
            padding="VALID",
            use_bias=self.use_bias,
        )(x)
        if self.norm == "batch":
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        if self.activation == "relu":
            x = nn.relu(x)
        elif self.activation == "lrelu":
            x = nn.leaky_relu(x)
        return x


class _ResConvBlock(nn.Module):
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int
    dilation: int
    norm: str
    activation: str

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c1 = _Conv1dLayer(
            self.in_channels, self.kernel_size, 1, self.dilation,
            norm=self.norm, activation=self.activation, name="conv1",
        )(x, train=train)
        x = c1 + x
        return _Conv1dLayer(
            self.out_channels, self.kernel_size, self.stride, self.dilation,
            norm=self.norm, activation=self.activation, name="conv2",
        )(x, train=train)


class FXencoder(nn.Module):
    config: Dict[str, Any]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(bs, 2, seq_len) stereo audio -> (bs, channels[-1]) embedding."""
        cfg = self.config
        channels: Sequence[int] = list(cfg["channels"])
        if channels and channels[0] != 2:
            channels = [2] + channels  # reference inserts the stereo input dim
        x = jnp.transpose(x, (0, 2, 1))  # NCL -> NLC
        for i, k in enumerate(cfg["kernels"]):
            if cfg.get("conv_block", "res") == "res":
                x = _ResConvBlock(
                    channels[i], channels[i + 1], k,
                    cfg["strides"][i], cfg["dilation"][i],
                    cfg.get("norm", "batch"), cfg.get("activation", "relu"),
                    name=f"block{i}",
                )(x, train=train)
            else:
                x = _Conv1dLayer(
                    channels[i + 1], k, cfg["strides"][i], cfg["dilation"][i],
                    padding="VALID",
                    norm=cfg.get("norm", "batch"),
                    activation=cfg.get("activation", "relu"),
                    name=f"block{i}",
                )(x, train=train)
        return jnp.mean(x, axis=1)  # global average pool over time


class ParameterProjector(nn.Module):
    """Linear heads: embedding -> sigmoid console params (modules.py:557-591)."""

    embed_dim: int
    num_tracks: int
    num_track_control_params: int
    num_fx_bus_control_params: int
    num_master_bus_control_params: int

    @nn.compact
    def __call__(self, z: jnp.ndarray):
        bs = z.shape[0]
        track = nn.sigmoid(
            nn.Dense(
                self.num_tracks * self.num_track_control_params,
                name="track_projector",
            )(z)
        ).reshape(bs, self.num_tracks, -1)
        fx = nn.sigmoid(
            nn.Dense(self.num_fx_bus_control_params, name="fx_bus_projector")(z)
        )
        master = nn.sigmoid(
            nn.Dense(self.num_master_bus_control_params, name="master_bus_projector")(z)
        )
        return track, fx, master
