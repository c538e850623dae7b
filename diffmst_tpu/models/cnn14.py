"""Cnn14 (PANN) spectrogram backbone in Flax.

Rebuild of /root/reference/mst/panns.py:27-209 (itself adapted from the
audioset_tagging_cnn PANN family, MIT): six double-conv blocks
(64->128->256->512->1024->2048 channels, 3x3 convs, BatchNorm, ReLU, average
pooling with the exact pool schedule panns.py:188-198), mean over frequency,
max+mean over time, linear head.

TPU notes: convs run in NHWC (XLA:TPU's native conv layout); the channel
counts are MXU-friendly multiples of 128 from block 2 on. BatchNorm supports
cross-replica stats via ``axis_name`` (the reference trains with
sync_batchnorm, configs/config.yaml:41).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["ConvBlock", "Cnn14"]


class ConvBlock(nn.Module):
    out_channels: int
    use_batchnorm: bool = True
    pool_type: str = "avg"
    bn_axis_name: Optional[str] = None
    # computation dtype; params stay float32 (mixed precision on the MXU)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, pool_size: Tuple[int, int], train: bool = False):
        """x: (bs, H, W, C) NHWC."""
        for i in range(2):
            x = nn.Conv(
                self.out_channels,
                kernel_size=(3, 3),
                padding="SAME",
                use_bias=False,
                kernel_init=nn.initializers.xavier_uniform(),
                dtype=self.dtype,
                name=f"conv{i + 1}",
            )(x)
            if self.use_batchnorm:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    axis_name=self.bn_axis_name if train else None,
                    dtype=self.dtype,
                    name=f"bn{i + 1}",
                )(x)
            x = nn.relu(x)
        if self.pool_type == "avg":
            x = nn.avg_pool(x, pool_size, strides=pool_size)
        elif self.pool_type == "max":
            x = nn.max_pool(x, pool_size, strides=pool_size)
        elif self.pool_type == "avg+max":
            x = nn.avg_pool(x, pool_size, strides=pool_size) + nn.max_pool(
                x, pool_size, strides=pool_size
            )
        else:
            raise ValueError(f"bad pool_type {self.pool_type}")
        return x


class Cnn14(nn.Module):
    num_classes: int
    n_inputs: int = 1
    use_batchnorm: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    # Width of the first block; the reference is 64 (doubling per block to
    # 2048). Smaller values give architecture-faithful but cheap models for
    # tests and multi-chip dry runs.
    base_width: int = 64
    # Rematerialize the first N conv blocks on the backward pass (selective
    # remat). The early blocks dominate activation HBM (block 1 at the train
    # recipe shape is [32, 1025, 257, 64], 2x lane-padded), while per-block
    # conv FLOPs are roughly flat across the schedule — so remat_blocks=1..2
    # buys most of whole-encoder remat's memory headroom at ~1/6-1/3 of its
    # recompute cost. 0 = no remat here (the model-level remat_encoders flag
    # wraps the whole encoder instead).
    remat_blocks: int = 0
    # Opt-in fast-encoder mode (default 0 = exact reference widths): floor
    # for every block's channel count. The reference's 64-channel block 1
    # (panns.py:188-198) lane-pads every TPU register half-empty — the v5e
    # vector lane dimension is 128 — so the shipped train step runs the
    # encoder convs at ~23% of bf16 peak (PERF.md). ``min_width=128`` widens
    # block 1 to 128 channels (2x its FLOPs at ~2x MXU efficiency; later
    # blocks are already >=128). Changes the parameter shapes of block 1, so
    # torch-checkpoint weight ports require the default.
    min_width: int = 0

    # pool schedule per panns.py:188-198
    _POOLS = ((2, 2), (4, 4), (4, 2), (4, 2), (4, 2), (2, 2))

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: (bs, chs, bins, frames) spectrogram (torch NCHW layout in,
        converted to NHWC internally). Returns (bs, num_classes)."""
        x = jnp.transpose(x, (0, 2, 3, 1))  # -> (bs, bins, frames, chs)
        # The pool schedule divides (bins, frames) by (1024, 128); smaller
        # inputs silently produce zero-size dims and NaN outputs downstream.
        if x.shape[1] < 1024 or x.shape[2] < 128:
            raise ValueError(
                f"Cnn14 needs a spectrogram of at least (1024 bins, 128 frames) "
                f"for its pool schedule; got {x.shape[1:3]}. Use n_fft >= 2048 "
                f"and seq_len >= 128 * hop_length."
            )
        if self.dtype is not None:
            x = x.astype(self.dtype)
        for i, pool in enumerate(self._POOLS):
            # pool_size and train are static (they shape the traced graph)
            block_cls = (
                nn.remat(ConvBlock, static_argnums=(2, 3))
                if i < self.remat_blocks
                else ConvBlock
            )
            x = block_cls(
                max(self.base_width << i, self.min_width),
                use_batchnorm=self.use_batchnorm,
                bn_axis_name=self.bn_axis_name,
                dtype=self.dtype,
                name=f"conv_block{i + 1}",
            )(x, pool, train)
        # mean across frequency bins (torch dim=2 == our axis 1)
        x = jnp.mean(x, axis=1)  # (bs, frames', ch)
        # max + mean over time
        x = jnp.max(x, axis=1) + jnp.mean(x, axis=1)  # (bs, ch)
        x = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype,
            name="fc",
        )(x)
        return x.astype(jnp.float32)
