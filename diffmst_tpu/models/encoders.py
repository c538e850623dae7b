"""Waveform/spectrogram encoders producing per-signal embeddings.

* ``SpectrogramEncoder`` — STFT (n_fft 2048, hop 512, Hann) -> |X|^0.3
  compression -> Cnn14 -> embed_dim vector. Rebuild of
  /root/reference/mst/modules.py:740-806 (shipped config: embed_dim 512,
  configs/models/naive.yaml:30-45).
* ``WaveformTransformerEncoder`` + ``PositionalEncoding`` — the alternative
  block-transformer encoder (modules.py:634-673; defined twice there —
  copy-paste residue — once here).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from diffmst_tpu.models.cnn14 import Cnn14
from diffmst_tpu.models.transformer import TransformerEncoder
from diffmst_tpu.ops.stft import stft as _stft_fn

__all__ = ["SpectrogramEncoder", "WaveformTransformerEncoder", "PositionalEncoding"]


class SpectrogramEncoder(nn.Module):
    embed_dim: int = 128
    n_inputs: int = 1
    n_fft: int = 2048
    hop_length: int = 512
    input_batchnorm: bool = False
    encoder_batchnorm: bool = True
    bn_axis_name: Optional[str] = None
    spec_power: float = 0.3
    spec_eps: float = 1e-8
    cnn_base_width: int = 64
    cnn_min_width: int = 0  # opt-in fast-encoder block-width floor (Cnn14)
    crop_nyquist: bool = False  # opt-in: drop the Nyquist bin (1025 -> 1024)
    dtype: Optional[jnp.dtype] = None  # computation dtype for the CNN
    remat_blocks: int = 0  # selective remat of the first N Cnn14 blocks

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(bs, chs, seq_len) waveform -> (bs, embed_dim) embedding."""
        bs, chs, seq_len = x.shape
        flat = x.reshape(bs * chs, seq_len)
        X = _stft_fn(flat, self.n_fft, self.hop_length)  # (bs*chs, bins, frames)
        if self.crop_nyquist:
            # opt-in deviation: drop the single Nyquist bin so the bin axis
            # is 1024 (a power of two) instead of 1025 — removes the 2x
            # sublane pad XLA applies to Cnn14 block 1's activations at the
            # flagship shape. Cnn14's pooled shapes are identical either way
            # (1025 and 1024 floor-divide to the same schedule), so ported
            # torch weights still load; outputs deviate only by the missing
            # Nyquist energy. Default OFF for exact reference parity.
            X = X[..., : (self.n_fft // 2), :]
        mag = jnp.power(jnp.abs(X) + self.spec_eps, self.spec_power)
        mag = mag.reshape(bs, chs, mag.shape[-2], mag.shape[-1])
        if self.input_batchnorm:
            # torch BatchNorm2d over channel dim; normalized over (bs, H, W)
            mag = nn.BatchNorm(
                use_running_average=not train,
                axis=1,
                momentum=0.9,
                epsilon=1e-5,
                name="bn",
            )(mag)
        return Cnn14(
            num_classes=self.embed_dim,
            n_inputs=self.n_inputs,
            use_batchnorm=self.encoder_batchnorm,
            bn_axis_name=self.bn_axis_name,
            base_width=self.cnn_base_width,
            min_width=self.cnn_min_width,
            dtype=self.dtype,
            remat_blocks=self.remat_blocks,
            name="model",
        )(mag, train=train)


class PositionalEncoding(nn.Module):
    d_model: int
    max_len: int = 1024
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(bs, seq, d_model) -> same, with sinusoidal positions added."""
        pos = jnp.arange(self.max_len)[:, None]
        div = jnp.exp(jnp.arange(0, self.d_model, 2) * (-math.log(10000.0) / self.d_model))
        pe = jnp.zeros((self.max_len, self.d_model))
        pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
        pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
        x = x + pe[None, : x.shape[1], :]
        if train and self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class WaveformTransformerEncoder(nn.Module):
    """Chunk the waveform into non-overlapping blocks, prepend a CLS token,
    run a transformer encoder, return the CLS embedding (modules.py:659-673)."""

    n_inputs: int = 1
    block_size: int = 1024
    embed_dim: int = 512
    nhead: int = 8
    num_layers: int = 12

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        bs, chs, seq_len = x.shape
        n_blocks = seq_len // self.block_size
        x = x[..., : n_blocks * self.block_size]
        x = x.reshape(bs, chs * n_blocks, self.block_size)
        cls = self.param(
            "cls", nn.initializers.normal(1.0), (1, 1, self.block_size)
        )
        x = jnp.concatenate([jnp.tile(cls, (bs, 1, 1)), x], axis=1)
        z = TransformerEncoder(
            d_model=self.block_size,
            nhead=self.nhead,
            num_layers=self.num_layers,
            name="model",
        )(x, train=train)
        return z[:, 0, :]
