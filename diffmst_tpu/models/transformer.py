"""Post-norm transformer encoder matching torch.nn.TransformerEncoderLayer.

The controller (and the waveform encoder) in the reference wrap
``torch.nn.TransformerEncoderLayer(d_model, nhead, batch_first=True,
dropout=0.0)`` stacks (/root/reference/mst/modules.py:846-852). Torch
defaults reproduced for weight-port compatibility: post-layer-norm, ReLU
feed-forward, dim_feedforward=2048, biased projections.

Attention uses one fused QKV-style formulation over (bs, seq, d) with an
additive mask derived from key padding — short sequences (num_tracks + 4),
so attention cost is trivial; the matmuls land on the MXU.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["TransformerEncoderLayer", "TransformerEncoder"]

_NEG_INF = -1e9


class TransformerEncoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None  # computation dtype (LayerNorm stays f32)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        key_padding_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        """x: (bs, seq, d_model); key_padding_mask: (bs, seq) True = ignore."""
        bs, seq, d = x.shape
        h = self.nhead
        hd = d // h

        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(x)

        def split(t):
            return t.reshape(bs, seq, h, hd).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd).astype(x.dtype)
        if key_padding_mask is not None:
            bias = jnp.where(key_padding_mask[:, None, None, :], _NEG_INF, 0.0)
            scores = scores + bias.astype(scores.dtype)
        attn = nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(bs, seq, d)
        ctx = nn.Dense(d, dtype=self.dtype, name="out_proj")(ctx)
        ctx = ctx.astype(x.dtype)

        # post-norm residual blocks (torch default norm_first=False)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + ctx)
        ff = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
        ff = nn.relu(ff)
        ff = nn.Dense(d, dtype=self.dtype, name="linear2")(ff).astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, name="norm2")(x + ff)
        return x


class TransformerEncoder(nn.Module):
    d_model: int
    nhead: int
    num_layers: int
    dim_feedforward: int = 2048
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        key_padding_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.d_model,
                self.nhead,
                self.dim_feedforward,
                self.dropout,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(x, key_padding_mask=key_padding_mask, train=train)
        return x
