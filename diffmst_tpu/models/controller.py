"""TransformerController: predicts console parameters from embeddings.

Rebuild of /root/reference/mst/modules.py:809-914: learned type embeddings
added to track/mix tokens, learned fx-bus and master-bus query tokens
appended, a transformer encoder over the (num_tracks + 2 + 1 + 1)-token
sequence, sigmoid projection heads for the three parameter groups. The
padding mask is extended by 4 always-attended tokens (modules.py:890-897).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from diffmst_tpu.models.transformer import TransformerEncoder

__all__ = ["TransformerController"]


class TransformerController(nn.Module):
    embed_dim: int
    num_track_control_params: int
    num_fx_bus_control_params: int
    num_master_bus_control_params: int
    num_layers: int = 6
    nhead: int = 8
    # accepted for config parity with the reference ctor (unused there too)
    use_fx_bus: bool = False
    use_master_bus: bool = False
    dtype: Optional[jnp.dtype] = None  # computation dtype

    @nn.compact
    def __call__(
        self,
        track_embeds: jnp.ndarray,
        mix_embeds: jnp.ndarray,
        track_padding_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """
        Args:
          track_embeds: (bs, num_tracks, embed_dim).
          mix_embeds: (bs, 2, embed_dim) reference-mix channel embeddings.
          track_padding_mask: (bs, num_tracks) True = padded track.

        Returns:
          (track_params (bs, num_tracks, P_t), fx_bus_params (bs, P_f),
           master_bus_params (bs, P_m)) — all sigmoid-bounded to (0, 1).
        """
        bs, num_tracks, d = track_embeds.shape
        init = nn.initializers.normal(1.0)
        track_type = self.param("track_embedding", init, (1, 1, d))
        mix_type = self.param("mix_embedding", init, (1, 2, d))
        fx_token = self.param("fx_bus_embedding", init, (1, 1, d))
        master_token = self.param("master_bus_embedding", init, (1, 1, d))

        seq = jnp.concatenate(
            [
                track_embeds + track_type,
                mix_embeds + mix_type,
                jnp.tile(fx_token, (bs, 1, 1)),
                jnp.tile(master_token, (bs, 1, 1)),
            ],
            axis=1,
        )  # (bs, num_tracks + 4, d)

        if track_padding_mask is not None:
            pad = jnp.concatenate(
                [track_padding_mask, jnp.zeros((bs, 4), dtype=bool)], axis=1
            )
        else:
            pad = None

        z = TransformerEncoder(
            d_model=d,
            nhead=self.nhead,
            num_layers=self.num_layers,
            dtype=self.dtype,
            name="transformer_encoder",
        )(seq, key_padding_mask=pad, train=train)

        track_params = nn.sigmoid(
            nn.Dense(self.num_track_control_params, name="track_projection")(
                z[:, :num_tracks, :]
            )
        )
        fx_bus_params = nn.sigmoid(
            nn.Dense(self.num_fx_bus_control_params, name="fx_bus_projection")(
                z[:, -2, :]
            )
        )
        master_bus_params = nn.sigmoid(
            nn.Dense(
                self.num_master_bus_control_params, name="master_bus_projection"
            )(z[:, -1, :])
        )
        return track_params, fx_bus_params, master_bus_params
