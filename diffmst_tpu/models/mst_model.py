"""MixStyleTransferModel: top-level parameter-prediction network.

Rebuild of /root/reference/mst/modules.py:17-68: encode each mono track and
each reference-mix channel with (shared-architecture, separately-weighted)
encoders, feed embeddings to the controller.

The ``sum_and_diff`` mid/side path exists for parity but the reference's is
shape-broken (modules.py:45-51 drops the channel dim); here it is implemented
correctly (mid = L+R, side = L-R, each encoded as a 1-channel signal) and
documented as a fixed deviation.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from diffmst_tpu.models.controller import TransformerController
from diffmst_tpu.models.encoders import SpectrogramEncoder

__all__ = ["MixStyleTransferModel"]


class MixStyleTransferModel(nn.Module):
    track_encoder: nn.Module
    mix_encoder: nn.Module
    controller: nn.Module
    sum_and_diff: bool = False

    def encode_tracks(
        self, tracks: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        """(bs, num_tracks, seq_len) -> (bs, num_tracks, embed_dim).

        Embarrassingly parallel over tracks — under an ``mp`` mesh the System
        runs this stage inside shard_map on the local track shard
        (train/system.py), keeping the STFT shard-local.
        """
        bs, num_tracks, seq_len = tracks.shape
        e = self.track_encoder(
            tracks.reshape(bs * num_tracks, 1, seq_len), train
        )
        return e.reshape(bs, num_tracks, -1)

    def encode_mix(self, ref_mix: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(bs, 2, seq_len) -> (bs, 2, embed_dim)."""
        if self.sum_and_diff:
            mid = (ref_mix[:, 0:1, :] + ref_mix[:, 1:2, :])
            side = (ref_mix[:, 0:1, :] - ref_mix[:, 1:2, :])
            mid_e = self.mix_encoder(mid, train)
            side_e = self.mix_encoder(side, train)
            return jnp.stack([mid_e, side_e], axis=1)
        e = self.mix_encoder(
            ref_mix.reshape(ref_mix.shape[0] * 2, 1, ref_mix.shape[-1]), train
        )
        return e.reshape(ref_mix.shape[0], 2, -1)

    def control(
        self,
        track_embeds: jnp.ndarray,
        mix_embeds: jnp.ndarray,
        track_padding_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        return self.controller(
            track_embeds, mix_embeds, track_padding_mask, train=train
        )

    def __call__(
        self,
        tracks: jnp.ndarray,
        ref_mix: jnp.ndarray,
        track_padding_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """
        Args:
          tracks: (bs, num_tracks, seq_len) mono stems.
          ref_mix: (bs, 2, seq_len) stereo reference mix.
          track_padding_mask: (bs, num_tracks) True = padded.

        Returns:
          (track_params, fx_bus_params, master_bus_params), all in (0, 1).
        """
        track_embeds = self.encode_tracks(tracks, train=train)
        mix_embeds = self.encode_mix(ref_mix, train=train)
        return self.control(track_embeds, mix_embeds, track_padding_mask, train=train)

    @staticmethod
    def build(
        embed_dim: int = 512,
        n_fft: int = 2048,
        hop_length: int = 512,
        num_layers: int = 12,
        nhead: int = 8,
        num_track_control_params: int = 27,
        num_fx_bus_control_params: int = 25,
        num_master_bus_control_params: int = 26,
        sum_and_diff: bool = False,
        bn_axis_name: Optional[str] = None,
        cnn_base_width: int = 64,
        cnn_min_width: int = 0,
        crop_nyquist_bin: bool = False,
        compute_dtype: Optional[str] = None,
        remat_encoders: bool = False,
        remat_blocks: int = 0,
    ) -> "MixStyleTransferModel":
        """The shipped configuration (configs/models/naive.yaml:30-52).

        ``compute_dtype="bfloat16"`` runs convs/matmuls in bf16 on the MXU
        (params and normalization statistics stay float32).
        ``remat_encoders`` rematerializes the Cnn14 encoders on the backward
        pass — the encoders' conv activations dominate train-step HBM at the
        reference recipe shape (batch 4 x 8 tracks x 262,144), so this trades
        ~1/3 more encoder FLOPs for fitting larger batches per chip.
        ``remat_blocks=N`` is the selective alternative: remat only the first
        N Cnn14 blocks (the HBM-dominant ones) and keep the cheap late-block
        activations — most of the memory headroom at a fraction of the
        recompute (mutually exclusive with ``remat_encoders``).
        """
        import flax.linen as nn

        if remat_encoders and remat_blocks:
            raise ValueError("use either remat_encoders or remat_blocks")
        dtype = jnp.dtype(compute_dtype) if compute_dtype else None
        enc_cls = (
            nn.remat(SpectrogramEncoder, static_argnums=(2,))
            if remat_encoders
            else SpectrogramEncoder
        )
        return MixStyleTransferModel(
            track_encoder=enc_cls(
                embed_dim=embed_dim,
                n_fft=n_fft,
                hop_length=hop_length,
                bn_axis_name=bn_axis_name,
                cnn_base_width=cnn_base_width,
                cnn_min_width=cnn_min_width,
                crop_nyquist=crop_nyquist_bin,
                dtype=dtype,
                remat_blocks=remat_blocks,
            ),
            mix_encoder=enc_cls(
                embed_dim=embed_dim,
                n_fft=n_fft,
                hop_length=hop_length,
                bn_axis_name=bn_axis_name,
                cnn_base_width=cnn_base_width,
                cnn_min_width=cnn_min_width,
                crop_nyquist=crop_nyquist_bin,
                dtype=dtype,
                remat_blocks=remat_blocks,
            ),
            controller=TransformerController(
                embed_dim=embed_dim,
                num_track_control_params=num_track_control_params,
                num_fx_bus_control_params=num_fx_bus_control_params,
                num_master_bus_control_params=num_master_bus_control_params,
                num_layers=num_layers,
                nhead=nhead,
                dtype=dtype,
            ),
            sum_and_diff=sum_and_diff,
        )
