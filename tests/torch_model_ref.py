"""Torch twin of the full MixStyleTransferModel for port-parity testing.

Reimplements the reference model architecture (/root/reference/mst/
modules.py:17-68 MixStyleTransferModel, modules.py:740-806
SpectrogramEncoder, mst/panns.py:126-209 Cnn14, modules.py:809-914
TransformerController) directly in torch.nn, with the reference's parameter
naming (``model.track_encoder.model.conv_block1.conv1.weight`` ...), so that
``port_torch_state_dict`` can map its state_dict onto the Flax tree and the
two models can be compared end to end on the same inputs.

This is a test fixture, not product code: widths are configurable so parity
runs at toy scale on CPU.
"""

from __future__ import annotations

import torch
import torch.nn.functional as F

_POOLS = ((2, 2), (4, 4), (4, 2), (4, 2), (4, 2), (2, 2))


class ConvBlock(torch.nn.Module):
    def __init__(self, in_ch: int, out_ch: int):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(in_ch, out_ch, 3, padding=1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(out_ch)
        self.conv2 = torch.nn.Conv2d(out_ch, out_ch, 3, padding=1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(out_ch)

    def forward(self, x, pool):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        return F.avg_pool2d(x, pool)


class Cnn14(torch.nn.Module):
    def __init__(self, num_classes: int, base_width: int = 64, n_inputs: int = 1):
        super().__init__()
        chans = [n_inputs] + [base_width << i for i in range(6)]
        for i in range(6):
            setattr(self, f"conv_block{i + 1}", ConvBlock(chans[i], chans[i + 1]))
        self.fc = torch.nn.Linear(chans[-1], num_classes)

    def forward(self, x):
        """x: (bs, chs, bins, frames) -> (bs, num_classes)."""
        for i, pool in enumerate(_POOLS):
            x = getattr(self, f"conv_block{i + 1}")(x, pool)
        x = x.mean(dim=2)  # mean over frequency bins
        x = x.max(dim=2).values + x.mean(dim=2)  # max+mean over time
        return self.fc(x)


class SpectrogramEncoder(torch.nn.Module):
    def __init__(self, embed_dim: int, base_width: int = 64, n_fft: int = 2048,
                 hop_length: int = 512, spec_power: float = 0.3,
                 spec_eps: float = 1e-8):
        super().__init__()
        self.n_fft, self.hop = n_fft, hop_length
        self.spec_power, self.spec_eps = spec_power, spec_eps
        self.model = Cnn14(embed_dim, base_width=base_width)

    def forward(self, x):
        """(bs, 1, seq_len) -> (bs, embed_dim)."""
        bs, chs, t = x.shape
        X = torch.stft(
            x.reshape(bs * chs, t), self.n_fft, self.hop,
            window=torch.hann_window(self.n_fft), return_complex=True,
        )
        mag = torch.pow(X.abs() + self.spec_eps, self.spec_power)
        return self.model(mag.reshape(bs, chs, *mag.shape[-2:]))


class TransformerController(torch.nn.Module):
    def __init__(self, embed_dim: int, num_layers: int = 2, nhead: int = 4,
                 n_track: int = 27, n_fx: int = 25, n_master: int = 26):
        super().__init__()
        d = embed_dim
        self.track_embedding = torch.nn.Parameter(torch.randn(1, 1, d))
        self.mix_embedding = torch.nn.Parameter(torch.randn(1, 2, d))
        self.fx_bus_embedding = torch.nn.Parameter(torch.randn(1, 1, d))
        self.master_bus_embedding = torch.nn.Parameter(torch.randn(1, 1, d))
        layer = torch.nn.TransformerEncoderLayer(
            d, nhead, batch_first=True, dropout=0.0
        )
        self.transformer_encoder = torch.nn.TransformerEncoder(layer, num_layers)
        self.track_projection = torch.nn.Linear(d, n_track)
        self.fx_bus_projection = torch.nn.Linear(d, n_fx)
        self.master_bus_projection = torch.nn.Linear(d, n_master)

    def forward(self, track_embeds, mix_embeds):
        """(bs, n, d), (bs, 2, d) -> sigmoid param tensors (no padding)."""
        bs, n, d = track_embeds.shape
        seq = torch.cat(
            [
                track_embeds + self.track_embedding.expand(bs, n, d),
                mix_embeds + self.mix_embedding.expand(bs, 2, d),
                self.fx_bus_embedding.expand(bs, 1, d),
                self.master_bus_embedding.expand(bs, 1, d),
            ],
            dim=1,
        )
        z = self.transformer_encoder(seq)
        tp = torch.sigmoid(self.track_projection(z[:, :n]))
        fp = torch.sigmoid(self.fx_bus_projection(z[:, n + 2]))
        mp = torch.sigmoid(self.master_bus_projection(z[:, n + 3]))
        return tp, fp, mp


class MixStyleTransferModel(torch.nn.Module):
    def __init__(self, embed_dim: int = 32, base_width: int = 8,
                 num_layers: int = 2, nhead: int = 4):
        super().__init__()
        self.track_encoder = SpectrogramEncoder(embed_dim, base_width)
        self.mix_encoder = SpectrogramEncoder(embed_dim, base_width)
        self.controller = TransformerController(
            embed_dim, num_layers=num_layers, nhead=nhead
        )

    def forward(self, tracks, ref_mix):
        """(bs, n, T), (bs, 2, T) -> (track_params, fx_params, master_params)."""
        bs, n, t = tracks.shape
        te = self.track_encoder(tracks.reshape(bs * n, 1, t)).reshape(bs, n, -1)
        me = self.mix_encoder(
            ref_mix.reshape(bs * 2, 1, ref_mix.shape[-1])
        ).reshape(bs, 2, -1)
        return self.controller(te, me)


def randomize_batchnorm_stats(model: torch.nn.Module, seed: int = 0):
    """Non-trivial running stats so the eval-mode BN path is actually tested."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.num_features, generator=g) + 0.5
                )
                m.weight.copy_(1.0 + torch.randn(m.num_features, generator=g) * 0.1)
                m.bias.copy_(torch.randn(m.num_features, generator=g) * 0.1)
