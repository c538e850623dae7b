"""L3 — neural models (Flax)."""

from diffmst_tpu.models.cnn14 import Cnn14, ConvBlock
from diffmst_tpu.models.controller import TransformerController
from diffmst_tpu.models.encoders import (
    PositionalEncoding,
    SpectrogramEncoder,
    WaveformTransformerEncoder,
)
from diffmst_tpu.models.fx_encoder import (
    FXencoder,
    ParameterProjector,
    default_fx_encoder_config,
)
from diffmst_tpu.models.hdemucs import (
    HDEMUCS_SOURCES,
    hdemucs_apply,
    make_hdemucs_separator,
    synthetic_hdemucs_state_dict,
)
from diffmst_tpu.models.mst_model import MixStyleTransferModel
from diffmst_tpu.models.separator import UNetSeparator, hpss_separator
from diffmst_tpu.models.transformer import TransformerEncoder, TransformerEncoderLayer

__all__ = [
    "hpss_separator",
    "UNetSeparator",
    "HDEMUCS_SOURCES",
    "hdemucs_apply",
    "make_hdemucs_separator",
    "synthetic_hdemucs_state_dict",
    "Cnn14",
    "ConvBlock",
    "TransformerController",
    "SpectrogramEncoder",
    "WaveformTransformerEncoder",
    "PositionalEncoding",
    "FXencoder",
    "ParameterProjector",
    "default_fx_encoder_config",
    "MixStyleTransferModel",
    "TransformerEncoder",
    "TransformerEncoderLayer",
]
