"""L0 — differentiable DSP primitives (TPU-native replacement for dasp-pytorch).

Every op is a pure function over static shapes: jit-, vmap-, grad- and
shard_map-clean. See individual modules for the reference call sites whose
behavior each op reproduces.
"""

from diffmst_tpu.ops.basic import (
    db_to_linear,
    gain,
    mono_to_stereo,
    stereo_bus,
    stereo_panner,
)
from diffmst_tpu.ops.biquad import biquad, sos_frequency_response
from diffmst_tpu.ops.compressor import compressor, compressor_gain_db
from diffmst_tpu.ops.eq import parametric_eq, parametric_eq_response
from diffmst_tpu.ops.iir import biquad_scan, sosfilt_scan
from diffmst_tpu.ops.loudness import (
    integrated_loudness,
    integrated_loudness_jax,
    loudness_normalize,
)
from diffmst_tpu.ops.reverb import (
    fft_convolve,
    noise_shaped_reverberation,
    octave_band_filterbank,
)
from diffmst_tpu.ops.stft import frame_signal, hann_window, spectrogram_mag, stft

__all__ = [
    "db_to_linear",
    "gain",
    "mono_to_stereo",
    "stereo_bus",
    "stereo_panner",
    "biquad",
    "sos_frequency_response",
    "compressor",
    "compressor_gain_db",
    "parametric_eq",
    "sosfilt_scan",
    "biquad_scan",
    "parametric_eq_response",
    "integrated_loudness",
    "integrated_loudness_jax",
    "loudness_normalize",
    "fft_convolve",
    "noise_shaped_reverberation",
    "octave_band_filterbank",
    "frame_signal",
    "hann_window",
    "spectrogram_mag",
    "stft",
]
