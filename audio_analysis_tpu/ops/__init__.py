"""Core DSP kernels (XLA-first, Pallas where it pays).

Every op here is pure, jit-safe and static-shape so XLA can fuse and tile it
onto the MXU/VPU. Hot path: `stft` (framed rFFT) feeding `mel.mel_matrix`
matmuls — the TPU-native replacement for the reference's librosa calls
(reference: src/identify_tracks.py:243, src/custommel.py:59-63).
"""

from audio_analysis_tpu.ops.windows import get_window
from audio_analysis_tpu.ops.stft import frame, stft_magnitude, stft
from audio_analysis_tpu.ops.mel import (
    hz_to_mel,
    mel_frequencies,
    mel_filterbank,
    fft_frequencies,
)
from audio_analysis_tpu.ops.scale import (
    power_to_db,
    amplitude_to_db,
    normalize_minmax,
)
from audio_analysis_tpu.ops.dct import dct2
from audio_analysis_tpu.ops.resample import resample_poly, resample
from audio_analysis_tpu.ops.filters import butter_bandpass_sos, sosfilt

__all__ = [
    "get_window",
    "frame",
    "stft",
    "stft_magnitude",
    "hz_to_mel",
    "mel_frequencies",
    "mel_filterbank",
    "fft_frequencies",
    "power_to_db",
    "amplitude_to_db",
    "normalize_minmax",
    "dct2",
    "resample_poly",
    "resample",
    "butter_bandpass_sos",
    "sosfilt",
]
