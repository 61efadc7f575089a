"""Spectral signal detection and track assembly."""

from audio_analysis_tpu.detect.signal import (
    Signal,
    Prediction,
    ModelResult,
    segment_overlap,
    mel_freq,
    merge_signals,
    get_tracks_from_signals,
    get_master_tag,
)
from audio_analysis_tpu.detect.signal_noise import (
    signal_noise,
    get_end,
    detect,
    detect_batch,
)

__all__ = [
    "Signal",
    "Prediction",
    "ModelResult",
    "segment_overlap",
    "mel_freq",
    "merge_signals",
    "get_tracks_from_signals",
    "get_master_tag",
    "signal_noise",
    "get_end",
    "detect",
    "detect_batch",
]
