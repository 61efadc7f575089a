"""Pallas TPU kernels for the hot ops."""

from audio_analysis_tpu.ops.pallas.melspec import pallas_mel_spectrogram

__all__ = ["pallas_mel_spectrogram"]
