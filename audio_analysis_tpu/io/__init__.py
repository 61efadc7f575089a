"""Host I/O: audio decode, sidecar metadata, model configs, checkpoints."""

from audio_analysis_tpu.io.audio import load_recording, load_audio_mono, write_wav
from audio_analysis_tpu.io.metadata import (
    read_sidecar,
    write_sidecar_result,
    jsdump,
)
from audio_analysis_tpu.io.modelconfig import ModelConfig, load_model_meta

__all__ = [
    "load_recording",
    "load_audio_mono",
    "write_wav",
    "read_sidecar",
    "write_sidecar_result",
    "jsdump",
    "ModelConfig",
    "load_model_meta",
]
