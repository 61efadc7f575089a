"""Runtime utilities: compilation cache, logging, timing."""

from audio_analysis_tpu.utils.runtime import enable_compilation_cache

__all__ = ["enable_compilation_cache"]
