"""End-to-end analysis pipelines (classify, cacophony index, morepork)."""

from audio_analysis_tpu.pipeline.classify import classify
from audio_analysis_tpu.pipeline.cacophony import (
    calc_cacophony_index,
    get_chirps,
    filter_tracks,
    get_max_chirps,
)

__all__ = [
    "classify",
    "calc_cacophony_index",
    "get_chirps",
    "filter_tracks",
    "get_max_chirps",
]
