"""audio_analysis_tpu — a TPU-native (JAX/XLA/Pallas) audio-analysis framework.

A from-scratch rebuild of the capabilities of TheCacophonyProject/audio-analysis
(reference: /root/reference) designed TPU-first:

- The DSP frontend (STFT, break-frequency mel filterbank, dB scaling,
  resampling, DCT, IIR band-pass) is a family of fused XLA/Pallas kernels
  batched over an on-device window grid, replacing the reference's per-window
  librosa/numba host loops (reference: src/identify_tracks.py:163-196).
- Spectral signal detection (median thresholding + morphology) runs on device
  via `lax.reduce_window`; connected-component labelling runs in a native C++
  host op (replacing OpenCV, reference: src/identify_tracks.py:650-706).
- Classifier inference is a single jit'd batched forward pass over the window
  grid with on-device ensemble/window means (reference: src/identify_tracks.py:536-571).
- Scale-out is expressed with `jax.sharding.Mesh` + NamedSharding: recordings
  batch along a `data` axis and the window grid shards along a `window` axis,
  with XLA collectives for the reductions.

Public entry points mirror the reference CLI contract (src/analyse.py:382-420).
"""

from audio_analysis_tpu.version import __version__
from audio_analysis_tpu.utils.runtime import enable_compilation_cache

# Persistent XLA compile cache: load-bearing for CLI latency (fresh process
# per recording; cold compiles of the detection programs take 6-25 s).
enable_compilation_cache()

__all__ = ["__version__"]
