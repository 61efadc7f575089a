"""Short-time Fourier transform, TPU-native.

Semantics follow the reference's librosa calls (reference:
src/identify_tracks.py:243,654, src/identify_morepork.py:24): hann window of
``n_fft`` (periodic), ``center=True`` with zero ("constant") padding of
``n_fft//2`` on both ends, frames every ``hop_length`` samples, rFFT of each
frame. Layout matches librosa: ``[..., 1 + n_fft//2, n_frames]``.

The implementation is one gather (framing) + one windowed batched rFFT —
a single fused XLA program, in contrast with the reference's per-call numba
loops. For batched window grids use the leading batch dims; everything is
static-shape so XLA tiles it once.
"""

import numpy as np
import jax.numpy as jnp

from audio_analysis_tpu.ops.windows import get_window


def num_frames(n_samples: int, hop_length: int, n_fft: int, center: bool = True) -> int:
    """Number of STFT frames (librosa convention)."""
    if center:
        return 1 + n_samples // hop_length
    return 1 + (n_samples - n_fft) // hop_length


def frame(y: jnp.ndarray, frame_length: int, hop_length: int) -> jnp.ndarray:
    """Slice ``y[..., T]`` into overlapping frames ``[..., n_frames, frame_length]``.

    No gather: pad to a hop multiple, reshape to [..., rows, hop], then
    concatenate ceil(frame/hop) shifted row-slices. A gather with a
    [n_frames, frame_length] index array takes XLA-TPU minutes to *compile*
    (measured 160 s for 60 s of audio); this slice/reshape form compiles in
    seconds and streams at full HBM bandwidth.
    """
    n = y.shape[-1]
    n_fr = 1 + (n - frame_length) // hop_length
    k = -(-frame_length // hop_length)  # ceil(frame/hop) shifted views
    total = (n_fr + k) * hop_length
    pad = [(0, 0)] * (y.ndim - 1) + [(0, total - n)]
    z = jnp.pad(y, pad).reshape(y.shape[:-1] + (n_fr + k, hop_length))
    slabs = [z[..., i : i + n_fr, :] for i in range(k)]
    frames = jnp.concatenate(slabs, axis=-1)  # [..., n_fr, k*hop]
    return frames[..., :frame_length]


def stft(
    y: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    window: str = "hann",
    center: bool = True,
) -> jnp.ndarray:
    """Complex STFT ``[..., 1 + n_fft//2, n_frames]`` (librosa layout)."""
    if center:
        pad = [(0, 0)] * (y.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        y = jnp.pad(y, pad)
    frames = frame(y, n_fft, hop_length)  # [..., n_frames, n_fft]
    w = get_window(window, n_fft, periodic=True)
    spec = jnp.fft.rfft(frames * w, axis=-1)  # [..., n_frames, 1 + n_fft//2]
    return jnp.swapaxes(spec, -1, -2)


def stft_magnitude(
    y: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    window: str = "hann",
    center: bool = True,
    power: float = 1.0,
) -> jnp.ndarray:
    """|STFT|**power, ``[..., 1 + n_fft//2, n_frames]`` float32.

    Kept separate so XLA fuses the magnitude/power directly into the FFT
    epilogue and never materialises the complex array in HBM when the
    consumer is a mel matmul.
    """
    spec = stft(y, n_fft, hop_length, window=window, center=center)
    mag = jnp.abs(spec)
    if power == 1.0:
        return mag
    if power == 2.0:
        # abs()**2 via real*real+imag*imag is already what jnp.abs + square
        # fuses to; keep the simple form.
        return mag * mag
    return mag**power
