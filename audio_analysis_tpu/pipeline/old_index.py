"""Legacy cacophony index (DCT band-energy), device-accelerated.

Reference algorithm (src/cacophony_index.py:53-125): 16 kHz audio, 2048-point
hanning windows every 1024 samples, DCT-II per window, 10 log-spaced band
energies above a 100 Hz bass cut, points = #bands halved + #bands doubled vs
the previous frame, scored over ~20 s bins through a correction curve.

The reference loops window-by-window on host; here every window's DCT + band
energies + frame-to-frame comparison is one device program, and only the tiny
points vector returns to host for the (pure-Python) table assembly.
"""

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from audio_analysis_tpu.ops.windows import get_window
from audio_analysis_tpu.ops.dct import dct2
from audio_analysis_tpu.io.audio import load_audio_mono
from audio_analysis_tpu.ops.resample import resample


def get_ci_bins_edges(window_size: int, sample_rate: int) -> np.ndarray:
    """Log-spaced band edges with the 100 Hz bass cut
    (reference: src/cacophony_index.py:58-63)."""
    bass_cut_off_band = 100 * 2 * window_size // sample_rate
    return np.logspace(
        math.log10(bass_cut_off_band), math.log10(window_size), num=11, dtype=int
    )


@partial(jax.jit, static_argnames=("window_size", "half_window", "sample_rate"))
def _points_program(audio, *, window_size, half_window, sample_rate):
    """Device program: all windows' band energies + change points."""
    n = audio.shape[0]
    # offsets: half_window, 2*half_window, ... while offset < n - 3*half_window
    n_windows = max((n - half_window * 3 - half_window - 1) // half_window + 1, 0)
    starts = half_window + jnp.arange(n_windows) * half_window
    idx = starts[:, None] + jnp.arange(window_size)[None, :]
    frames = audio[idx]  # [W, window_size]
    w = get_window("hanning", window_size, periodic=False)
    d = dct2(frames * w)
    edges = get_ci_bins_edges(window_size, sample_rate)
    # 10 band energies: sum of squares between consecutive edges
    e2 = d * d
    csum = jnp.cumsum(e2, axis=1)
    zero = jnp.zeros((e2.shape[0], 1), e2.dtype)
    csum = jnp.concatenate([zero, csum], axis=1)
    lo = edges[:-1]
    hi = edges[1:]
    bins = csum[:, hi] - csum[:, lo]  # [W, 10]
    prev = bins[:-1]
    cur = bins[1:]
    score_plus = jnp.sum(cur * 2 < prev, axis=1)
    score_minus = jnp.sum(cur > prev * 2, axis=1)
    return score_plus + score_minus  # [W-1] points


def score_from_points(points):
    """10x mean of the sorted 75th-95th percentile slice
    (reference: src/cacophony_index.py:69-73)."""
    points_sorted = sorted(points)
    k0 = int(len(points) * 0.75)
    k1 = int(len(points) * 0.95)
    return 10 * np.mean(points_sorted[k0:k1])


def apply_correction_curve_202001C(raw_score):
    s = raw_score - 10
    return max(100 * s / (s + 18), 0)


def table_from_points(points, sample_rate=16000, half_window_size=1024):
    """~20 s overlapping table entries over the points vector
    (reference: src/cacophony_index.py:99-114): entry starts interpolate
    linearly so the last entry ends exactly at the final point; begin/end
    round with Python round (banker's on .5)."""
    bin_20_width = 312  # ~20 seconds
    table = []
    entry_count = (len(points) + 31) // bin_20_width
    for e in range(entry_count):
        q = 0
        if e:
            q = e * (len(points) - bin_20_width) // (entry_count - 1)
        raw_score = score_from_points(points[q : q + bin_20_width])
        score = apply_correction_curve_202001C(raw_score)
        table.append(
            {
                "begin_s": round(q * half_window_size / sample_rate),
                "end_s": round((q + bin_20_width) * half_window_size / sample_rate),
                "index_percent": round(score, 1),
            }
        )
    return table


def calculate_from_frames(source_data, sample_rate=16000):
    window_size = 2048
    half_window_size = window_size // 2
    audio = jnp.asarray(source_data, dtype=jnp.float32)
    n_windows = max(
        (audio.shape[0] - half_window_size * 3 - half_window_size - 1)
        // half_window_size
        + 1,
        0,
    )
    if n_windows >= 2:
        points = np.asarray(
            _points_program(
                audio,
                window_size=window_size,
                half_window=half_window_size,
                sample_rate=sample_rate,
            )
        ).tolist()
    else:
        points = []

    table = table_from_points(points, sample_rate, half_window_size)

    result = {
        "cacophony_index_old": table,
        "cacophony_index_old_version": "2020-01-20_A",
    }
    if table == []:
        p = source_data.shape[0] / sample_rate
        result["ci_warning"] = (
            "Cacophony Index requires at least 20 seconds of audio, but only"
            " %d seconds of audio were provided." % p
        )
    return result


def calculate(source_file_name):
    """Reference entry (src/cacophony_index.py:81-125): decode at 16 kHz."""
    sample_rate = 16000
    frames, sr = load_audio_mono(source_file_name)
    if sr != sample_rate:
        frames = np.asarray(resample(frames, sr, sample_rate))
    return calculate_from_frames(frames, sample_rate)
