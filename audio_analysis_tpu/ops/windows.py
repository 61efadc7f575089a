"""Window functions as jnp arrays (host-computable, device-constant).

Replaces the reference's numpy/scipy window zoo and cache
(reference: src/common.py:21-62). All windows are float32 and cached per
(name, length, periodic) key on host; inside jit they are closed-over
constants, so there is no runtime cost.
"""

from functools import lru_cache

import numpy as np
import jax.numpy as jnp

_SUPPORTED = (
    "hann",
    "hanning",
    "hamming",
    "bartlett",
    "blackman",
    "kaiser",
    "tukey",
    "rect",
)


@lru_cache(maxsize=64)
def _window_np(name: str, length: int, periodic: bool) -> np.ndarray:
    """Compute a window on host in float64, returned as float32.

    `periodic=True` gives the DFT-even ("fftbins") variant used for STFT
    analysis; `periodic=False` gives the symmetric variant that
    numpy.hanning/hamming/etc. produce (used by the legacy cacophony index,
    reference: src/common.py:39-40, src/cacophony_index.py:55).
    """
    if length == 1:
        return np.ones(1, dtype=np.float32)
    # Symmetric windows of length N == periodic windows of length N-1 plus
    # the mirrored first sample; compute directly instead.
    n = np.arange(length, dtype=np.float64)
    denom = float(length) if periodic else float(length - 1)
    if name in ("hann", "hanning"):
        w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / denom)
    elif name == "hamming":
        w = 0.54 - 0.46 * np.cos(2.0 * np.pi * n / denom)
    elif name == "blackman":
        w = (
            0.42
            - 0.5 * np.cos(2.0 * np.pi * n / denom)
            + 0.08 * np.cos(4.0 * np.pi * n / denom)
        )
    elif name == "bartlett":
        # numpy.bartlett (symmetric triangular, zero endpoints)
        w = 1.0 - np.abs(2.0 * n / denom - 1.0)
    elif name == "kaiser":
        beta = 14.0  # reference uses beta=14 (src/common.py:43)
        w = np.kaiser(length if not periodic else length + 1, beta)
        if periodic:
            w = w[:-1]
    elif name == "tukey":
        alpha = 0.5
        m = length if not periodic else length + 1
        x = np.linspace(0, 1, m)
        w = np.ones(m)
        lo = x < alpha / 2
        hi = x >= 1 - alpha / 2
        w[lo] = 0.5 * (1 + np.cos(2 * np.pi / alpha * (x[lo] - alpha / 2)))
        w[hi] = 0.5 * (1 + np.cos(2 * np.pi / alpha * (x[hi] - 1 + alpha / 2)))
        if periodic:
            w = w[:-1]
    elif name == "rect":
        w = np.ones(length)
    else:
        raise ValueError(f"window family {name!r} not supported; use {_SUPPORTED}")
    return w.astype(np.float32)


def get_window(name: str, length: int, periodic: bool = True) -> jnp.ndarray:
    """Return a float32 window of `length` samples as a jnp array."""
    return jnp.asarray(_window_np(name, int(length), bool(periodic)))


def get_window_np(name: str, length: int, periodic: bool = True) -> np.ndarray:
    """Host (numpy) variant for host-side code paths."""
    return _window_np(name, int(length), bool(periodic))
