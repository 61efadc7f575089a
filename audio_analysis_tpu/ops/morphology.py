"""Binary morphology on device via ``lax.reduce_window``.

Replaces the reference's OpenCV calls (src/identify_tracks.py:669-684:
MORPH_OPEN 4x4, dilate (h, 42), erode (h//10, 42)) with XLA reduce_window
max/min ops that run on the TPU VPU, with OpenCV's exact anchor semantics:

- anchor at (k//2) per axis, i.e. window offsets [-(k//2), k-1-k//2]
  (empirically verified against cv2 for even and odd kernels);
- borders behave as identity (erode pads +inf, dilate pads -inf).
"""

import jax
import jax.numpy as jnp


def _reduce2d(x: jnp.ndarray, kh: int, kw: int, is_max: bool) -> jnp.ndarray:
    pad = [(0, 0)] * (x.ndim - 2) + [
        (kh // 2, kh - 1 - kh // 2),
        (kw // 2, kw - 1 - kw // 2),
    ]
    window = (1,) * (x.ndim - 2) + (kh, kw)
    strides = (1,) * x.ndim
    if is_max:
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, window, strides, pad
        )
    return jax.lax.reduce_window(x, jnp.inf, jax.lax.min, window, strides, pad)


def dilate(x: jnp.ndarray, kh: int, kw: int) -> jnp.ndarray:
    """cv2.dilate with an all-ones (kh, kw) kernel over the last two axes."""
    return _reduce2d(x.astype(jnp.float32), kh, kw, is_max=True)


def erode(x: jnp.ndarray, kh: int, kw: int) -> jnp.ndarray:
    """cv2.erode with an all-ones (kh, kw) kernel over the last two axes."""
    return _reduce2d(x.astype(jnp.float32), kh, kw, is_max=False)


def opening(x: jnp.ndarray, kh: int, kw: int) -> jnp.ndarray:
    """cv2.morphologyEx(MORPH_OPEN) == erode then dilate with one kernel."""
    return dilate(erode(x, kh, kw), kh, kw)
