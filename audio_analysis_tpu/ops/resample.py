"""Sample-rate conversion as a strided polyphase convolution on device.

Replaces librosa.resample (reference: src/identify_tracks.py:56) with a
windowed-sinc polyphase resampler expressed as a single
``lax.conv_general_dilated`` (lhs_dilation = upsample factor, stride =
downsample factor) — exactly the op XLA maps onto the TPU convolution path.
Filter design (Kaiser-windowed sinc, scipy.signal.resample_poly-compatible)
happens on host in float64.
"""

import math
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp


def _kaiser_sinc_filter(up: int, down: int, beta: float = 5.0) -> np.ndarray:
    """FIR low-pass for polyphase resampling (matches scipy.resample_poly's
    default design: firwin(2*10*max_rate+1, 1/max_rate, kaiser beta 5.0))."""
    max_rate = max(up, down)
    f_c = 1.0 / max_rate  # cutoff in Nyquist units
    half_len = 10 * max_rate
    n = 2 * half_len + 1
    t = np.arange(n, dtype=np.float64) - half_len
    h = np.sinc(f_c * t) * f_c
    h *= np.kaiser(n, beta)
    # Normalise passband gain to 1 at DC, then scale by `up` to preserve
    # amplitude through zero-stuffing.
    h /= h.sum()
    return (h * up).astype(np.float64)


@lru_cache(maxsize=32)
def _filter_const(up: int, down: int) -> np.ndarray:
    return _kaiser_sinc_filter(up, down)


def resample_poly(x: jnp.ndarray, up: int, down: int) -> jnp.ndarray:
    """Polyphase resample along the last axis (scipy.signal.resample_poly
    semantics: zero-padded edges, output length ceil(n*up/down))."""
    up = int(up)
    down = int(down)
    g = math.gcd(up, down)
    up //= g
    down //= g
    if up == 1 and down == 1:
        return x

    h = _filter_const(up, down)
    half_len = (len(h) - 1) // 2
    n_in = x.shape[-1]
    n_out = -(-n_in * up // down)  # ceil

    batch_shape = x.shape[:-1]
    xb = x.reshape((-1, 1, n_in)).astype(jnp.float32)  # [N, C=1, W]
    k = jnp.asarray(h, dtype=jnp.float32).reshape((1, 1, -1))  # [O, I, W]

    # Output sample m taps x_up[m*down + j] for j around the filter centre:
    # pad the (dilated) input by half_len on the left so index 0 aligns.
    y = jax.lax.conv_general_dilated(
        xb,
        k,
        window_strides=(down,),
        padding=[(half_len, half_len + down * n_out)],
        lhs_dilation=(up,),
        rhs_dilation=(1,),
        dimension_numbers=("NCW", "OIW", "NCW"),
    )
    y = y[..., 0, :n_out]
    return y.reshape(batch_shape + (n_out,))


def resample(x: jnp.ndarray, orig_sr: int, target_sr: int) -> jnp.ndarray:
    """Resample along the last axis from orig_sr to target_sr."""
    if orig_sr == target_sr:
        return x
    return resample_poly(x, int(target_sr), int(orig_sr))
