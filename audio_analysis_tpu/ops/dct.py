"""DCT-II on device via rFFT (for the legacy cacophony index).

Replaces ``scipy.fftpack.dct`` (reference: src/cacophony_index.py:57) with the
standard length-2N rFFT factorisation, which XLA maps to its native TPU FFT.
Unnormalised ("norm=None") to match scipy's default:

    y[k] = 2 * sum_n x[n] * cos(pi * k * (2n + 1) / (2N))
"""

import numpy as np
import jax.numpy as jnp


def dct2(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Unnormalised DCT-II along `axis` (scipy.fftpack.dct type=2, norm=None)."""
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    # Even extension: rfft of [x, reversed(x)] gives 2N-point spectrum whose
    # phase-shifted real part is the DCT-II.
    ext = jnp.concatenate([x, x[..., ::-1]], axis=-1)
    spec = jnp.fft.rfft(ext, axis=-1)[..., :n]
    # Twiddle exp(-i*pi*k/(2N)) applied in real arithmetic: complex constants
    # cannot be transferred to the TPU backend, and real(spec*shift) only
    # needs cos/sin anyway.
    theta = np.pi * np.arange(n) / (2.0 * n)
    cos = jnp.asarray(np.cos(theta), dtype=jnp.float32)
    sin = jnp.asarray(np.sin(theta), dtype=jnp.float32)
    out = jnp.real(spec) * cos + jnp.imag(spec) * sin
    return jnp.moveaxis(out, -1, axis)
