"""Sample-rate conversion as a strided polyphase convolution on device.

Replaces librosa.resample — whose default backend is soxr at the "HQ"
quality level (reference: src/identify_tracks.py:56) — and the old-index
path's ``ffmpeg -ar 16000`` (reference: src/common.py:76-90) with a
windowed-sinc polyphase resampler expressed as a single
``lax.conv_general_dilated`` (lhs_dilation = upsample factor, stride =
downsample factor) — exactly the op XLA maps onto the TPU convolution path.
Filter design happens on host in float64.

Parity statement (see tests/test_resample_quality.py): bit-exact parity
with soxr is impossible without the soxr library (absent from this image,
like librosa itself); instead the filter is designed TO THE SAME SPEC as
soxr's HQ level — linear phase, passband to 91.3% of the limiting Nyquist,
~120 dB (20-bit) stopband attenuation — and the tests enforce the spec
directly: >100 dB reconstruction SNR on band-limited signals, <0.01 dB
passband ripple, >110 dB alias rejection, and exact output length/phase
alignment. Downstream consumers (mel spectrograms in float32) cannot
distinguish resamplers beyond that spec: float32 itself has ~7 significant
digits (~140 dB).
"""

import math
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

# soxr-HQ-class design targets
_QUALITY = {
    # name: (stopband attenuation dB, passband edge as fraction of Nyquist)
    "hq": (120.0, 0.913),
    # scipy.signal.resample_poly's default design (kaiser beta 5.0,
    # 10*max_rate half-length) — kept for tests/back-compat
    "fast": (None, None),
}


def design_resample_filter(up: int, down: int, quality: str = "hq") -> np.ndarray:
    """FIR low-pass for polyphase resampling (host-side, float64).

    "hq" follows the soxr HQ spec (see module docstring); "fast" reproduces
    scipy.signal.resample_poly's default (firwin(2*10*max_rate+1,
    1/max_rate, kaiser beta 5.0)).
    """
    max_rate = max(up, down)
    if quality == "fast":
        f_c = 1.0 / max_rate
        half_len = 10 * max_rate
        n = 2 * half_len + 1
        beta = 5.0
    else:
        atten, passband = _QUALITY["hq"]
        # Kaiser window design: beta from the attenuation target, tap count
        # from the transition width (Oppenheim & Schafer 7.104/7.105)
        beta = 0.1102 * (atten - 8.7)
        delta_f = (1.0 - passband) / max_rate  # transition width, Nyquist units
        n = int(np.ceil((atten - 7.95) / (2.285 * np.pi * delta_f)))
        if n % 2 == 0:
            n += 1  # odd length -> integer group delay, linear phase
        half_len = (n - 1) // 2
        # cutoff at the transition midpoint: passband edge stays flat,
        # stopband reaches full attenuation at the folding frequency
        f_c = (1.0 + passband) / 2.0 / max_rate
    t = np.arange(n, dtype=np.float64) - half_len
    h = np.sinc(f_c * t) * f_c
    h *= np.kaiser(n, beta)
    # Normalise passband gain to 1 at DC, then scale by `up` to preserve
    # amplitude through zero-stuffing.
    h /= h.sum()
    return (h * up).astype(np.float64)


@lru_cache(maxsize=32)
def _filter_const(up: int, down: int, quality: str) -> np.ndarray:
    return design_resample_filter(up, down, quality)


@lru_cache(maxsize=32)
def _polyphase_bank(up: int, down: int, quality: str):
    """Decompose the FIR into a per-phase kernel bank for a channelised conv.

    Derivation: with the centred zero-stuffed formulation
    ``y[m] = sum_t h[t] * x_up[m*down + t - half_len]`` and m = b*up + p,
    only x indices q with up*q == m*down + t - half_len contribute, so with
    r = q - b*down:  y[b*up+p] = sum_r g_p[r] * x[b*down + r],
    g_p[r] = h[up*r - p*down + half_len]. One lax conv with `up` output
    channels and stride `down` computes every phase at once — a dense
    channelised conv the MXU eats, instead of an lhs_dilation=up conv that
    the TPU backend handles pathologically for large `up` (measured: a
    44.1k->48k 28k-tap dilated conv never finished compiling on the chip).
    Returns (kernel [up, 1, W], r_min).
    """
    h = _filter_const(up, down, quality)
    n = len(h)
    half_len = (n - 1) // 2
    r_min = math.ceil((0 - half_len) / up)
    r_max = math.floor((n - 1 + (up - 1) * down - half_len) / up)
    width = r_max - r_min + 1
    bank = np.zeros((up, 1, width), np.float64)
    for p in range(up):
        w = np.arange(width)
        t = up * (w + r_min) - p * down + half_len
        valid = (t >= 0) & (t < n)
        bank[p, 0, valid] = h[t[valid]]
    return bank.astype(np.float32), r_min


def resample_poly(x: jnp.ndarray, up: int, down: int, quality: str = "hq") -> jnp.ndarray:
    """Polyphase resample along the last axis (zero-padded edges, output
    length ceil(n*up/down) — matching scipy.resample_poly/librosa)."""
    up = int(up)
    down = int(down)
    g = math.gcd(up, down)
    up //= g
    down //= g
    if up == 1 and down == 1:
        return x

    n_in = x.shape[-1]
    n_out = -(-n_in * up // down)  # ceil
    batch_shape = x.shape[:-1]
    xb = x.reshape((-1, 1, n_in)).astype(jnp.float32)  # [N, C=1, W]

    if up == 1:
        # pure decimation: a plain strided conv is already the right op
        h = _filter_const(up, down, quality)
        half_len = (len(h) - 1) // 2
        k = jnp.asarray(h, dtype=jnp.float32).reshape((1, 1, -1))
        y = jax.lax.conv_general_dilated(
            xb,
            k,
            window_strides=(down,),
            padding=[(half_len, half_len + down * n_out)],
            dimension_numbers=("NCW", "OIW", "NCW"),
        )
        y = y[..., 0, :n_out]
        return y.reshape(batch_shape + (n_out,))

    # rational/up-sampling: channelised polyphase conv (see _polyphase_bank)
    bank, r_min = _polyphase_bank(up, down, quality)
    width = bank.shape[-1]
    n_blocks = -(-n_out // up)
    pad_left = -r_min
    # block b reads x[b*down + r_min : b*down + r_max]; ensure the last
    # block's window exists after padding
    pad_right = max(0, (n_blocks - 1) * down + (width - 1) + r_min - (n_in - 1))
    y = jax.lax.conv_general_dilated(
        xb,
        jnp.asarray(bank),
        window_strides=(down,),
        padding=[(pad_left, pad_right)],
        dimension_numbers=("NCW", "OIW", "NCW"),
    )  # [N, up, >=n_blocks]
    y = y[:, :, :n_blocks]
    y = jnp.transpose(y, (0, 2, 1)).reshape(y.shape[0], n_blocks * up)
    y = y[:, :n_out]
    return y.reshape(batch_shape + (n_out,))


def resample(x: jnp.ndarray, orig_sr: int, target_sr: int, quality: str = "hq") -> jnp.ndarray:
    """Resample along the last axis from orig_sr to target_sr.

    Host-resident input (a numpy array, not a jax.Array) runs the polyphase
    program on the CPU backend: every such call site (old-index 16 kHz,
    embeddings 32 kHz, load_recording) converts straight back to numpy, and
    the tunnel TPU backend compiles the wide 1-D decimation conv
    pathologically (measured: 10+ min for ONE 20 s recording, uncached
    across runs — round-5 finding). Device-resident input keeps the
    caller's backend."""
    if orig_sr == target_sr:
        return x
    if not isinstance(x, jax.Array):
        cpu = jax.local_devices(backend="cpu")
        if cpu and jax.default_backend() != "cpu":
            with jax.default_device(cpu[0]):
                return np.asarray(
                    resample_poly(
                        jnp.asarray(np.asarray(x)),
                        int(target_sr),
                        int(orig_sr),
                        quality=quality,
                    )
                )
    return resample_poly(x, int(target_sr), int(orig_sr), quality=quality)
