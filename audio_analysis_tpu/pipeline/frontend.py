"""Batched spectrogram frontend: the reference's per-window ``get_spect``
(src/identify_tracks.py:212-288) as one fused device program over the whole
window grid. Normalise -> STFT -> mel matmul -> dB -> mean-sub -> channels,
all static-shape; XLA fuses the epilogues into the FFT/matmul.
"""

import os
from functools import partial

import jax
import jax.numpy as jnp

from audio_analysis_tpu.ops.stft import stft_magnitude
from audio_analysis_tpu.ops.mel import mel_filterbank, mel_filterbank_slaney
from audio_analysis_tpu.ops.scale import power_to_db, normalize_minmax
from audio_analysis_tpu.ops.dct import dct2
from audio_analysis_tpu.models.layers import resize_with_pad


_WARNED_NO_PALLAS = False
_WARNED_BAD_LEVEL = False


def _pallas_backend() -> bool:
    """The DFT->mel kernel is a TPU (Mosaic) kernel; compiled mode exists
    only there — allowlist, so an unknown backend degrades instead of dying
    in the Mosaic lowering. (The axon tunnel plugin reports "tpu" as its
    default backend name; verified on the chip.)"""
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False


# Frontend kernel levels (the resolved value of AAT_PALLAS):
#   0 — XLA FFT + mel einsum
#   1 — Pallas DFT->mel, bf16 MXU passes (the AAT_FAST throughput contract)
#   2 — Pallas DFT->mel, 2-way split-bf16 matmuls (~5e-5 max rel vs f64)
#   3 — Pallas DFT->mel, 3-way split-bf16 matmuls (~1.5e-6 max rel vs f64)
PALLAS_OFF, PALLAS_FAST, PALLAS_EXACT1, PALLAS_EXACT2 = 0, 1, 2, 3

_PALLAS_LEVELS = {
    "exact": PALLAS_EXACT2,
    "exact2": PALLAS_EXACT2,
    "exact1": PALLAS_EXACT1,
    "2": PALLAS_EXACT1,
    "3": PALLAS_EXACT2,
}


def _use_pallas_default() -> int:
    """Resolve the frontend kernel level (see PALLAS_* above).

    Default on the TPU backend is PALLAS_EXACT2 — measured on chip against a
    float64 oracle, the split-bf16 Pallas kernel is BOTH more accurate and
    faster than the XLA path it replaced (XLA's f32 mel einsum runs a single
    bf16 MXU pass despite preferred_element_type: 5.2e-3 max rel @43 ms/256w
    vs exact2's 1.5e-6 @11.4 ms — docs/PERFORMANCE.md "Split-bf16 exact
    mode"). So "strict parity" is now better served by the Pallas kernel.

    AAT_PALLAS=exact[12]?/1/0 picks a level explicitly (0 wins over
    AAT_FAST; AAT_FAST=1 means level 1, the bf16 throughput contract). On a
    non-TPU backend every level degrades to the XLA path, with a one-time
    warning only when a level was explicitly requested."""
    from audio_analysis_tpu.utils.runtime import env_flag, fast_mode

    raw = os.environ.get("AAT_PALLAS", "").strip().lower()
    explicit = True
    if raw in _PALLAS_LEVELS:
        v = _PALLAS_LEVELS[raw]
    elif raw and raw not in ("1", "true", "on", "yes", "0", "false", "off", "no"):
        # near-miss strings (e.g. "exact-2", "exact3") must NOT silently
        # disable the kernels below the unset default — warn and ignore
        global _WARNED_BAD_LEVEL
        if not _WARNED_BAD_LEVEL:
            _WARNED_BAD_LEVEL = True
            import logging

            logging.warning(
                "unrecognised AAT_PALLAS=%r (expected one of %s or a boolean);"
                " using the default level",
                raw,
                sorted(_PALLAS_LEVELS),
            )
        explicit = False
        # fall through to the SAME default resolution as the unset case:
        # under AAT_FAST the default level is the bf16 throughput kernel,
        # not the parity kernel (a typo'd AAT_PALLAS must not silently
        # drop fast mode to parity speed)
        v = PALLAS_FAST if fast_mode() else PALLAS_EXACT2
    else:
        b = env_flag("AAT_PALLAS")
        if b is not None:
            v = PALLAS_FAST if b else PALLAS_OFF
        elif fast_mode():
            v = PALLAS_FAST
        else:
            explicit = False
            v = PALLAS_EXACT2  # parity-grade default (TPU only, see below)
    if v and not _pallas_backend():
        if explicit:
            global _WARNED_NO_PALLAS
            if not _WARNED_NO_PALLAS:
                _WARNED_NO_PALLAS = True
                import logging

                logging.warning(
                    "AAT_PALLAS/AAT_FAST requested but the %s backend cannot "
                    "run the Mosaic kernel; using the XLA FFT frontend",
                    __import__("jax").default_backend(),
                )
        return PALLAS_OFF
    return int(v)


def spectrogram_grid(windows, *, use_pallas=None, **kw):
    """[N, sample_size] PCM windows -> [N, n_mels, frames, channels] features.

    Faithful to get_spect, including the fmax-keyed-on-fmin quirk
    (src/identify_tracks.py:260-261) and per-window power_to_db(ref=max).

    `use_pallas` must be resolved BEFORE the jit boundary: with the env
    default left inside the traced function, the jit cache keyed on the
    static value None and the knob was consulted exactly once per shape —
    a warm process flipping AAT_PALLAS/AAT_FAST would silently keep the
    first trace's kernel choice on the non-fused paths."""
    if use_pallas is None:
        use_pallas = _use_pallas_default()
    return _spectrogram_grid_impl(windows, use_pallas=int(use_pallas), **kw)


@partial(
    jax.jit,
    static_argnames=(
        "sr",
        "hop_length",
        "n_fft",
        "n_mels",
        "mel_break",
        "htk",
        "fmin",
        "fmax",
        "power",
        "db_scale",
        "normalize",
        "mean_sub",
        "use_mfcc",
        "channels",
        "use_pallas",
        "windows_is_z",
        "n_samples",
    ),
)
def _spectrogram_grid_impl(
    windows: jnp.ndarray,
    *,
    sr: int,
    hop_length: int = 281,
    n_fft: int = 4096,
    n_mels: int = 160,
    mel_break: float = 1000.0,
    htk: bool = True,
    fmin: float = 50.0,
    fmax: float = 11000.0,
    power: float = 2.0,
    db_scale: bool = False,
    normalize: bool = True,
    mean_sub: bool = False,
    use_mfcc: bool = False,
    channels: int = 1,
    use_pallas: int = 0,
    windows_is_z: bool = False,
    n_samples: int = None,
) -> jnp.ndarray:
    # exact levels need the framed-DIF kernel; on shapes it cannot take,
    # they fall back to the XLA path (NOT to the bf16 kernel — an exact
    # level is an accuracy request, and XLA is the next-most-accurate)
    if use_pallas >= PALLAS_EXACT1 and not windows_is_z:
        from audio_analysis_tpu.ops.pallas.melspec import (
            MAX_FRAMES_PER_WINDOW, _use_dif,
        )

        frames = 1 + windows.shape[-1] // int(hop_length)
        if not (_use_dif(int(n_fft)) and frames <= MAX_FRAMES_PER_WINDOW):
            use_pallas = PALLAS_OFF
    exact = max(0, int(use_pallas) - 1)
    if windows_is_z:
        # the caller's gather emitted the framed-DIF kernel's z layout
        # directly, with masking AND min-max normalisation already applied
        # in-gather (fused into its scan); requires the Pallas frontend and
        # no raw-window consumers (mfcc reads plain windows)
        if not use_pallas or use_mfcc:
            raise ValueError("windows_is_z requires use_pallas and no mfcc")
    elif normalize:
        windows = normalize_minmax(windows)

    if htk:
        f_lo = 50.0 if fmin is None else fmin
        f_hi = 11000.0 if fmin is None else fmax  # quirk: keyed on fmin
        if use_pallas:
            from audio_analysis_tpu.ops.pallas.melspec import pallas_mel_spectrogram

            mel = pallas_mel_spectrogram(
                windows, sr=sr, n_fft=n_fft, hop_length=hop_length,
                n_mels=n_mels, fmin=f_lo, fmax=f_hi, break_freq=mel_break,
                power=power, htk=True,
                windows_is_z=windows_is_z, n_samples=n_samples, exact=exact,
            )
        else:
            from audio_analysis_tpu.ops.pallas.melspec import mel_support_bins

            mag = stft_magnitude(windows, n_fft, hop_length)  # [N, bins, T]
            fb = mel_filterbank(sr, n_mels, f_lo, f_hi, n_fft, mel_break)
            # bins past the filterbank's support (fmax) carry zero mel
            # weight: slicing them off is exact and shrinks both the mel
            # matmul and the materialised magnitude array (~2x at 11 kHz
            # fmax on a 24 kHz Nyquist spectrum)
            bu = mel_support_bins(sr, n_mels, f_lo, f_hi, n_fft, mel_break, True)
            mag = mag[..., :bu, :]
            fb = fb[:, :bu]
            p = mag if power == 1 else (mag * mag if power == 2 else mag**power)
            mel = jnp.einsum("mf,nft->nmt", fb, p, preferred_element_type=jnp.float32)
    else:
        # librosa.feature.melspectrogram defaults: Slaney scale/norm, power 2
        if use_pallas:
            from audio_analysis_tpu.ops.pallas.melspec import pallas_mel_spectrogram

            mel = pallas_mel_spectrogram(
                windows, sr=sr, n_fft=n_fft, hop_length=hop_length,
                n_mels=n_mels, fmin=50.0, fmax=11000.0, power=2.0, htk=False,
                windows_is_z=windows_is_z, n_samples=n_samples, exact=exact,
            )
        else:
            from audio_analysis_tpu.ops.pallas.melspec import mel_support_bins

            mag = stft_magnitude(windows, n_fft, hop_length)
            fb = mel_filterbank_slaney(sr, n_mels, 50.0, 11000.0, n_fft)
            bu = mel_support_bins(sr, n_mels, 50.0, 11000.0, n_fft, 700.0, False)
            mag = mag[..., :bu, :]
            fb = fb[:, :bu]
            mel = jnp.einsum(
                "mf,nft->nmt", fb, mag * mag, preferred_element_type=jnp.float32
            )

    if db_scale:
        mel = power_to_db(mel, ref_axes=(-2, -1))

    mel = mel[..., None]  # channel dim

    if use_mfcc:
        # Reference concatenates a resized MFCC under the mel
        # (src/identify_tracks.py:269-280). NOTE: the reference's own call
        # passes a 2-D array into tf.image.resize_with_pad and would fail at
        # runtime; no released model sets use_mfcc. We implement the evident
        # intent (MFCC resized to the mel's [n_mels, T] then stacked).
        mfcc = _mfcc(windows, sr, hop_length)
        mfcc = resize_with_pad(mfcc[..., None], mel.shape[-3], mel.shape[-2])
        mel = jnp.concatenate((mel, mfcc), axis=-3)

    if mean_sub:
        mel_m = jnp.mean(mel, axis=-2, keepdims=True)
        mel = mel - mel_m

    if channels > 1:
        mel = jnp.repeat(mel, channels, axis=-1)
    return mel


def _mfcc(windows, sr, hop_length, n_mfcc=20, n_mels=80):
    """librosa.feature.mfcc(htk=True, fmin=50, fmax=11000, n_mels=80):
    mel power spec (n_fft 2048 default) -> power_to_db(ref=1) -> ortho DCT-II
    over the mel axis, first 20 coefficients."""
    mag = stft_magnitude(windows, 2048, hop_length)
    fb = mel_filterbank(sr, n_mels, 50.0, 11000.0, 2048, 700.0)
    mel = jnp.einsum("mf,nft->nmt", fb, mag * mag, preferred_element_type=jnp.float32)
    # power_to_db with ref=1.0 (librosa mfcc default), top_db=80 per example
    log_spec = 10.0 * jnp.log10(jnp.maximum(1e-10, mel))
    peak = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    log_spec = jnp.maximum(log_spec, peak - 80.0)
    # ortho DCT-II along the mel axis
    d = dct2(jnp.swapaxes(log_spec, -1, -2))  # [..., t, n_mels]
    n = d.shape[-1]
    scale = jnp.ones(n).at[0].set(1.0 / jnp.sqrt(2.0)) * jnp.sqrt(1.0 / (2.0 * n))
    d = d * scale
    return jnp.swapaxes(d, -1, -2)[..., :n_mfcc, :]
