"""Golden tests for the DSP core against scipy/numpy oracles.

The reference repo has no tests (SURVEY.md §4); these pin our kernels to the
reference's *dependencies'* semantics (librosa STFT conventions, scipy DCT and
Butterworth, numpy windows) on fixed fixtures.
"""

import numpy as np
import pytest
import scipy.signal
import scipy.fftpack

import jax.numpy as jnp

from audio_analysis_tpu.ops import (
    get_window,
    stft,
    stft_magnitude,
    mel_filterbank,
    fft_frequencies,
    power_to_db,
    amplitude_to_db,
    normalize_minmax,
    dct2,
    resample_poly,
    butter_bandpass_sos,
    sosfilt,
)
from audio_analysis_tpu.ops.mel import hz_to_mel, mel_frequencies, mel_spec


# ---------------------------------------------------------------------------
# windows
# ---------------------------------------------------------------------------


def test_hann_periodic_matches_scipy():
    for n in (64, 281, 2048, 4096):
        ours = np.asarray(get_window("hann", n, periodic=True))
        ref = scipy.signal.get_window("hann", n, fftbins=True)
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_symmetric_windows_match_numpy():
    n = 2048
    np.testing.assert_allclose(
        np.asarray(get_window("hanning", n, periodic=False)), np.hanning(n), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(get_window("hamming", n, periodic=False)), np.hamming(n), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(get_window("blackman", n, periodic=False)), np.blackman(n), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(get_window("bartlett", n, periodic=False)), np.bartlett(n), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(get_window("kaiser", n, periodic=False)),
        np.kaiser(n, 14),
        atol=1e-6,
    )


# ---------------------------------------------------------------------------
# STFT (librosa conventions: center=True, constant padding, periodic hann)
# ---------------------------------------------------------------------------


def _ref_stft(y, n_fft, hop):
    """Independent numpy oracle for librosa.stft's documented algorithm."""
    w = scipy.signal.get_window("hann", n_fft, fftbins=True)
    ypad = np.pad(y, n_fft // 2)
    n_frames = 1 + (len(ypad) - n_fft) // hop
    frames = np.stack([ypad[i * hop : i * hop + n_fft] for i in range(n_frames)])
    return np.fft.rfft(frames * w, axis=-1).T  # [bins, frames]


@pytest.mark.parametrize("n_fft,hop", [(4096, 281), (1600, 800), (2048, 640)])
def test_stft_matches_reference_conventions(rng, n_fft, hop):
    y = rng.randn(48000).astype(np.float32)
    ours = np.asarray(stft(jnp.asarray(y), n_fft, hop))
    ref = _ref_stft(y, n_fft, hop)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.abs(ours), np.abs(ref), rtol=1e-4, atol=2e-3)


def test_stft_frame_count():
    y = jnp.zeros(48000 * 3)
    s = stft(y, 4096, 281)
    assert s.shape == (2049, 1 + 48000 * 3 // 281)


def test_stft_magnitude_power(rng):
    y = rng.randn(8000).astype(np.float32)
    m1 = np.asarray(stft_magnitude(jnp.asarray(y), 1024, 256, power=1.0))
    m2 = np.asarray(stft_magnitude(jnp.asarray(y), 1024, 256, power=2.0))
    np.testing.assert_allclose(m1 * m1, m2, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# mel filterbank (reference custommel math, oracle transcribed in numpy)
# ---------------------------------------------------------------------------


def _ref_mel_f(sr, n_mels, fmin, fmax, n_fft, break_freq):
    """Oracle for the reference's mel_f (src/custommel.py:19-56)."""

    def h2m(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=float) / break_freq)

    def m2h(m):
        return break_freq * (10.0 ** (np.asarray(m, dtype=float) / 2595.0) - 1.0)

    weights = np.zeros((n_mels, 1 + n_fft // 2), dtype=np.float32)
    fftfreqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    mel_pts = m2h(np.linspace(h2m(fmin), h2m(fmax), n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = np.subtract.outer(mel_pts, fftfreqs)
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, np.newaxis]
    return weights


@pytest.mark.parametrize(
    "sr,n_mels,fmin,fmax,n_fft,break_freq",
    [
        (48000, 160, 50, 11000, 4096, 1750),
        (48000, 120, 50, 11000, 4800, 1750),
        (48000, 160, 50, 11000, 4096, 700),
        (32000, 80, 20, 15000, 2048, 1000),
    ],
)
def test_mel_filterbank_matches_reference(sr, n_mels, fmin, fmax, n_fft, break_freq):
    ours = np.asarray(mel_filterbank(sr, n_mels, fmin, fmax, n_fft, break_freq))
    ref = _ref_mel_f(sr, n_mels, fmin, fmax, n_fft, break_freq)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


def test_mel_spec_matmul(rng):
    mag = np.abs(rng.randn(2049, 100)).astype(np.float32)
    ours = np.asarray(mel_spec(jnp.asarray(mag), 48000, 4096, 160, 50, 11000, 1750, power=2))
    fb = _ref_mel_f(48000, 160, 50, 11000, 4096, 1750)
    ref = fb.dot(mag**2)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_hz_to_mel_break_values():
    # reference merging scale uses break 700 (src/identify_tracks.py:717-718)
    np.testing.assert_allclose(hz_to_mel(700.0, 700.0), 2595.0 * np.log10(2.0))
    np.testing.assert_allclose(hz_to_mel(1750.0, 1750.0), 2595.0 * np.log10(2.0))


# ---------------------------------------------------------------------------
# dB scaling / normalisation
# ---------------------------------------------------------------------------


def _ref_power_to_db(S, amin=1e-10, top_db=80.0):
    ref_value = np.max(S)
    log_spec = 10.0 * np.log10(np.maximum(amin, S))
    log_spec -= 10.0 * np.log10(np.maximum(amin, ref_value))
    return np.maximum(log_spec, log_spec.max() - top_db)


def test_power_to_db(rng):
    S = np.abs(rng.randn(160, 513)).astype(np.float32) ** 2
    np.testing.assert_allclose(
        np.asarray(power_to_db(jnp.asarray(S))), _ref_power_to_db(S), rtol=1e-4, atol=1e-4
    )


def test_power_to_db_batched_axes(rng):
    S = np.abs(rng.randn(4, 160, 64)).astype(np.float32) ** 2
    got = np.asarray(power_to_db(jnp.asarray(S), ref_axes=(-2, -1)))
    for i in range(4):
        np.testing.assert_allclose(got[i], _ref_power_to_db(S[i]), rtol=1e-4, atol=1e-4)


def test_amplitude_to_db(rng):
    S = np.abs(rng.randn(60, 60)).astype(np.float32)
    amin = 1e-5
    ref = _ref_power_to_db(S**2, amin=amin**2)
    np.testing.assert_allclose(
        np.asarray(amplitude_to_db(jnp.asarray(S))), ref, rtol=1e-4, atol=1e-4
    )


def test_normalize_minmax_matches_reference(rng):
    x = rng.randn(5, 1000).astype(np.float32)
    # reference normalize_data (src/identify_tracks.py:202-209)
    min_v = np.min(x, -1, keepdims=True)
    r = x - min_v
    max_v = np.max(r, -1, keepdims=True)
    r = r / max_v + 0.000001
    r = (r - 0.5) * 2
    np.testing.assert_allclose(np.asarray(normalize_minmax(jnp.asarray(x))), r, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# DCT-II (legacy cacophony index)
# ---------------------------------------------------------------------------


def test_dct2_matches_scipy(rng):
    x = rng.randn(2048).astype(np.float64)
    ours = np.asarray(dct2(jnp.asarray(x, dtype=jnp.float32)))
    ref = scipy.fftpack.dct(x)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-2)


def test_dct2_batched(rng):
    x = rng.randn(7, 512).astype(np.float32)
    ours = np.asarray(dct2(jnp.asarray(x)))
    ref = scipy.fftpack.dct(x.astype(np.float64), axis=-1)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=1e-2)


# ---------------------------------------------------------------------------
# Butterworth band-pass (design + parallel-prefix sosfilt)
# ---------------------------------------------------------------------------


def _ref_butter_sos(lowcut, highcut, fs, order=2):
    nyq = 0.5 * fs
    if lowcut > 0:
        return scipy.signal.butter(
            order, [lowcut / nyq, highcut / nyq], btype="bandpass", output="sos"
        )
    return scipy.signal.butter(order, highcut / nyq, btype="lowpass", output="sos")


@pytest.mark.parametrize("low,high", [(1000, 8000), (50, 11000), (0, 5000), (600, 1200)])
def test_butter_filter_matches_scipy(rng, low, high):
    fs = 48000
    x = rng.randn(4096).astype(np.float64)
    ref = scipy.signal.sosfilt(_ref_butter_sos(low, high, fs), x)
    sos = butter_bandpass_sos(low, high, fs)
    got = np.asarray(sosfilt(sos, jnp.asarray(x, dtype=jnp.float32)))
    # float32 on device vs float64 scipy: near-unit-circle poles (wide bands)
    # legitimately lose ~3 digits; 0.5%-of-scale is well inside audio parity.
    tol = 5e-3 * max(1.0, np.abs(ref).max())
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=tol)


def test_sosfilt_batched(rng):
    fs = 48000
    x = rng.randn(3, 2048).astype(np.float64)
    sos = butter_bandpass_sos(1000, 8000, fs)
    got = np.asarray(sosfilt(sos, jnp.asarray(x, dtype=jnp.float32)))
    ref = scipy.signal.sosfilt(_ref_butter_sos(1000, 8000, fs), x, axis=-1)
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-4)


# ---------------------------------------------------------------------------
# resampling
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sr_in,sr_out", [(44100, 48000), (32000, 48000), (48000, 16000), (16000, 48000)])
def test_resample_matches_scipy_resample_poly(rng, sr_in, sr_out):
    import math

    x = rng.randn(sr_in).astype(np.float64)
    g = math.gcd(sr_in, sr_out)
    up, down = sr_out // g, sr_in // g
    ref = scipy.signal.resample_poly(x, up, down)
    # quality="fast" reproduces scipy's default filter design; the default
    # ("hq", soxr-class) is pinned by tests/test_resample_quality.py instead
    got = np.asarray(
        resample_poly(jnp.asarray(x, dtype=jnp.float32), up, down, quality="fast")
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-3)
