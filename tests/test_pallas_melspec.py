"""Pallas fused DFT->mel kernel parity vs the XLA rFFT path (interpret mode
on CPU; the real-TPU path is exercised by bench/verify drives)."""

import numpy as np
import pytest

import jax.numpy as jnp

from audio_analysis_tpu.ops.pallas.melspec import pallas_mel_spectrogram
from audio_analysis_tpu.ops.stft import stft_magnitude
from audio_analysis_tpu.ops.mel import mel_spec


@pytest.mark.parametrize("power", [1.0, 2.0])
def test_pallas_matches_fft_path(rng, power):
    sr, n_fft, hop, n_mels = 16000, 512, 160, 40
    wins = rng.randn(2, 4000).astype(np.float32)
    ref = np.asarray(
        mel_spec(
            stft_magnitude(jnp.asarray(wins), n_fft, hop),
            sr, n_fft, n_mels, 50, 7000, 1750.0, power=power,
        )
    )
    got = np.asarray(
        pallas_mel_spectrogram(
            jnp.asarray(wins),
            sr=sr, n_fft=n_fft, hop_length=hop, n_mels=n_mels,
            fmin=50, fmax=7000, break_freq=1750.0, power=power,
            interpret=True,
        )
    )
    assert got.shape == ref.shape
    # the kernel's contract is explicit-bf16 MXU matmuls (f32 accumulate):
    # interpret mode now performs the same casts, so the bound is the
    # documented bf16 budget (~2% relative / ~0.3% of scale; measured)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=5e-3 * scale)


def test_pallas_slaney_scale(rng):
    sr, n_fft, hop, n_mels = 16000, 512, 256, 32
    wins = rng.randn(1, 2048).astype(np.float32)
    from audio_analysis_tpu.ops.mel import mel_filterbank_slaney

    mag = np.asarray(stft_magnitude(jnp.asarray(wins), n_fft, hop))
    fb = np.asarray(mel_filterbank_slaney(sr, n_mels, 50, 7000, n_fft))
    ref = np.einsum("mf,nft->nmt", fb, mag**2)
    got = np.asarray(
        pallas_mel_spectrogram(
            jnp.asarray(wins),
            sr=sr, n_fft=n_fft, hop_length=hop, n_mels=n_mels,
            fmin=50, fmax=7000, htk=False, interpret=True,
        )
    )
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=5e-3 * scale)


def test_dif_matches_matmul_alg(rng, monkeypatch):
    """The DIF-factored kernel and the direct-DFT kernel are two evaluations
    of the same bf16-matmul contract; they must agree to well within the
    oracle tolerance of either (both see identical bf16-rounded frames)."""
    from audio_analysis_tpu.ops.pallas import melspec as m

    sr, n_fft, hop, n_mels = 16000, 512, 160, 40
    wins = rng.randn(2, 4000).astype(np.float32)
    kw = dict(
        sr=sr, n_fft=n_fft, hop_length=hop, n_mels=n_mels,
        fmin=50, fmax=7000, break_freq=1750.0, interpret=True,
    )
    assert m._use_dif(n_fft)
    dif = np.asarray(pallas_mel_spectrogram(jnp.asarray(wins), **kw))
    monkeypatch.setenv("AAT_PALLAS_ALG", "matmul")
    assert not m._use_dif(n_fft)
    direct = np.asarray(pallas_mel_spectrogram(jnp.asarray(wins), **kw))
    scale = np.abs(direct).max()
    np.testing.assert_allclose(dif, direct, rtol=2e-2, atol=2e-3 * scale)


def test_non_multiple_of_8_nfft_falls_back(rng):
    """n_fft not divisible by 8 cannot take the DIF tree; the dispatcher
    must quietly use the direct kernel and still match the FFT oracle."""
    from audio_analysis_tpu.ops.pallas import melspec as m

    sr, n_fft, hop, n_mels = 16000, 500, 125, 32
    assert not m._use_dif(n_fft)
    wins = rng.randn(1, 2000).astype(np.float32)
    ref = np.asarray(
        mel_spec(
            stft_magnitude(jnp.asarray(wins), n_fft, hop),
            sr, n_fft, n_mels, 50, 7000, 1750.0,
        )
    )
    got = np.asarray(
        pallas_mel_spectrogram(
            jnp.asarray(wins),
            sr=sr, n_fft=n_fft, hop_length=hop, n_mels=n_mels,
            fmin=50, fmax=7000, break_freq=1750.0, interpret=True,
        )
    )
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=5e-3 * scale)


def test_long_window_falls_back_to_direct(rng):
    """Windows longer than MAX_FRAMES_PER_WINDOW frames cannot hold a full
    frame matrix in VMEM; the dispatcher must take the direct kernel (which
    blocks pre-materialised frames freely) and still match the FFT oracle."""
    from audio_analysis_tpu.ops.pallas import melspec as m

    sr, n_fft, hop, n_mels = 16000, 512, 32, 32
    s = 32 * (m.MAX_FRAMES_PER_WINDOW + 5)  # f = s//hop + 1 > cap
    assert m._use_dif(n_fft)  # DIF-eligible n_fft, but the length gates it
    wins = rng.randn(1, s).astype(np.float32)
    ref = np.asarray(
        mel_spec(
            stft_magnitude(jnp.asarray(wins), n_fft, hop),
            sr, n_fft, n_mels, 50, 7000, 1750.0,
        )
    )
    got = np.asarray(
        pallas_mel_spectrogram(
            jnp.asarray(wins),
            sr=sr, n_fft=n_fft, hop_length=hop, n_mels=n_mels,
            fmin=50, fmax=7000, break_freq=1750.0, interpret=True,
        )
    )
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=5e-3 * scale)
