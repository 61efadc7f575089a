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
