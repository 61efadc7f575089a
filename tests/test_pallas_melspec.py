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


def test_z_layout_feed_matches_plain(rng):
    """Feeding the kernel a caller-built z layout (windows_is_z=True) must
    be exactly the plain [N, S] path: same pad placement, same bf16 cast."""
    from audio_analysis_tpu.ops.pallas import melspec as m

    sr, n_fft, hop, n_mels = 16000, 512, 160, 40
    s = 4000
    lay = m.z_layout(n_fft, hop, s)
    assert lay is not None
    rows_p, fp, k, z_len = lay
    assert z_len == rows_p * hop
    wins = rng.randn(2, s).astype(np.float32)
    z = np.zeros((2, z_len), np.float32)
    z[:, n_fft // 2 : n_fft // 2 + s] = wins
    kw = dict(
        sr=sr, n_fft=n_fft, hop_length=hop, n_mels=n_mels,
        fmin=50, fmax=7000, break_freq=1750.0, interpret=True,
    )
    plain = np.asarray(pallas_mel_spectrogram(jnp.asarray(wins), **kw))
    viaz = np.asarray(
        pallas_mel_spectrogram(
            jnp.asarray(z), windows_is_z=True, n_samples=s, **kw
        )
    )
    np.testing.assert_array_equal(plain, viaz)


def test_z_layout_rejects_bad_shapes(rng):
    from audio_analysis_tpu.ops.pallas import melspec as m

    with pytest.raises(ValueError):
        pallas_mel_spectrogram(
            jnp.zeros((1, 999)), windows_is_z=True, n_samples=4000,
            sr=16000, n_fft=512, hop_length=160, n_mels=40,
            fmin=50, fmax=7000, interpret=True,
        )
    # n_samples omitted
    with pytest.raises(ValueError):
        pallas_mel_spectrogram(
            jnp.zeros((1, 999)), windows_is_z=True,
            sr=16000, n_fft=512, hop_length=160, n_mels=40,
            fmin=50, fmax=7000, interpret=True,
        )


def test_z_gather_classify_matches_plain_pallas(tmp_path, monkeypatch):
    """The fused program's z-layout gather (masking + the reference's
    normalize_data fused into the slice scan, emitting the kernel's bf16
    input directly) must give the identical classify result to the plain
    grid -> normalize_minmax -> kernel-side pad path. Catches any drift in
    the in-scan normalisation (op order, the *2.0, the epsilon quirk)."""
    import json
    import sys
    from functools import partial
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import bench as B
    import audio_analysis_tpu.pipeline.frontend as fe
    from audio_analysis_tpu.ops.pallas import melspec as m
    from audio_analysis_tpu.pipeline.classify import classify_frames

    models = B.build_fixture_models(tmp_path)[:1]
    # raw-power features: with db_scale the per-window ref=max cancels any
    # uniform normalisation-scale drift (e.g. a missing *2.0), hiding it
    meta_p = Path(models[0]) / "metadata.txt"
    meta = json.loads(meta_p.read_text())
    meta["db_scale"] = False
    meta_p.write_text(json.dumps(meta))
    y, sr = B.make_recording(12, seed=3)

    # force the Pallas frontend on the CPU backend via interpret mode
    monkeypatch.setattr(fe, "_pallas_backend", lambda: True)
    monkeypatch.setenv("AAT_PALLAS", "1")
    monkeypatch.setattr(
        m, "pallas_mel_spectrogram",
        partial(pallas_mel_spectrogram, interpret=True),
    )
    # detection inside classify_frames also rides the Pallas mag+medians
    # kernels now
    from audio_analysis_tpu.ops.pallas import medians as md

    monkeypatch.setattr(
        m, "pallas_stft_magnitude",
        partial(m.pallas_stft_magnitude, interpret=True),
    )
    monkeypatch.setattr(
        md, "pallas_masked_medians_rowcol",
        partial(md.pallas_masked_medians_rowcol, interpret=True),
    )

    a = classify_frames(y, sr, models, False, None, rng=np.random.RandomState(0))
    assert a is not None and len(a[0]) >= 1

    # same kernel, but the plain [N, S] gather + in-frontend normalisation
    monkeypatch.setattr(m, "z_layout", lambda *args: None)
    b = classify_frames(y, sr, models, False, None, rng=np.random.RandomState(0))

    sa = json.dumps([t.get_meta() for t in a[0]]) + json.dumps(a[1:3], default=str)
    sb = json.dumps([t.get_meta() for t in b[0]]) + json.dumps(b[1:3], default=str)
    assert sa == sb
