"""Split-bf16 exact mode of the Pallas DFT->mel kernel (interpret mode on
CPU — interpret performs the same bf16 casts as the chip, so the measured
representation error of each split level holds here too; the on-chip
numbers are in docs/PERFORMANCE.md "Split-bf16 exact mode")."""

import numpy as np
import pytest

import jax.numpy as jnp

from audio_analysis_tpu.ops.pallas.melspec import (
    _fb_np,
    pallas_mel_spectrogram,
)
from audio_analysis_tpu.ops.windows import get_window_np

SR, NFFT, HOP, NMELS, FMIN, FMAX, BREAK = 16000, 512, 160, 40, 50, 7000, 1750.0


def _f64_oracle(wins, power=2.0):
    """Centre-padded STFT -> |.|^power -> mel matmul, all float64 on host."""
    win = get_window_np("hann", NFFT, periodic=True).astype(np.float64)
    fb = _fb_np(SR, NMELS, FMIN, FMAX, NFFT, BREAK, True).astype(np.float64)
    out = []
    for row in wins:
        x = np.pad(row.astype(np.float64), (NFFT // 2, NFFT // 2))
        nf = 1 + (len(x) - NFFT) // HOP
        frames = np.stack([x[i * HOP : i * HOP + NFFT] for i in range(nf)])
        spec = np.fft.rfft(frames * win, axis=-1)
        out.append(fb @ (np.abs(spec.T) ** power))
    return np.stack(out)


def _max_rel(got, gt):
    den = np.maximum(np.abs(gt), 1e-3 * np.abs(gt).max())
    return (np.abs(got[..., : gt.shape[-1]] - gt) / den).max()


@pytest.mark.parametrize("power", [1.0, 2.0])
def test_exact_levels_accuracy_ladder(rng, power):
    """Each split level must land in its documented error band, and the
    ladder must be strictly ordered: exact2 < exact1 < fast. power=1 also
    exercises the kernel's in-VMEM sqrt epilogue at exact levels."""
    wins = rng.randn(2, 4000).astype(np.float32)
    gt = _f64_oracle(wins, power)
    kw = dict(
        sr=SR, n_fft=NFFT, hop_length=HOP, n_mels=NMELS,
        fmin=FMIN, fmax=FMAX, break_freq=BREAK, power=power, interpret=True,
    )
    errs = {
        lvl: _max_rel(
            np.asarray(pallas_mel_spectrogram(jnp.asarray(wins), exact=lvl, **kw)),
            gt,
        )
        for lvl in (0, 1, 2)
    }
    assert errs[2] < 1e-5  # f32-grade (chip: 1.5e-6)
    assert errs[1] < 2e-4  # (chip: 4.8e-5)
    assert errs[2] < errs[1] < errs[0]


def test_exact_z_feed_matches_plain():
    """windows_is_z with an f32 z layout must equal the plain exact path
    bit-for-bit (same casts, same kernel)."""
    from audio_analysis_tpu.ops.pallas import melspec as m

    s = 4000
    lay = m.z_layout(NFFT, HOP, s)
    assert lay is not None
    z_len = lay[3]
    rng = np.random.RandomState(7)
    wins = rng.randn(2, s).astype(np.float32)
    z = np.zeros((2, z_len), np.float32)
    z[:, NFFT // 2 : NFFT // 2 + s] = wins
    kw = dict(
        sr=SR, n_fft=NFFT, hop_length=HOP, n_mels=NMELS,
        fmin=FMIN, fmax=FMAX, break_freq=BREAK, interpret=True, exact=2,
    )
    plain = np.asarray(pallas_mel_spectrogram(jnp.asarray(wins), **kw))
    viaz = np.asarray(
        pallas_mel_spectrogram(jnp.asarray(z), windows_is_z=True, n_samples=s, **kw)
    )
    np.testing.assert_array_equal(plain, viaz)


def test_exact_requires_dif_path():
    """exact on a non-DIF shape raises at the kernel level (the frontend
    falls back to XLA before ever reaching it — tested below)."""
    with pytest.raises(ValueError, match="framed-DIF"):
        pallas_mel_spectrogram(
            jnp.zeros((1, 2000)), sr=SR, n_fft=500, hop_length=125, n_mels=32,
            fmin=FMIN, fmax=FMAX, break_freq=BREAK, interpret=True, exact=2,
        )


def test_frontend_exact_falls_back_to_xla(rng):
    """spectrogram_grid with an exact level on a non-DIF n_fft must produce
    the XLA path's output exactly (fallback to accuracy, not to bf16)."""
    from audio_analysis_tpu.pipeline.frontend import spectrogram_grid

    wins = rng.randn(1, 2000).astype(np.float32)
    kw = dict(
        sr=SR, hop_length=125, n_fft=500, n_mels=32, mel_break=BREAK,
        htk=True, fmin=FMIN, fmax=FMAX, normalize=False,
    )
    a = np.asarray(spectrogram_grid(jnp.asarray(wins), use_pallas=3, **kw))
    b = np.asarray(spectrogram_grid(jnp.asarray(wins), use_pallas=0, **kw))
    np.testing.assert_array_equal(a, b)


def test_level_resolution(monkeypatch):
    """AAT_PALLAS / AAT_FAST -> level mapping, incl. the TPU-only default."""
    import audio_analysis_tpu.pipeline.frontend as fe

    for var in ("AAT_PALLAS", "AAT_FAST"):
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setattr(fe, "_pallas_backend", lambda: True)
    assert fe._use_pallas_default() == fe.PALLAS_EXACT2  # parity default
    monkeypatch.setenv("AAT_FAST", "1")
    assert fe._use_pallas_default() == fe.PALLAS_FAST
    monkeypatch.setenv("AAT_PALLAS", "0")  # explicit off beats the preset
    assert fe._use_pallas_default() == fe.PALLAS_OFF
    monkeypatch.setenv("AAT_PALLAS", "exact")
    assert fe._use_pallas_default() == fe.PALLAS_EXACT2
    monkeypatch.setenv("AAT_PALLAS", "exact1")
    assert fe._use_pallas_default() == fe.PALLAS_EXACT1
    monkeypatch.setenv("AAT_PALLAS", "1")
    assert fe._use_pallas_default() == fe.PALLAS_FAST
    # near-miss strings must NOT silently disable the kernels below the
    # unset default — warn once, keep the default level.  Under AAT_FAST
    # the default level is the bf16 throughput kernel (a typo'd AAT_PALLAS
    # must not silently drop fast mode to parity speed).
    monkeypatch.setenv("AAT_PALLAS", "exact3")
    monkeypatch.setattr(fe, "_WARNED_BAD_LEVEL", False)
    assert fe._use_pallas_default() == fe.PALLAS_FAST  # AAT_FAST=1 still set
    assert fe._WARNED_BAD_LEVEL
    monkeypatch.delenv("AAT_FAST")
    assert fe._use_pallas_default() == fe.PALLAS_EXACT2  # parity near-miss
    monkeypatch.setenv("AAT_PALLAS", "exact-2")
    assert fe._use_pallas_default() == fe.PALLAS_EXACT2
    # non-TPU backend: everything degrades to the XLA path
    monkeypatch.setattr(fe, "_pallas_backend", lambda: False)
    assert fe._use_pallas_default() == fe.PALLAS_OFF
    monkeypatch.delenv("AAT_PALLAS")
    assert fe._use_pallas_default() == fe.PALLAS_OFF


def test_z_gather_classify_exact_matches_plain(tmp_path, monkeypatch):
    """Same z-gather-vs-plain-grid identity as the bf16 test in
    test_pallas_melspec.py, but at an exact level: the fused program's
    gather must emit the z layout in float32 (classify's z_dt branch) and
    produce the identical classify result to the plain-grid exact path."""
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
    meta_p = Path(models[0]) / "metadata.txt"
    meta = json.loads(meta_p.read_text())
    meta["db_scale"] = False  # raw power: scale drift would be visible
    meta_p.write_text(json.dumps(meta))
    y, sr = B.make_recording(12, seed=3)

    monkeypatch.setattr(fe, "_pallas_backend", lambda: True)
    monkeypatch.setenv("AAT_PALLAS", "exact")
    monkeypatch.setattr(
        m, "pallas_mel_spectrogram",
        partial(m.pallas_mel_spectrogram.__wrapped__, interpret=True)
        if hasattr(m.pallas_mel_spectrogram, "__wrapped__")
        else partial(m.pallas_mel_spectrogram, interpret=True),
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

    monkeypatch.setattr(m, "z_layout", lambda *args: None)  # plain-grid path
    b = classify_frames(y, sr, models, False, None, rng=np.random.RandomState(0))

    sa = json.dumps([t.get_meta() for t in a[0]]) + json.dumps(a[1:3], default=str)
    sb = json.dumps([t.get_meta() for t in b[0]]) + json.dumps(b[1:3], default=str)
    assert sa == sb


@pytest.mark.slow
def test_verify_frontend_precision_tool_offline():
    """The precision-verification tool must run end-to-end in interpret
    mode (its TPU mode is the chip evidence behind docs/PERFORMANCE.md)."""
    import json as _json
    import subprocess
    import sys as _sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    out = subprocess.run(
        [_sys.executable, str(repo / "tools" / "verify_frontend_precision.py"),
         "--interpret", "--json", "--windows", "2"],
        capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rep = _json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["pallas_exact2"]["max_rel"] < 1e-5
    assert rep["pallas_fast"]["max_rel"] < 0.1
