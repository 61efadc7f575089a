"""AAT_FAST preset semantics: one knob enables the evidence-backed
throughput path (Pallas frontend + bf16 Keras compute); the individual
knobs override it in either direction; the fused program cache keys on the
resolved kernel choice so a warm process can A/B."""

import jax.numpy as jnp

from audio_analysis_tpu.pipeline.frontend import _use_pallas_default
from audio_analysis_tpu.utils.runtime import env_flag, fast_mode


def test_env_flag_tristate(monkeypatch):
    monkeypatch.delenv("AAT_X", raising=False)
    assert env_flag("AAT_X") is None
    monkeypatch.setenv("AAT_X", "1")
    assert env_flag("AAT_X") is True
    monkeypatch.setenv("AAT_X", "off")
    assert env_flag("AAT_X") is False


def test_fast_mode_controls_pallas_default(monkeypatch):
    import audio_analysis_tpu.pipeline.frontend as fe

    # pretend a TPU backend: the Mosaic kernel only exists there
    monkeypatch.setattr(fe, "_pallas_backend", lambda: True)
    monkeypatch.delenv("AAT_PALLAS", raising=False)
    monkeypatch.delenv("AAT_FAST", raising=False)
    # no knobs: the split-bf16 exact kernel is the TPU parity default
    assert _use_pallas_default() == fe.PALLAS_EXACT2
    monkeypatch.setenv("AAT_FAST", "1")
    assert _use_pallas_default() == fe.PALLAS_FAST
    monkeypatch.setenv("AAT_PALLAS", "0")  # explicit knob beats the preset
    assert _use_pallas_default() == fe.PALLAS_OFF
    monkeypatch.delenv("AAT_FAST", raising=False)
    monkeypatch.setenv("AAT_PALLAS", "1")
    assert _use_pallas_default() == fe.PALLAS_FAST


def test_pallas_knob_degrades_on_cpu_backend(monkeypatch):
    """On the CPU test backend the preset must fall back to the XLA path
    (with a warning) instead of dying in the Mosaic lowering."""
    import audio_analysis_tpu.pipeline.frontend as fe

    monkeypatch.setenv("AAT_FAST", "1")
    monkeypatch.delenv("AAT_PALLAS", raising=False)
    monkeypatch.setattr(fe, "_WARNED_NO_PALLAS", False)
    assert _use_pallas_default() == fe.PALLAS_OFF  # conftest forces cpu

    import numpy as np

    g = jnp.asarray(np.random.RandomState(0).randn(2, 48000).astype(np.float32))
    from audio_analysis_tpu.pipeline.frontend import spectrogram_grid

    y = spectrogram_grid(
        g, sr=48000, hop_length=640, n_fft=4096, n_mels=64,
        mel_break=1750.0, htk=True, power=2.0, db_scale=True, normalize=True,
    )
    assert y.shape[0] == 2


def test_fast_mode_controls_keras_bf16(tmp_path, monkeypatch):
    import json

    import pytest

    tf = pytest.importorskip("tensorflow")
    from audio_analysis_tpu.io.modelconfig import ModelConfig
    from audio_analysis_tpu.models.registry import load_classifier

    d = tmp_path / "m"
    d.mkdir()
    tf.keras.utils.set_random_seed(0)
    inp = tf.keras.Input((8,))
    out = tf.keras.layers.Dense(3, activation="softmax")(inp)
    tf.keras.Model(inp, out).save(str(d / "audioModel.keras"))
    (d / "metadata.txt").write_text(json.dumps({"name": "t", "labels": ["a", "b", "c"]}))
    cfg = ModelConfig.load(d)

    monkeypatch.delenv("AAT_FAST", raising=False)
    monkeypatch.delenv("AAT_KERAS_BF16", raising=False)
    m32 = load_classifier(d, cfg)
    monkeypatch.setenv("AAT_FAST", "1")
    m16 = load_classifier(d, cfg)
    assert m16 is not m32  # cache keys on the resolved mode
    x = jnp.ones((2, 8), jnp.float32)
    # bf16 compute drifts from f32 but stays close for a tiny dense
    import numpy as np

    a, b = np.asarray(m32(x)), np.asarray(m16(x))
    assert not np.array_equal(a, b) or np.allclose(a, b)
    np.testing.assert_allclose(a, b, atol=5e-2)
    # explicit AAT_KERAS_BF16=0 under AAT_FAST reverts to f32 (new object,
    # same numbers as the f32 model)
    monkeypatch.setenv("AAT_KERAS_BF16", "0")
    m32b = load_classifier(d, cfg)
    np.testing.assert_array_equal(np.asarray(m32b(x)), a)
