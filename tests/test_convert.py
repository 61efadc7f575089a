"""SavedModel conversion: TF SavedModel -> .keras -> TF-free import with
logit parity, conversion caching, the host-TF fallback for non-Keras graphs,
and direct SavedModel ingestion by the morepork pipeline (the reference's
input format, src/identify_morepork.py:30-39, 169-176)."""

import json
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")
tf_keras = pytest.importorskip("tf_keras")

from audio_analysis_tpu.io.convert import (
    ConversionError,
    HostSavedModel,
    auto_convert_saved_model,
    convert_saved_model,
)
from audio_analysis_tpu.models.keras_graph import KerasModel


def _saved_model(d, seed=0, sigmoid=True):
    """A legacy Keras SavedModel like a morepork ensemble member."""
    tf_keras.utils.set_random_seed(seed)
    inp = tf_keras.Input((60, 60, 1))
    x = tf_keras.layers.Conv2D(4, 3, padding="same", activation="relu")(inp)
    x = tf_keras.layers.MaxPooling2D(4)(x)
    x = tf_keras.layers.Flatten()(x)
    out = tf_keras.layers.Dense(1, activation="sigmoid" if sigmoid else None)(x)
    m = tf_keras.Model(inp, out)
    m.save(str(d), save_format="tf")
    return m


def test_convert_saved_model_logit_parity(tmp_path):
    m = _saved_model(tmp_path / "sm", seed=1)
    out = convert_saved_model(tmp_path / "sm", tmp_path / "native")
    km = KerasModel.load(out / "audioModel.keras")
    x = np.random.default_rng(1).standard_normal((4, 60, 60, 1)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(km(x)), np.asarray(m(x)), atol=1e-5)
    meta = json.loads((out / "metadata.txt").read_text())
    assert meta["labels"] == ["morepork"]


def test_auto_convert_caches(tmp_path):
    _saved_model(tmp_path / "sm", seed=2)
    out1 = auto_convert_saved_model(tmp_path / "sm")
    stamp = (out1 / ".stamp").read_text()
    mtime1 = (out1 / "audioModel.keras").stat().st_mtime_ns
    out2 = auto_convert_saved_model(tmp_path / "sm")
    assert out1 == out2
    assert (out2 / "audioModel.keras").stat().st_mtime_ns == mtime1  # no re-convert
    assert (out2 / ".stamp").read_text() == stamp


def test_convert_rejects_non_keras_export(tmp_path):
    """A plain tf.saved_model export (no Keras metadata) cannot be converted
    to a layer graph; it must raise ConversionError (and then run through
    HostSavedModel instead)."""

    class Doubler(tf.Module):
        @tf.function(input_signature=[tf.TensorSpec([None, 3], tf.float32)])
        def __call__(self, x):
            return {"out": 2.0 * x + 1.0}

    tf.saved_model.save(Doubler(), str(tmp_path / "sm"))
    with pytest.raises(ConversionError):
        convert_saved_model(tmp_path / "sm", tmp_path / "native")
    host = HostSavedModel(tmp_path / "sm")
    x = np.ones((2, 3), np.float32)
    np.testing.assert_allclose(host(x), 2.0 * x + 1.0)


def test_morepork_ingests_saved_model_dirs(tmp_path, rng):
    """identify_morepork_frames handed SavedModel member dirs (the
    reference's artifact layout) must produce the same labels as the same
    members pre-converted to .keras."""
    from audio_analysis_tpu.pipeline import morepork as mp

    sr = 48000
    y = (0.01 * rng.randn(8 * sr)).astype(np.float32)
    t = np.arange(len(y)) / sr
    m = (t >= 2.0) & (t < 3.0)
    y[m] += (0.5 * np.sin(2 * np.pi * 800 * t[m])).astype(np.float32)

    ensemble = tmp_path / "ensemble"
    converted = tmp_path / "converted"
    for i in range(2):
        _saved_model(ensemble / f"member{i}", seed=10 + i)
        convert_saved_model(ensemble / f"member{i}", converted / f"member{i}")

    got = mp.identify_morepork_frames(y, sr, str(ensemble))
    want = mp.identify_morepork_frames(
        y, sr, [str(converted / f"member{i}") for i in range(2)]
    )
    assert got == want
    # conversions were cached inside the member dirs
    assert (ensemble / "member0" / ".aat_native" / "audioModel.keras").exists()
