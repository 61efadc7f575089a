"""Round-4 Keras-importer zoo extension: 1-D convs, transpose convs,
PReLU/ELU/LayerNorm/UnitNorm, Keras-3 op-layers (raw keras.ops on
KerasTensors), TFOpLambda/SlicingOpLambda (Keras-2 archives), Lambda
(marshalled bytecode, gated), Embedding.

These classes are the ones VERDICT.md (round 3) flagged as plausible in
the released Cacophony checkpoints (reference loads them via the TF
runtime, src/identify_tracks.py:302-327) but absent from the zoo. Each
test saves a real Keras model and asserts logit parity of the TF-free
importer."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import keras
from keras import layers as kl
import jax.numpy as jnp

from audio_analysis_tpu.models import KerasModel


def _roundtrip(model, tmp_path, x):
    p = str(tmp_path / "m.keras")
    model.save(p)
    ref = model.predict(x, verbose=0)
    ours = np.asarray(KerasModel.load(p)(jnp.asarray(x)))
    return np.asarray(ref), ours


def test_conv1d_family(tmp_path, rng):
    """Conv1D (same/causal/dilated), DepthwiseConv1D (depth_multiplier),
    SeparableConv1D, 1-D pooling/pad/crop/upsample, Conv1DTranspose."""
    inp = keras.Input((32, 6))
    x = kl.Conv1D(8, 3, strides=2, padding="same", activation="relu")(inp)
    x = kl.Conv1D(8, 3, padding="causal", dilation_rate=2)(x)
    x = kl.DepthwiseConv1D(3, padding="same", depth_multiplier=2)(x)
    x = kl.SeparableConv1D(10, 3, padding="valid", activation="elu")(x)
    x = kl.MaxPooling1D(2, padding="same")(x)
    x = kl.AveragePooling1D(3, strides=2, padding="valid")(x)
    x = kl.ZeroPadding1D((2, 1))(x)
    x = kl.Cropping1D((1, 2))(x)
    x = kl.UpSampling1D(2)(x)
    x = kl.Conv1DTranspose(4, 3, strides=2, padding="same")(x)
    x = kl.GlobalAveragePooling1D()(x)
    model = keras.Model(inp, kl.Dense(3)(x))
    ref, ours = _roundtrip(model, tmp_path, rng.randn(2, 32, 6).astype(np.float32))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_prelu_elu_layernorm_unitnorm_minimum(tmp_path, rng):
    inp = keras.Input((8, 8, 4))
    a = kl.Conv2D(6, 3, padding="same")(inp)
    a = kl.PReLU(shared_axes=[1, 2])(a)
    b = kl.Conv2D(6, 1)(inp)
    b = kl.ELU(alpha=0.7)(b)
    x = kl.Minimum()([a, b])
    x = kl.LayerNormalization(axis=[1, 2, 3], epsilon=1e-4)(x)
    x = kl.UnitNormalization()(x)
    x = kl.Flatten()(x)
    model = keras.Model(inp, kl.Dense(2)(x))
    ref, ours = _roundtrip(model, tmp_path, rng.randn(2, 8, 8, 4).astype(np.float32))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_prelu_unshared_full_alpha(tmp_path, rng):
    """PReLU with no shared_axes stores a full input[1:]-shaped alpha."""
    inp = keras.Input((5, 7, 3))
    x = kl.PReLU()(inp)
    model = keras.Model(inp, kl.Flatten()(x))
    # randomize alpha away from the 0 initializer so the test has teeth
    model.layers[1].alpha.assign(rng.randn(5, 7, 3).astype(np.float32))
    ref, ours = _roundtrip(model, tmp_path, rng.randn(2, 5, 7, 3).astype(np.float32))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_conv2d_transpose(tmp_path, rng):
    """TF kernel layout (h, w, out, in); SAME and VALID, non-square."""
    inp = keras.Input((7, 9, 3))
    x = kl.Conv2DTranspose(5, 3, strides=2, padding="same")(inp)
    x = kl.Conv2DTranspose(4, (3, 2), strides=(2, 1), padding="valid", activation="relu")(x)
    model = keras.Model(inp, kl.GlobalAveragePooling2D()(x))
    ref, ours = _roundtrip(model, tmp_path, rng.randn(2, 7, 9, 3).astype(np.float32))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_k3_op_layers_and_getitem(tmp_path, rng, monkeypatch):
    """Raw keras.ops / operators on KerasTensors serialize as op-layers
    from module keras.src.ops.* with call params in the CONFIG; slicing
    serializes __slice__ dicts. Class names shadow keras.layers merges
    (Multiply/Add) — dispatch must key on the module."""
    monkeypatch.setenv("AAT_UNSAFE_LAMBDA", "1")
    inp = keras.Input((16, 4))
    x = inp * 2.0 + 1.0
    x = keras.ops.relu(x)
    x = x[:, 2:12, :]
    x = keras.ops.mean(x, axis=1, keepdims=True)
    x = keras.ops.clip(x, -3.0, 3.0)
    lam = kl.Lambda(lambda t: t * 0.5 + 2.0)(x)
    x = keras.ops.concatenate([x, lam], axis=-1)
    model = keras.Model(inp, x)
    ref, ours = _roundtrip(model, tmp_path, rng.randn(3, 16, 4).astype(np.float32))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_op_layers_interleaved_with_weights(tmp_path, rng):
    """Op-layers must not desynchronise the snake_case h5 weight-key
    counters of real layers around them."""
    inp = keras.Input((6, 6, 2))
    x = kl.Conv2D(4, 3, padding="same", name="c1")(inp)
    x = x * 0.3
    x = kl.Conv2D(4, 3, padding="same", name="c2")(x)
    x = keras.ops.maximum(x, 0.0)
    x = kl.Flatten()(x)
    model = keras.Model(inp, kl.Dense(2)(x))
    ref, ours = _roundtrip(model, tmp_path, rng.randn(2, 6, 6, 2).astype(np.float32))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_lambda_requires_opt_in(tmp_path, rng, monkeypatch):
    """Marshalled-bytecode Lambdas are arbitrary code execution; mirror
    Keras's safe_mode and refuse without AAT_UNSAFE_LAMBDA=1."""
    monkeypatch.delenv("AAT_UNSAFE_LAMBDA", raising=False)
    inp = keras.Input((4,))
    x = kl.Lambda(lambda t: t + 1.0)(inp)
    model = keras.Model(inp, x)
    p = str(tmp_path / "m.keras")
    model.save(p)
    km = KerasModel.load(p)
    with pytest.raises(ValueError, match="AAT_UNSAFE_LAMBDA"):
        km(jnp.zeros((1, 4)))


def test_embedding(tmp_path, rng):
    inp = keras.Input((10,), dtype="int32")
    x = kl.Embedding(20, 8)(inp)
    x = kl.GlobalAveragePooling1D()(x)
    model = keras.Model(inp, kl.Dense(3)(x))
    data = rng.randint(0, 20, (4, 10)).astype(np.int32)
    ref, ours = _roundtrip(model, tmp_path, data)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_tfoplambda_keras2_archive(tmp_path, rng):
    """tf_keras (Keras 2) functional models using raw TF ops serialize
    TFOpLambda/SlicingOpLambda layers with FLAT legacy nodes and tensor
    refs hidden inside node kwargs (the `y` operand of
    __operators__.add) — the exact shape of tf.keras applications like
    MobileNetV3's hard-swish blocks."""
    import tf_keras as tk

    inp = tk.Input((16, 8))
    x = tk.layers.Conv1D(6, 3, padding="same")(inp)
    x = x * 2.0
    x = tf.nn.relu6(x)
    x = x + tf.math.reduce_mean(x, axis=1, keepdims=True)
    y = x[:, 2:10, :]
    y = tf.clip_by_value(y, -2.0, 5.0)
    y = tf.math.reduce_max(y, axis=1)
    model = tk.Model(inp, y)
    p = str(tmp_path / "m.keras")
    model.save(p, save_format="keras")
    data = rng.randn(3, 16, 8).astype(np.float32)
    ref = model.predict(data, verbose=0)
    ours = np.asarray(KerasModel.load(p)(jnp.asarray(data)))
    np.testing.assert_allclose(ours, np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_unsupported_layer_message_lists_tf_ops(tmp_path):
    """An unknown TFOpLambda function must fail loudly, naming the op."""
    from audio_analysis_tpu.models.keras_graph import _tf_op

    with pytest.raises(ValueError, match="unsupported TFOpLambda function"):
        _tf_op("linalg.matmul", "t")
