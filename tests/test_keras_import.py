"""Model-parity tests (SURVEY.md §4.4): build Keras models with TF, save as
.keras, import with our TF-free executor, compare logits on random input."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp

from audio_analysis_tpu.models import KerasModel


@pytest.fixture(scope="module")
def magtransform_cls():
    @tf.keras.utils.register_keras_serializable(package="MyLayers", name="MagTransform")
    class MagTransform(tf.keras.layers.Layer):
        def __init__(self, **kwargs):
            super().__init__(**kwargs)
            self.a = self.add_weight(
                initializer=tf.keras.initializers.Constant(value=-1.0),
                name="a-power",
                dtype="float32",
                shape=[1],
                trainable=True,
            )

        def call(self, inputs):
            return tf.math.pow(inputs, tf.math.sigmoid(self.a))

    return MagTransform


def _roundtrip(model, tmp_path, x):
    p = str(tmp_path / "m.keras")
    model.save(p)
    ref = model.predict(x, verbose=0)
    ours = np.asarray(KerasModel.load(p)(jnp.asarray(x)))
    return ref, ours


def test_cacophony_style_cnn(tmp_path, rng, magtransform_cls):
    """MagTransform frontend + conv/bn/pool stack + dense softmax —
    the shape of the released Cacophony classifiers."""
    inp = tf.keras.Input((48, 32, 1))
    x = magtransform_cls()(inp)
    x = tf.keras.layers.Conv2D(8, 3, strides=2, padding="same", activation="relu")(x)
    x = tf.keras.layers.BatchNormalization()(x)
    x = tf.keras.layers.Conv2D(16, 3, padding="valid")(x)
    x = tf.keras.layers.ReLU(max_value=6.0)(x)
    x = tf.keras.layers.MaxPooling2D()(x)
    x = tf.keras.layers.GlobalAveragePooling2D()(x)
    x = tf.keras.layers.Dropout(0.2)(x)
    out = tf.keras.layers.Dense(5, activation="softmax")(x)
    model = tf.keras.Model(inp, out)

    data = np.abs(rng.randn(4, 48, 32, 1)).astype(np.float32)
    ref, ours = _roundtrip(model, tmp_path, data)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_efficientnet_style_block(tmp_path, rng):
    """MBConv-style block: depthwise conv, SE squeeze (multiply), residual
    add, swish — the EfficientNet layer vocabulary."""
    inp = tf.keras.Input((16, 16, 8))
    x = tf.keras.layers.Rescaling(scale=2.0, offset=0.1)(inp)
    x = tf.keras.layers.ZeroPadding2D(((0, 1), (0, 1)))(x)
    x = tf.keras.layers.DepthwiseConv2D(3, strides=2, padding="valid", use_bias=False)(x)
    x = tf.keras.layers.BatchNormalization()(x)
    x = tf.keras.layers.Activation("swish")(x)
    se = tf.keras.layers.GlobalAveragePooling2D(keepdims=True)(x)
    se = tf.keras.layers.Conv2D(2, 1, activation="swish")(se)
    se = tf.keras.layers.Conv2D(8, 1, activation="sigmoid")(se)
    x = tf.keras.layers.Multiply()([x, se])
    y = tf.keras.layers.Conv2D(8, 1, use_bias=False)(x)
    y = tf.keras.layers.BatchNormalization()(y)
    z = tf.keras.layers.AveragePooling2D(pool_size=2, strides=2, padding="same")(inp)
    out = tf.keras.layers.Add()([y, z])
    out = tf.keras.layers.Flatten()(out)
    out = tf.keras.layers.Dense(3)(out)
    model = tf.keras.Model(inp, out)

    data = rng.randn(2, 16, 16, 8).astype(np.float32)
    ref, ours = _roundtrip(model, tmp_path, data)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_separable_conv_and_concat(tmp_path, rng):
    inp = tf.keras.Input((12, 12, 4))
    a = tf.keras.layers.SeparableConv2D(6, 3, padding="same", activation="relu")(inp)
    b = tf.keras.layers.Conv2D(6, 1)(inp)
    x = tf.keras.layers.Concatenate()([a, b])
    x = tf.keras.layers.GlobalMaxPooling2D()(x)
    out = tf.keras.layers.Dense(2, activation="sigmoid")(x)
    model = tf.keras.Model(inp, out)
    data = rng.randn(3, 12, 12, 4).astype(np.float32)
    ref, ours = _roundtrip(model, tmp_path, data)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_sequential_model(tmp_path, rng):
    model = tf.keras.Sequential(
        [
            tf.keras.Input((10,)),
            tf.keras.layers.Dense(16, activation="relu"),
            tf.keras.layers.Dense(4, activation="softmax"),
        ]
    )
    data = rng.randn(5, 10).astype(np.float32)
    ref, ours = _roundtrip(model, tmp_path, data)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_explicit_layer_names_and_nesting(tmp_path, rng):
    """h5 weight keys are regenerated from class names at save time —
    explicit layer names must not break the importer; nested functional
    submodels resolve through <key>/layers/..."""
    sub_in = tf.keras.Input((8, 8, 2))
    s = tf.keras.layers.Conv2D(4, 1, name="inner_conv")(sub_in)
    sub = tf.keras.Model(sub_in, s, name="subnet")
    inp = tf.keras.Input((8, 8, 2))
    o = sub(inp)
    o = tf.keras.layers.Conv2D(2, 1, name="outer_conv")(o)
    o = tf.keras.layers.Flatten()(o)
    model = tf.keras.Model(inp, tf.keras.layers.Dense(3, name="classifier")(o))
    data = rng.randn(2, 8, 8, 2).astype(np.float32)
    ref, ours = _roundtrip(model, tmp_path, data)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_full_efficientnetb0(tmp_path, rng):
    """Whole keras.applications EfficientNetB0 graph (random weights):
    the reference's released classifiers include EfficientNet variants
    (src/identify_tracks.py:539)."""
    model = tf.keras.applications.EfficientNetB0(
        weights=None, input_shape=(64, 64, 3), classes=7
    )
    data = (rng.rand(2, 64, 64, 3) * 255).astype(np.float32)
    ref, ours = _roundtrip(model, tmp_path, data)
    np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=5e-4)


def test_magtransform_v1_scalar(tmp_path, rng):
    @tf.keras.utils.register_keras_serializable(package="MyLayersV1", name="MagTransformV1")
    class MagTransformV1(tf.keras.layers.Layer):
        def __init__(self, **kwargs):
            super().__init__(**kwargs)
            self.a = self.add_weight(
                initializer=tf.keras.initializers.Constant(value=0.0),
                name="a-power",
                dtype="float32",
                shape=(),
                trainable=True,
            )

        def call(self, inputs):
            return tf.math.pow(inputs, tf.math.sigmoid(self.a))

    inp = tf.keras.Input((6, 6, 1))
    x = MagTransformV1()(inp)
    out = tf.keras.layers.Flatten()(x)
    model = tf.keras.Model(inp, out)
    data = np.abs(rng.randn(2, 6, 6, 1)).astype(np.float32)

    p = str(tmp_path / "v1.keras")
    model.save(p)
    ref = model.predict(data, verbose=0)
    km = KerasModel.load(p)
    ours = np.asarray(km(jnp.asarray(data)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_bf16_compute_parity(tmp_path, rng, magtransform_cls):
    """compute_dtype='bfloat16' (the AAT_KERAS_BF16 / net_dtype knob) must
    track the float32 graph: same argmax, probabilities within bf16 noise.
    BatchNorm/Normalization statistics must stay float32 internally."""
    inp = tf.keras.Input((32, 24, 1))
    x = magtransform_cls()(inp)
    x = tf.keras.layers.Conv2D(8, 3, strides=2, padding="same")(x)
    x = tf.keras.layers.BatchNormalization()(x)
    x = tf.keras.layers.ReLU()(x)
    x = tf.keras.layers.DepthwiseConv2D(3, padding="same")(x)
    x = tf.keras.layers.BatchNormalization()(x)
    x = tf.keras.layers.GlobalAveragePooling2D()(x)
    out = tf.keras.layers.Dense(5, activation="softmax")(x)
    model = tf.keras.Model(inp, out)
    p = str(tmp_path / "m.keras")
    model.save(p)

    data = np.abs(rng.randn(8, 32, 24, 1)).astype(np.float32)
    f32 = np.asarray(KerasModel.load(p)(jnp.asarray(data)))
    bf16 = np.asarray(KerasModel.load(p, compute_dtype="bfloat16")(jnp.asarray(data)))
    assert bf16.dtype == np.float32  # cast back at the boundary
    assert (bf16.argmax(-1) == f32.argmax(-1)).all()
    np.testing.assert_allclose(bf16, f32, atol=0.03)


@pytest.mark.parametrize(
    "ctor",
    ["MobileNetV2", "ResNet50", "EfficientNetV2B0"],
)
def test_application_zoo_imports_logit_exact(rng, ctor):
    """Beyond EfficientNetB0 (the reference flagship), the importer must
    cover the model families Cacophony could plausibly release next:
    inverted residuals (MobileNetV2), classic residentials (ResNet50), and
    V2 fused-MBConv + config-supplied Normalization stats
    (EfficientNetV2B0, whose mean/variance live in the layer CONFIG, not
    the weights)."""
    tf.keras.utils.set_random_seed(5)
    model = getattr(tf.keras.applications, ctor)(
        weights=None, input_shape=(96, 96, 3), classes=7
    )
    x = rng.rand(2, 96, 96, 3).astype(np.float32)
    ref = model(x).numpy()
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = d + "/m.keras"
        model.save(p)
        km = KerasModel.load(p)
        ours = np.asarray(km(jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)
