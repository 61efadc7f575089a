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


# ---------------------------------------------------------------------------
# Keras-2 semantic differences (found by the k2 architecture fuzz, round 4)
# ---------------------------------------------------------------------------


def test_keras2_hard_sigmoid_semantics(tmp_path, rng):
    """Keras 2's hard_sigmoid is clip(0.2x+0.5, 0, 1); Keras 3 changed it to
    relu6(x+3)/6. The importer must use the semantics of the GENERATION that
    saved the archive (keyed on metadata.json keras_version)."""
    import tf_keras as tk

    tk.utils.set_random_seed(3)
    inp = tk.Input((8, 8, 2))
    x = tk.layers.Conv2D(4, 3, padding="same", activation="hard_sigmoid")(inp)
    x = tk.layers.Activation("hard_sigmoid")(x)
    model = tk.Model(inp, tk.layers.GlobalAveragePooling2D()(x))
    p = str(tmp_path / "m.keras")
    model.save(p, save_format="keras")
    data = rng.randn(3, 8, 8, 2).astype(np.float32) * 3.0
    ref = np.asarray(model.predict(data, verbose=0))
    ours = np.asarray(KerasModel.load(p)(jnp.asarray(data)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    # and the SAME source model saved by keras 3 must use the NEW semantics
    keras.utils.set_random_seed(3)
    inp3 = keras.Input((8, 8, 2))
    y = kl.Conv2D(4, 3, padding="same", activation="hard_sigmoid")(inp3)
    y = kl.Activation("hard_swish")(y)
    m3 = keras.Model(inp3, kl.GlobalAveragePooling2D()(y))
    p3 = str(tmp_path / "m3.keras")
    m3.save(p3)
    ref3 = np.asarray(m3.predict(data, verbose=0))
    ours3 = np.asarray(KerasModel.load(p3)(jnp.asarray(data)))
    np.testing.assert_allclose(ours3, ref3, rtol=1e-5, atol=1e-6)


def test_gelu_activation_is_exact_not_tanh_approx(tmp_path, rng):
    """keras.activations.gelu defaults to the exact erf form; jax.nn.gelu
    defaults to the tanh approximation (max diff ~5e-4) — the importer must
    use the exact form."""
    inp = keras.Input((16,))
    model = keras.Model(inp, kl.Dense(16, activation="gelu")(inp))
    ref, ours = _roundtrip(model, tmp_path, rng.randn(4, 16).astype(np.float32) * 2)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_keras2_nested_model_node_offset(tmp_path, rng):
    """Keras-2 refs to nested-model layers count the internal construction
    node: a nested Sequential called once is referenced as node 1, a twice-
    called nested Functional as nodes 1 and 2. The importer shifts them onto
    the enumerated external calls."""
    import tf_keras as tk

    tk.utils.set_random_seed(4)
    inner_in = tk.Input((8, 3))
    inner = tk.Model(inner_in, tk.layers.Conv1D(3, 3, padding="same")(inner_in))
    seq = tk.Sequential([tk.layers.Dense(6), tk.layers.Dense(3)])
    inp = tk.Input((8, 3))
    a = inner(inp)          # inner node 1 (serialized)
    b = inner(a)            # inner node 2
    c = seq(b)              # seq node 1
    model = tk.Model(inp, tk.layers.GlobalAveragePooling1D()(c))
    p = str(tmp_path / "m.keras")
    model.save(p, save_format="keras")
    data = rng.randn(2, 8, 3).astype(np.float32)
    ref = np.asarray(model.predict(data, verbose=0))
    ours = np.asarray(KerasModel.load(p)(jnp.asarray(data)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_keras2_tfoplambda_scalar_kwarg(tmp_path, rng):
    """tf.math.maximum(x, 0.1) serializes the scalar operand as node kwarg
    'y' — the op table's parameter names must match the tf.* API."""
    import tf_keras as tk
    import tensorflow as _tf

    tk.utils.set_random_seed(5)
    inp = tk.Input((6,))
    x = _tf.math.maximum(inp, 0.1)
    x = _tf.math.minimum(x, 0.9)
    x = _tf.math.pow(x, 2.0)
    model = tk.Model(inp, x)
    p = str(tmp_path / "m.keras")
    model.save(p, save_format="keras")
    data = rng.randn(3, 6).astype(np.float32)
    ref = np.asarray(model.predict(data, verbose=0))
    ours = np.asarray(KerasModel.load(p)(jnp.asarray(data)))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)


def test_conv_transpose_output_padding_fails_loudly(tmp_path, rng):
    """output_padding (and groups) are unimplemented in the transpose-conv
    lowering — an archive using them must hit the fail-loudly contract
    (docs/API.md), not import with a silently different output. Keras 3
    dropped the parameter, so only Keras-2 archives can carry it."""
    import tf_keras as tk

    inp = tk.Input((7, 7, 3))
    x = tk.layers.Conv2DTranspose(
        4, 3, strides=2, padding="valid", output_padding=1
    )(inp)
    model = tk.Model(inp, x)
    p = str(tmp_path / "m.keras")
    model.save(p, save_format="keras")
    km = KerasModel.load(p)
    with pytest.raises(ValueError, match="output_padding"):
        km(jnp.zeros((1, 7, 7, 3)))

    inp = tk.Input((9, 2))
    x = tk.layers.Conv1DTranspose(4, 3, strides=2, output_padding=1)(inp)
    model = tk.Model(inp, x)
    p = str(tmp_path / "m1.keras")
    model.save(p, save_format="keras")
    km = KerasModel.load(p)
    with pytest.raises(ValueError, match="output_padding"):
        km(jnp.zeros((1, 9, 2)))


def test_k3_op_layer_tolerates_unknown_config_key(tmp_path, rng):
    """A future Keras adding a serialized config key to an op layer (e.g.
    dtype) must degrade gracefully — keys the op's signature doesn't name
    are dropped, not passed through to a TypeError."""
    import json
    import shutil
    import zipfile

    inp = keras.Input((8,))
    x = keras.ops.relu(inp * 2.0)
    model = keras.Model(inp, x)
    p = tmp_path / "m.keras"
    model.save(str(p))
    data = rng.randn(2, 8).astype(np.float32)
    ref = model.predict(data, verbose=0)

    # tamper: add an unknown key to every op-layer config in the archive
    workdir = tmp_path / "unz"
    with zipfile.ZipFile(p) as z:
        z.extractall(workdir)
    cfg = json.loads((workdir / "config.json").read_text())
    n_tampered = 0
    for layer in cfg["config"]["layers"]:
        mod = layer.get("module") or ""
        if mod.startswith(("keras.src.ops", "keras.ops")):
            layer["config"]["dtype"] = "float32"
            layer["config"]["future_knob"] = 7
            n_tampered += 1
    assert n_tampered >= 1
    (workdir / "config.json").write_text(json.dumps(cfg))
    p2 = tmp_path / "tampered.keras"
    with zipfile.ZipFile(p2, "w") as z:
        for f in workdir.rglob("*"):
            if f.is_file():
                z.write(f, f.relative_to(workdir))
    shutil.rmtree(workdir)

    ours = np.asarray(KerasModel.load(str(p2))(jnp.asarray(data)))
    np.testing.assert_allclose(ours, np.asarray(ref), rtol=1e-6, atol=1e-7)
