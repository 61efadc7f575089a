"""Execute imported Keras functional graphs as pure JAX functions.

``KerasModel.load(path)`` parses a ``.keras`` archive (io.keras_import) and
builds a jit-compatible ``apply(params, x)``: a topological walk over the
functional graph where each layer maps to the functional ops in
models.layers. This replaces the reference's TF-runtime ``model.predict``
(src/identify_tracks.py:543-545) with a single XLA program that fuses into
the batched window-grid pipeline.

Covered layer set: everything the Cacophony classifier family and
keras.applications EfficientNet need (Conv/DepthwiseConv/SeparableConv,
BatchNorm, Dense, poolings, activations, merges, shape ops, Rescaling,
Normalization, Dropout, MagTransform v1/v2).
"""

import base64
import logging
import marshal
import os
import re
import types

import numpy as np
import jax
import jax.numpy as jnp

from audio_analysis_tpu.models import layers as L
from audio_analysis_tpu.models.magtransform import mag_transform
from audio_analysis_tpu.io.keras_import import read_keras_archive


def _to_snake_case(name: str) -> str:
    """Keras's to_snake_case (keras/src/utils/naming.py semantics)."""
    name = re.sub(r"\W+", "", name)
    name = re.sub(r"(.)([A-Z][a-z]+)", r"\1_\2", name)
    name = re.sub(r"([a-z])([A-Z])", r"\1_\2", name).lower()
    return name


def _layer_name(layer: dict) -> str:
    # Functional configs carry a top-level "name"; Sequential ones only have
    # it inside config.
    return layer.get("name") or layer["config"].get("name")


def _pair(v):
    if isinstance(v, (list, tuple)):
        return tuple(int(x) for x in v)
    return (int(v), int(v))


def _one(v):
    if isinstance(v, (list, tuple)):
        return int(v[0])
    return int(v)


def _norm_pad2d(p):
    """Keras ZeroPadding2D/Cropping2D padding normalisation."""
    if isinstance(p, int):
        return ((p, p), (p, p))
    a, b = p
    if isinstance(a, int):
        return ((a, a), (b, b))
    return (tuple(a), tuple(b))


# ---------------------------------------------------------------------------
# TFOpLambda / Lambda support
# ---------------------------------------------------------------------------

def _reduce(op):
    def fn(x, axis=None, keepdims=False, **kw):
        if isinstance(axis, list):
            axis = tuple(axis)
        return op(x, axis=axis, keepdims=keepdims)

    return fn


# tf.* function paths as serialized by Keras-2 TFOpLambda configs
# (tf_keras emits these for raw-TF-op calls inside functional models, e.g.
# the hard-swish blocks of keras.applications MobileNetV3). Each entry maps
# the dotted path in config["function"] to a jnp implementation with the
# same call signature.
_TF_OPS = {
    "__operators__.add": lambda x, y: x + y,
    "math.add": lambda x, y: x + y,
    "math.subtract": lambda x, y: x - y,
    "math.multiply": lambda x, y: x * y,
    "math.truediv": lambda x, y: x / y,
    "math.divide": lambda x, y: x / y,
    # parameter names mirror the tf.* API: a scalar second operand
    # serializes into node kwargs under the TF argument name (e.g.
    # tf.math.maximum(x, 0.1) -> kwargs {"y": 0.1})
    "math.pow": lambda x, y: jnp.power(x, y),
    "math.abs": lambda x: jnp.abs(x),
    "math.exp": lambda x: jnp.exp(x),
    "math.log": lambda x: jnp.log(x),
    "math.sqrt": lambda x: jnp.sqrt(x),
    "math.rsqrt": lambda x: jax.lax.rsqrt(x),
    "math.square": lambda x: jnp.square(x),
    "math.sigmoid": lambda x: jax.nn.sigmoid(x),
    "math.tanh": lambda x: jnp.tanh(x),
    "math.maximum": lambda x, y: jnp.maximum(x, y),
    "math.minimum": lambda x, y: jnp.minimum(x, y),
    "math.reduce_mean": _reduce(jnp.mean),
    "math.reduce_max": _reduce(jnp.max),
    "math.reduce_min": _reduce(jnp.min),
    "math.reduce_sum": _reduce(jnp.sum),
    "nn.relu": lambda features: jax.nn.relu(features),
    "nn.relu6": lambda features: jnp.clip(features, 0, 6),
    "nn.silu": lambda features, beta=1.0: features * jax.nn.sigmoid(beta * features),
    "nn.swish": lambda features: jax.nn.silu(features),
    "nn.gelu": lambda features, approximate=False: jax.nn.gelu(
        features, approximate=approximate
    ),
    "nn.elu": lambda features: jax.nn.elu(features),
    "nn.softmax": lambda logits, axis=-1: jax.nn.softmax(logits, axis=axis),
    "nn.sigmoid": lambda x: jax.nn.sigmoid(x),
    "nn.tanh": lambda x: jnp.tanh(x),
    "clip_by_value": lambda t, clip_value_min, clip_value_max: jnp.clip(
        t, clip_value_min, clip_value_max
    ),
    "reshape": lambda tensor, shape: jnp.reshape(tensor, [int(s) for s in shape]),
    "transpose": lambda a, perm=None, conjugate=False: jnp.transpose(a, perm),
    "concat": lambda values, axis: jnp.concatenate(values, axis=axis),
    "expand_dims": lambda input, axis: jnp.expand_dims(input, axis),
    "squeeze": lambda input, axis=None: jnp.squeeze(
        input, tuple(axis) if isinstance(axis, list) else axis
    ),
    "stack": lambda values, axis=0: jnp.stack(values, axis=axis),
    "split": lambda value, num_or_size_splits, axis=0: (
        jnp.split(value, num_or_size_splits, axis=axis)
        if isinstance(num_or_size_splits, int)
        else jnp.split(
            value, list(np.cumsum(num_or_size_splits)[:-1]), axis=axis
        )
    ),
    "identity": lambda input: input,
    "stop_gradient": jax.lax.stop_gradient,
    "cast": lambda x, dtype: x.astype(jnp.dtype(dtype)),
    "compat.v1.squeeze": lambda input, axis=None, squeeze_dims=None: jnp.squeeze(
        input,
        tuple(a) if isinstance((a := axis if axis is not None else squeeze_dims), list) else a,
    ),
}


# Keras-3 op-layers: raw keras.ops/operator use on KerasTensors serializes
# as layers from module "keras.src.ops.*" whose constructor args (axis,
# keepdims, x_min, ...) live in the layer CONFIG (the node only carries the
# tensors). Class names here may shadow keras.layers merge classes (Add,
# Multiply, Concatenate) — dispatch keys on the module prefix first.
_K3_OPS = {
    "Add": lambda x, y: x + y,
    "Subtract": lambda x, y: x - y,
    "Multiply": lambda x, y: x * y,
    "TrueDivide": lambda x, y: x / y,
    "Divide": lambda x, y: x / y,
    "FloorDivide": lambda x, y: jnp.floor_divide(x, y),
    "Power": jnp.power,
    "Absolute": jnp.abs,
    "Abs": jnp.abs,
    "Negative": jnp.negative,
    "Exp": jnp.exp,
    "Log": jnp.log,
    "Sqrt": jnp.sqrt,
    "Square": jnp.square,
    "Tanh": jnp.tanh,
    "Maximum": jnp.maximum,
    "Minimum": jnp.minimum,
    "Mean": _reduce(jnp.mean),
    "Max": _reduce(jnp.max),
    "Min": _reduce(jnp.min),
    "Sum": _reduce(jnp.sum),
    "Reshape": lambda x, newshape: jnp.reshape(x, tuple(int(s) for s in newshape)),
    "Transpose": lambda x, axes=None: jnp.transpose(x, axes),
    "ExpandDims": lambda x, axis: jnp.expand_dims(x, axis),
    "Squeeze": lambda x, axis=None: jnp.squeeze(
        x, tuple(axis) if isinstance(axis, list) else axis
    ),
    "Clip": lambda x, x_min, x_max: jnp.clip(x, x_min, x_max),
    "GetItem": lambda x, key: x[tuple(key) if isinstance(key, list) else key],
    "Stack": lambda xs, axis=0: jnp.stack(xs, axis=axis),
    "Concatenate": lambda xs, axis=0: jnp.concatenate(xs, axis=axis),
    "Relu": jax.nn.relu,
    "Relu6": lambda x: jnp.clip(x, 0, 6),
    "Silu": jax.nn.silu,
    "Gelu": lambda x, approximate=True: jax.nn.gelu(x, approximate=approximate),
    "Sigmoid": jax.nn.sigmoid,
    "Softmax": lambda x, axis=-1: jax.nn.softmax(x, axis=axis),
    "LogSoftmax": lambda x, axis=-1: jax.nn.log_softmax(x, axis=axis),
    "Elu": lambda x, alpha=1.0: jax.nn.elu(x, alpha),
    "Selu": jax.nn.selu,
    "Softplus": jax.nn.softplus,
    "Softsign": jax.nn.soft_sign,
    "HardSigmoid": jax.nn.hard_sigmoid,
    "HardSilu": lambda x: x * jax.nn.hard_sigmoid(x),
    "LeakyRelu": lambda x, negative_slope=0.2: jax.nn.leaky_relu(x, negative_slope),
    "Rsqrt": jax.lax.rsqrt,
    "Erf": jax.lax.erf,
}


def _tf_op(fname, name):
    fn = _TF_OPS.get(fname)
    if fn is None:
        raise ValueError(
            f"unsupported TFOpLambda function {fname!r} ({name}); supported: "
            + ", ".join(sorted(_TF_OPS))
        )
    return fn


def _getitem_slice_spec(x, slice_spec):
    """SlicingOpLambda (`tensor[...]` in a Keras-2 functional model):
    slice_spec is a list of {"start","stop","step"} dicts and/or bare ints."""
    idx = []
    for s in slice_spec:
        if isinstance(s, dict):
            idx.append(slice(s.get("start"), s.get("stop"), s.get("step")))
        elif s is None:
            idx.append(jnp.newaxis)
        elif s is Ellipsis or s == "ellipsis":
            idx.append(Ellipsis)
        else:
            idx.append(int(s))
    return x[tuple(idx)]


def _load_lambda(cfg, layer_name):
    """Deserialize a Keras-3 Lambda layer's function.

    Keras serializes the lambda as marshalled CPython bytecode
    (``{"class_name": "__lambda__", "config": {"code": ...}}``) and refuses
    to load it unless ``safe_mode=False`` — running it IS arbitrary code
    execution. We mirror that contract: set ``AAT_UNSAFE_LAMBDA=1`` to allow
    it. The function body runs on JAX tracers, so only operator/`jnp`-style
    lambdas execute correctly; `np`/`numpy` globals are aliased to jnp."""
    fn_spec = cfg.get("function")
    if isinstance(fn_spec, str):
        # registered/builtin function saved by name, e.g. "abs"
        from audio_analysis_tpu.models import layers as _L

        try:
            return _L.activation(fn_spec)
        except ValueError:
            raise ValueError(
                f"Lambda layer {layer_name}: unknown named function {fn_spec!r}"
            )
    if not (isinstance(fn_spec, dict) and fn_spec.get("class_name") == "__lambda__"):
        raise ValueError(f"Lambda layer {layer_name}: unsupported function spec")
    if os.environ.get("AAT_UNSAFE_LAMBDA", "0") != "1":
        raise ValueError(
            f"Lambda layer {layer_name} contains marshalled Python bytecode; "
            "executing it is arbitrary code execution (Keras requires "
            "safe_mode=False for the same reason). Set AAT_UNSAFE_LAMBDA=1 "
            "to allow it."
        )
    spec = fn_spec["config"]
    code = spec["code"]
    raw = base64.decodebytes(code.encode("ascii") if isinstance(code, str) else code)
    code_obj = marshal.loads(raw)
    defaults = spec.get("defaults")
    closure = spec.get("closure")
    if closure is not None:
        def _cell(v):
            return (lambda: v).__closure__[0]

        closure = tuple(_cell(v) for v in closure)
    glb = {
        "np": jnp,
        "numpy": jnp,
        "jnp": jnp,
        "jax": jax,
        "__builtins__": __builtins__,
    }
    return types.FunctionType(
        code_obj,
        glb,
        name=code_obj.co_name,
        argdefs=tuple(defaults) if defaults else None,
        closure=closure,
    )


class KerasModel:
    """An imported Keras model: ``model(x)`` or ``model.apply(params, x)``.

    ``compute_dtype="bfloat16"`` runs the graph in bfloat16 (weights cast at
    use inside the jit, BatchNorm scale/shift computed in float32 from the
    stored statistics, output cast back to float32). This halves the HBM
    activation traffic that dominates CNN forwards on TPU; parity bound is
    pinned by tests/test_keras_import.py::test_bf16_compute_parity. Off by
    default — float32 keeps strict reference parity."""

    def __init__(self, config, weights, name_prefix="", compute_dtype=None,
                 keras2=False):
        self.config = config
        cfg = config["config"] if "config" in config else config
        self.name = cfg.get("name", "model")
        self._layers = cfg["layers"]
        self._by_name = {_layer_name(l): l for l in self._layers}
        self._prefix = name_prefix
        self.keras2 = bool(keras2)
        if self.keras2:
            # Keras-2 graph refs to NESTED-MODEL layers are offset +1 (the
            # model's internal construction node is node 0; external calls
            # start at 1) — shift them onto the enumerated external-call
            # index once, in place (idempotent via the marker: _run_layer
            # re-wraps nested configs on every forward).
            _shift_k2_model_refs(cfg)
        # The weights.h5 keys are NOT the config layer names: Keras
        # regenerates them at save time as snake_case(class_name) with a
        # fresh per-model, per-base counter (explicit layer names are
        # ignored; verified empirically against TF 2.21 archives).
        counts = {}
        self._h5key = {}
        for l in self._layers:
            base = _to_snake_case(l["class_name"])
            n = counts.get(base, 0)
            counts[base] = n + 1
            self._h5key[_layer_name(l)] = base if n == 0 else f"{base}_{n}"
        self.params = {k: [jnp.asarray(a) for a in v] for k, v in weights.items()}
        self.compute_dtype = (
            jnp.dtype(compute_dtype) if compute_dtype not in (None, "float32") else None
        )
        self._class = config.get("class_name", "Functional")
        if self._class == "Sequential":
            self._output_spec = None
            self._input_names = None
        else:
            # Keras stores a single input/output as one flat [name, node,
            # tensor] triple, multiple as a list of triples.
            def norm(spec):
                if spec and isinstance(spec[0], str):
                    return [spec]
                return spec

            self._output_spec = norm(cfg["output_layers"])
            self._input_names = [i[0] for i in norm(cfg["input_layers"])]

    # -- construction -------------------------------------------------------

    @classmethod
    def load(cls, path, compute_dtype=None) -> "KerasModel":
        config, weights, meta = read_keras_archive(path)
        keras2 = str(meta.get("keras_version", "3")).startswith("2")
        return cls(config, weights, compute_dtype=compute_dtype, keras2=keras2)

    # -- execution ----------------------------------------------------------

    def __call__(self, x):
        return self.apply(self.params, x)

    def apply_train(self, params, x, rng):
        """Training-mode forward: BatchNorm normalises with BATCH statistics
        (returned so the caller can EMA them into the running stats, see
        parallel/finetune.py) and Dropout/SpatialDropout2D are live, keyed
        off `rng` (deterministic per layer via fold_in). Pure in (params,
        x, rng) — safe under jit/grad. Returns (y, batch_stats) with
        batch_stats mapping each BatchNormalization weight key ->
        (batch_mean, batch_var)."""
        ctx = {"rng": rng, "n": 0, "stats": {}}
        self._train_ctx = ctx
        try:
            y = self.apply(params, x)
        finally:
            self._train_ctx = None
        return y, ctx["stats"]

    def walk_layers(self):
        """Yield (weight_key, class_name, config) for every real layer,
        recursing through nested Functional/Sequential submodels in
        execution order — the introspection surface for fine-tuning
        (trainability masks, head discovery)."""
        for layer in self._layers:
            cls = layer["class_name"]
            if cls == "InputLayer":
                continue
            name = _layer_name(layer)
            if cls in ("Functional", "Sequential"):
                sub = KerasModel(
                    layer,
                    {},
                    name_prefix=self._prefix + self._h5key[name] + "/layers/",
                    compute_dtype=self.compute_dtype,
                    keras2=self.keras2,
                )
                yield from sub.walk_layers()
            else:
                yield self._prefix + self._h5key[name], cls, layer["config"]

    def _cast_in(self, x):
        cdt = self.compute_dtype
        if cdt is None or not hasattr(x, "astype"):
            return x
        return x.astype(cdt) if jnp.issubdtype(x.dtype, jnp.floating) else x

    def _cast_out(self, y):
        if self.compute_dtype is None:
            return y
        if isinstance(y, (list, tuple)):
            return type(y)(self._cast_out(o) for o in y)
        return y.astype(jnp.float32) if jnp.issubdtype(y.dtype, jnp.floating) else y

    def apply(self, params, x):
        """Run the graph. `x` is one input array (or list for multi-input)."""
        if self._class == "Sequential":
            y = self._cast_in(x)
            for layer in self._layers:
                if layer["class_name"] == "InputLayer":
                    continue
                y = self._run_layer(layer, [y], params)
            return self._cast_out(y)

        inputs = x if isinstance(x, (list, tuple)) else [x]
        inputs = [self._cast_in(i) for i in inputs]
        values = {}  # (layer_name, node_idx, tensor_idx) -> array
        for name, inp in zip(self._input_names, inputs):
            values[(name, 0, 0)] = inp

        # per-NODE readiness, not per-layer: a shared layer's later call can
        # consume its own earlier call's output (e.g. a nested model chained
        # onto itself), so nodes of one layer must be runnable independently
        remaining = [
            (l, node_idx, node)
            for l in self._layers
            if l["class_name"] != "InputLayer"
            for node_idx, node in enumerate(l.get("inbound_nodes", []))
        ]
        progress = True
        while remaining and progress:
            progress = False
            still = []
            for layer, node_idx, node in remaining:
                refs = _collect_history(node)
                if not all(r in values for r in refs):
                    still.append((layer, node_idx, node))
                    continue
                args = _resolve_args(node, values)
                kwargs = _resolve_kwargs(node, values)
                out = self._run_layer(layer, args, params, kwargs)
                if isinstance(out, (list, tuple)):
                    for ti, o in enumerate(out):
                        values[(layer["name"], node_idx, ti)] = o
                else:
                    values[(layer["name"], node_idx, 0)] = out
                progress = True
            remaining = still
        if remaining:
            raise ValueError(
                "could not resolve layers: "
                f"{sorted({l['name'] for l, _, _ in remaining})}"
            )

        outs = [
            values[(name, node_idx, tensor_idx)]
            for name, node_idx, tensor_idx in self._output_spec
        ]
        return self._cast_out(outs[0] if len(outs) == 1 else outs)

    # -- per-layer dispatch --------------------------------------------------

    def _act(self, name):
        """Activation with the semantics of the Keras that SAVED the
        archive (Keras-2 hard_sigmoid differs — see layers.activation)."""
        return L.activation(name, keras2=self.keras2)

    def _vars(self, params, layer_name):
        key = self._prefix + self._h5key[layer_name]
        return params.get(key, [])

    def _vars_compute(self, params, layer_name):
        """Like _vars, but cast to the compute dtype at use — INSIDE the
        jitted program, where the cast fuses (weight bytes are dwarfed by
        the halved activation traffic). BatchNorm keeps float32 statistics
        and is handled separately in its branch."""
        v = self._vars(params, layer_name)
        cdt = self.compute_dtype
        if cdt is None:
            return v
        return [
            a.astype(cdt) if jnp.issubdtype(a.dtype, jnp.floating) else a for a in v
        ]

    def _run_layer(self, layer, args, params, kwargs=None):
        cls = layer["class_name"]
        cfg = layer["config"]
        name = _layer_name(layer)
        v = self._vars_compute(params, name)
        x = args[0] if args else None
        kwargs = {
            k: w
            for k, w in (kwargs or {}).items()
            if k not in ("name", "training", "mask") and w is not None
        }
        mod = layer.get("module") or ""
        if (
            mod.startswith("keras.src.ops") or mod.startswith("keras.ops")
        ) and cls in _K3_OPS:
            op = _K3_OPS[cls]
            opkw = {k: w for k, w in cfg.items() if k != "name" and w is not None}
            # config keys a newer Keras serializes that the op doesn't take
            # (e.g. dtype) must degrade gracefully, not TypeError — keep
            # only keys the op's signature names (pass-through when the
            # signature is unavailable or has **kwargs)
            import inspect

            try:
                ps = inspect.signature(op).parameters.values()
            except (TypeError, ValueError):
                ps = None
            if ps is not None and not any(p.kind == p.VAR_KEYWORD for p in ps):
                known = {
                    p.name
                    for p in ps
                    if p.kind in (p.POSITIONAL_OR_KEYWORD, p.KEYWORD_ONLY)
                }
                opkw = {k: w for k, w in opkw.items() if k in known}
            opkw.update(kwargs)
            return op(*args, **opkw)

        if cls in ("Dropout", "SpatialDropout2D", "GaussianNoise", "GaussianDropout", "Identity", "ActivityRegularization"):
            ctx = getattr(self, "_train_ctx", None)
            rate = float(cfg.get("rate", 0.0) or 0.0)
            if ctx is not None and rate > 0 and cls in ("Dropout", "SpatialDropout2D"):
                ctx["n"] += 1
                key = jax.random.fold_in(ctx["rng"], ctx["n"])
                shape = list(x.shape)
                if cls == "SpatialDropout2D":  # one mask per (batch, channel)
                    shape[1] = shape[2] = 1
                elif cfg.get("noise_shape"):
                    # e.g. EfficientNet's stochastic depth: (None, 1, 1, 1)
                    # — None dims follow the input, fixed dims broadcast
                    shape = [
                        x.shape[d] if n is None else int(n)
                        for d, n in enumerate(cfg["noise_shape"])
                    ]
                keep = jax.random.bernoulli(key, 1.0 - rate, tuple(shape))
                return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)
            if ctx is not None and cls == "GaussianNoise" and cfg.get("stddev", 0):
                ctx["n"] += 1
                key = jax.random.fold_in(ctx["rng"], ctx["n"])
                return x + cfg["stddev"] * jax.random.normal(key, x.shape, x.dtype)
            if ctx is not None and cls == "GaussianDropout" and rate > 0:
                ctx["n"] += 1
                key = jax.random.fold_in(ctx["rng"], ctx["n"])
                std = float(np.sqrt(rate / (1.0 - rate)))
                return x * (1.0 + std * jax.random.normal(key, x.shape, x.dtype))
            return x
        if "MagTransform" in cls or "MagTransform" in (layer.get("registered_name") or ""):
            return mag_transform(x, v[0])
        if cls == "Conv2D":
            act = self._act(cfg.get("activation"))
            bias = v[1] if cfg.get("use_bias", True) and len(v) > 1 else None
            return act(
                L.conv2d(
                    x,
                    v[0],
                    bias,
                    strides=_pair(cfg.get("strides", 1)),
                    padding=cfg.get("padding", "valid"),
                    dilation=_pair(cfg.get("dilation_rate", 1)),
                    groups=int(cfg.get("groups", 1)),
                )
            )
        if cls == "DepthwiseConv2D":
            act = self._act(cfg.get("activation"))
            bias = v[1] if cfg.get("use_bias", True) and len(v) > 1 else None
            return act(
                L.depthwise_conv2d(
                    x,
                    v[0],
                    bias,
                    strides=_pair(cfg.get("strides", 1)),
                    padding=cfg.get("padding", "valid"),
                    dilation=_pair(cfg.get("dilation_rate", 1)),
                )
            )
        if cls == "SeparableConv2D":
            act = self._act(cfg.get("activation"))
            bias = v[2] if cfg.get("use_bias", True) and len(v) > 2 else None
            y = L.depthwise_conv2d(
                x,
                v[0],
                None,
                strides=_pair(cfg.get("strides", 1)),
                padding=cfg.get("padding", "valid"),
                dilation=_pair(cfg.get("dilation_rate", 1)),
            )
            return act(L.conv2d(y, v[1], bias, strides=(1, 1), padding="VALID"))
        if cls == "Conv1D":
            act = self._act(cfg.get("activation"))
            bias = v[1] if cfg.get("use_bias", True) and len(v) > 1 else None
            return act(
                L.conv1d(
                    x,
                    v[0],
                    bias,
                    strides=_one(cfg.get("strides", 1)),
                    padding=cfg.get("padding", "valid"),
                    dilation=_one(cfg.get("dilation_rate", 1)),
                    groups=int(cfg.get("groups", 1)),
                )
            )
        if cls == "DepthwiseConv1D":
            act = self._act(cfg.get("activation"))
            bias = v[1] if cfg.get("use_bias", True) and len(v) > 1 else None
            return act(
                L.depthwise_conv1d(
                    x,
                    v[0],
                    bias,
                    strides=_one(cfg.get("strides", 1)),
                    padding=cfg.get("padding", "valid"),
                    dilation=_one(cfg.get("dilation_rate", 1)),
                )
            )
        if cls == "SeparableConv1D":
            act = self._act(cfg.get("activation"))
            bias = v[2] if cfg.get("use_bias", True) and len(v) > 2 else None
            y = L.depthwise_conv1d(
                x,
                v[0],
                None,
                strides=_one(cfg.get("strides", 1)),
                padding=cfg.get("padding", "valid"),
                dilation=_one(cfg.get("dilation_rate", 1)),
            )
            return act(L.conv1d(y, v[1], bias, strides=1, padding="VALID"))
        if cls == "Conv2DTranspose":
            # fail loudly (docs/API.md contract) instead of importing with a
            # silently different output shape/values
            if cfg.get("output_padding") is not None:
                raise ValueError(
                    f"unsupported Keras layer config: {cls} with "
                    f"output_padding={cfg['output_padding']!r}"
                )
            if cfg.get("groups", 1) != 1:
                raise ValueError(
                    f"unsupported Keras layer config: {cls} with "
                    f"groups={cfg['groups']!r}"
                )
            act = self._act(cfg.get("activation"))
            bias = v[1] if cfg.get("use_bias", True) and len(v) > 1 else None
            return act(
                L.conv2d_transpose(
                    x,
                    v[0],
                    bias,
                    strides=_pair(cfg.get("strides", 1)),
                    padding=cfg.get("padding", "valid"),
                    dilation=_pair(cfg.get("dilation_rate", 1)),
                )
            )
        if cls == "Conv1DTranspose":
            if cfg.get("output_padding") is not None:
                raise ValueError(
                    f"unsupported Keras layer config: {cls} with "
                    f"output_padding={cfg['output_padding']!r}"
                )
            if cfg.get("groups", 1) != 1:
                raise ValueError(
                    f"unsupported Keras layer config: {cls} with "
                    f"groups={cfg['groups']!r}"
                )
            act = self._act(cfg.get("activation"))
            bias = v[1] if cfg.get("use_bias", True) and len(v) > 1 else None
            return act(
                L.conv1d_transpose(
                    x,
                    v[0],
                    bias,
                    strides=_one(cfg.get("strides", 1)),
                    padding=cfg.get("padding", "valid"),
                    dilation=_one(cfg.get("dilation_rate", 1)),
                )
            )
        if cls == "Dense":
            act = self._act(cfg.get("activation"))
            bias = v[1] if cfg.get("use_bias", True) and len(v) > 1 else None
            return act(L.dense(x, v[0], bias))
        if cls == "BatchNormalization":
            scale = cfg.get("scale", True)
            center = cfg.get("center", True)
            vf = self._vars(params, name)  # float32 statistics, uncast
            i = 0
            gamma = vf[i] if scale else None
            i += 1 if scale else 0
            beta = vf[i] if center else None
            i += 1 if center else 0
            mean, var = vf[i], vf[i + 1]
            eps = cfg.get("epsilon", 1e-3)
            axis = cfg.get("axis", -1)
            if isinstance(axis, list):
                axis = axis[0]
            ctx = getattr(self, "_train_ctx", None)
            if ctx is not None:
                # training mode: normalise with BATCH statistics (biased
                # variance, Keras semantics) and report them for the EMA
                axis_n = axis % x.ndim
                red = tuple(i for i in range(x.ndim) if i != axis_n)
                xf = x.astype(jnp.float32)
                bm = jnp.mean(xf, red)
                # centered moment, NOT E[x^2]-E[x]^2: the uncentered form
                # cancels catastrophically for large-mean activations
                # (error ~ mean^2 * 2^-24 exceeds eps once |mean| > ~130)
                # and can go negative into the rsqrt
                bv = jnp.mean(
                    jnp.square(xf - jnp.expand_dims(bm, red)), red
                )
                ctx["stats"][self._prefix + self._h5key[name]] = (bm, bv)
                shape = [1] * x.ndim
                shape[axis_n] = x.shape[axis_n]
                inv = jax.lax.rsqrt(bv + eps)
                a = inv if gamma is None else gamma * inv
                b = (0.0 if beta is None else beta) - bm * a
                y = xf * a.reshape(shape) + b.reshape(shape)
                return y.astype(x.dtype)
            if self.compute_dtype is not None:
                # fold to scale/shift in float32 (rsqrt of bf16 variance
                # would lose ~3 digits), then apply in the compute dtype —
                # the [C]-sized fold is free next to the activation pass
                inv = jax.lax.rsqrt(var + eps)
                a = inv if gamma is None else gamma * inv
                b = (0.0 if beta is None else beta) - mean * a
                shape = [1] * x.ndim
                shape[axis] = x.shape[axis]
                a = a.reshape(shape).astype(self.compute_dtype)
                b = b.reshape(shape).astype(self.compute_dtype)
                return x * a + b
            return L.batch_norm(x, mean, var, gamma, beta, eps=eps, axis=axis)
        if cls == "Activation":
            return self._act(cfg.get("activation"))(x)
        if cls == "ReLU":
            y = jnp.where(x < 0, cfg.get("negative_slope", 0.0) * x, x)
            mx = cfg.get("max_value")
            if mx is not None:
                y = jnp.minimum(y, mx)
            thr = cfg.get("threshold", 0.0)
            if thr:
                y = jnp.where(x < thr, 0.0, y)
            return y
        if cls == "LeakyReLU":
            return jax.nn.leaky_relu(x, cfg.get("negative_slope", cfg.get("alpha", 0.3)))
        if cls == "ELU":
            return jax.nn.elu(x, cfg.get("alpha", 1.0))
        if cls == "PReLU":
            # weights: [alpha] shaped like input[1:] with shared_axes at 1 —
            # broadcasts against x directly (keras/src/layers/activations/prelu.py)
            alpha = v[0]
            return jax.nn.relu(x) - alpha * jax.nn.relu(-x)
        if cls == "Softmax":
            return jax.nn.softmax(x, axis=cfg.get("axis", -1))
        if cls == "MaxPooling2D":
            return L.max_pool2d(x, _pair(cfg.get("pool_size", 2)), _pair(cfg.get("strides") or cfg.get("pool_size", 2)), cfg.get("padding", "valid"))
        if cls == "AveragePooling2D":
            return L.avg_pool2d(x, _pair(cfg.get("pool_size", 2)), _pair(cfg.get("strides") or cfg.get("pool_size", 2)), cfg.get("padding", "valid"))
        if cls == "GlobalAveragePooling2D":
            return L.global_avg_pool2d(x, cfg.get("keepdims", False))
        if cls == "GlobalMaxPooling2D":
            return L.global_max_pool2d(x, cfg.get("keepdims", False))
        if cls == "GlobalAveragePooling1D":
            return jnp.mean(x, axis=1, keepdims=cfg.get("keepdims", False))
        if cls == "GlobalMaxPooling1D":
            return jnp.max(x, axis=1, keepdims=cfg.get("keepdims", False))
        if cls == "MaxPooling1D":
            return L.max_pool1d(x, _one(cfg.get("pool_size", 2)), _one(cfg.get("strides") or cfg.get("pool_size", 2)), cfg.get("padding", "valid"))
        if cls == "AveragePooling1D":
            return L.avg_pool1d(x, _one(cfg.get("pool_size", 2)), _one(cfg.get("strides") or cfg.get("pool_size", 2)), cfg.get("padding", "valid"))
        if cls == "ZeroPadding1D":
            p = cfg.get("padding", 1)
            pl, pr = (p, p) if isinstance(p, int) else (int(p[0]), int(p[1]))
            return jnp.pad(x, ((0, 0), (pl, pr), (0, 0)))
        if cls == "Cropping1D":
            c = cfg.get("cropping", (1, 1))
            cl, cr = (c, c) if isinstance(c, int) else (int(c[0]), int(c[1]))
            return x[:, cl : x.shape[1] - cr or None, :]
        if cls == "UpSampling1D":
            return jnp.repeat(x, int(cfg.get("size", 2)), axis=1)
        if cls == "LayerNormalization":
            axes = cfg.get("axis", -1)
            axes = tuple(axes) if isinstance(axes, (list, tuple)) else (axes,)
            axes = tuple(a % x.ndim for a in axes)
            eps = cfg.get("epsilon", 1e-3)
            vf = self._vars(params, name)  # float32 statistics path
            i = 0
            gamma = vf[i] if cfg.get("scale", True) and len(vf) > i else None
            i += 1 if cfg.get("scale", True) else 0
            beta = vf[i] if cfg.get("center", True) and len(vf) > i else None
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axes, keepdims=True)
            var = jnp.mean(jnp.square(xf - mean), axes, keepdims=True)
            shape = [1] * x.ndim
            for a in axes:
                shape[a] = x.shape[a]
            if cfg.get("rms_scaling", False):
                # deprecated Keras option: no centering, scale by rms
                y = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axes, keepdims=True) + eps)
                if gamma is not None:
                    y = y * gamma.reshape(shape)
                return y.astype(x.dtype)
            y = (xf - mean) * jax.lax.rsqrt(var + eps)
            if gamma is not None:
                y = y * gamma.reshape(shape)
            if beta is not None:
                y = y + beta.reshape(shape)
            return y.astype(x.dtype)
        if cls == "UnitNormalization":
            axes = cfg.get("axis", -1)
            axes = tuple(axes) if isinstance(axes, (list, tuple)) else (axes,)
            nrm = jnp.sqrt(jnp.sum(jnp.square(x), axes, keepdims=True))
            return x / jnp.maximum(nrm, 1e-12)
        if cls == "Embedding":
            table = v[0]
            return table[x.astype(jnp.int32)]
        if cls == "Flatten":
            return x.reshape(x.shape[0], -1)
        if cls == "Reshape":
            return x.reshape((x.shape[0],) + tuple(cfg["target_shape"]))
        if cls == "Permute":
            dims = cfg["dims"]
            return jnp.transpose(x, (0,) + tuple(dims))
        if cls == "ZeroPadding2D":
            return L.zero_padding2d(x, _norm_pad2d(cfg.get("padding", 1)))
        if cls == "Cropping2D":
            return L.cropping2d(x, _norm_pad2d(cfg.get("cropping", 0)))
        if cls == "UpSampling2D":
            return L.up_sampling2d(x, _pair(cfg.get("size", 2)), cfg.get("interpolation", "nearest"))
        if cls == "Rescaling":
            return x * cfg.get("scale", 1.0) + cfg.get("offset", 0.0)
        if cls == "Normalization":
            vf = self._vars(params, name)  # float32 statistics, uncast
            if len(vf) >= 2:  # adapt()-ed stats are stored as weights
                mean, var = vf[0], vf[1]
            else:
                # constructor-supplied stats live in the CONFIG, not the
                # weights (e.g. EfficientNetV2's ImageNet mean/variance)
                mean, var = cfg.get("mean"), cfg.get("variance")
                if mean is None or var is None:
                    return x  # unbuilt/un-adapted layer: identity
                axis = cfg.get("axis", -1)
                if isinstance(axis, (list, tuple)):
                    axis = axis[0] if axis else -1
                mean = jnp.asarray(mean, jnp.float32)
                var = jnp.asarray(var, jnp.float32)
                if mean.ndim:
                    shape = [1] * x.ndim
                    shape[axis] = mean.shape[0]
                    mean, var = mean.reshape(shape), var.reshape(shape)
            if cfg.get("invert", False):
                y = x * jnp.sqrt(var) + mean
            elif self.compute_dtype is not None:
                a = jax.lax.rsqrt(var)
                b = -mean * a
                return x * a.astype(self.compute_dtype) + b.astype(self.compute_dtype)
            else:
                y = (x - mean) / jnp.sqrt(var)
            if self.compute_dtype is not None:
                y = y.astype(self.compute_dtype)
            return y
        if cls == "Add":
            return sum(args[0]) if isinstance(args[0], list) else sum(args)
        if cls == "Subtract":
            a = args[0] if isinstance(args[0], list) else args
            return a[0] - a[1]
        if cls == "Multiply":
            a = args[0] if isinstance(args[0], list) else args
            y = a[0]
            for o in a[1:]:
                y = y * o
            return y
        if cls == "Average":
            a = args[0] if isinstance(args[0], list) else args
            return sum(a) / len(a)
        if cls == "Maximum":
            a = args[0] if isinstance(args[0], list) else args
            y = a[0]
            for o in a[1:]:
                y = jnp.maximum(y, o)
            return y
        if cls == "Minimum":
            a = args[0] if isinstance(args[0], list) else args
            y = a[0]
            for o in a[1:]:
                y = jnp.minimum(y, o)
            return y
        if cls == "Concatenate":
            a = args[0] if isinstance(args[0], list) else args
            return jnp.concatenate(a, axis=cfg.get("axis", -1))
        if cls == "Lambda":
            fn = _load_lambda(cfg, name)
            extra = dict(cfg.get("arguments") or {})
            extra.update(kwargs)
            return fn(*args, **extra)
        if cls == "TFOpLambda":
            fn = _tf_op(cfg.get("function"), name)
            return fn(*args, **kwargs)
        if cls == "SlicingOpLambda":
            spec = kwargs.get("slice_spec")
            if cfg.get("function") != "__operators__.getitem" or spec is None:
                raise ValueError(f"unsupported SlicingOpLambda {name}")
            return _getitem_slice_spec(x, spec)
        if cls in ("Functional", "Sequential"):
            sub = KerasModel(
                layer,
                {},
                name_prefix=self._prefix + self._h5key[name] + "/layers/",
                compute_dtype=self.compute_dtype,
                keras2=self.keras2,
            )
            # share the training context (rng counter + collected stats)
            sub._train_ctx = getattr(self, "_train_ctx", None)
            return sub.apply(params, x if len(args) == 1 else args)
        raise ValueError(f"unsupported Keras layer {cls} ({name})")


# ---------------------------------------------------------------------------
# inbound-node resolution
# ---------------------------------------------------------------------------


def _shift_k2_model_refs(cfg):
    """Keras-2 ref-index normalisation, in place and idempotent.

    In Keras 2, a nested Model/Sequential layer's keras_history node indices
    count its INTERNAL construction node first: external calls enumerate as
    inbound_nodes[0..k] but are referenced as node 1..k+1 (verified
    empirically against tf_keras 2.21 archives; a twice-called nested model
    serializes refs [1, 2] for calls [0, 1]). Shift every ref that targets a
    nested-model layer of THIS graph down by one so the (name, node, tensor)
    keys match the enumeration `apply` uses."""
    if cfg.get("__aat_k2_shifted__"):
        return
    cfg["__aat_k2_shifted__"] = True
    layers = cfg.get("layers", [])
    model_names = {
        _layer_name(l)
        for l in layers
        if l.get("class_name") in ("Functional", "Sequential")
    }
    if not model_names:
        return

    def fix_triple(trip):
        nm, idx, t = trip[0], trip[1], trip[2]
        if nm in model_names and isinstance(idx, int) and idx > 0:
            idx -= 1
        return [nm, idx, t] + list(trip[3:])

    def walk(obj):
        if (
            isinstance(obj, list)
            and len(obj) in (3, 4)
            and isinstance(obj[0], str)
            and isinstance(obj[1], int)
            and isinstance(obj[2], int)
            and (len(obj) == 3 or isinstance(obj[3], dict))
        ):
            out = fix_triple(obj)
            if len(out) == 4:
                out[3] = walk(out[3])
            return out
        if isinstance(obj, dict):
            if obj.get("class_name") == "__keras_tensor__":
                h = obj["config"]["keras_history"]
                return {
                    **obj,
                    "config": {**obj["config"], "keras_history": fix_triple(h)},
                }
            return {k: walk(v) for k, v in obj.items()}
        if isinstance(obj, list):
            return [walk(v) for v in obj]
        return obj

    for l in layers:
        if "inbound_nodes" in l:
            l["inbound_nodes"] = walk(l["inbound_nodes"])
    for key in ("output_layers", "input_layers"):
        if key in cfg:
            cfg[key] = walk(cfg[key])


def _normalize_node(node):
    """Normalise an inbound_nodes entry to the Keras-3 dict form.

    Keras 3 writes ``{"args": [...__keras_tensor__ refs...], "kwargs": {}}``;
    legacy Keras 2 archives (e.g. tf_keras re-saves of the reference's TF1
    morepork SavedModels) write a list of
    ``[layer_name, node_index, tensor_index, call_kwargs]`` entries."""
    if isinstance(node, dict):
        return node
    if node and isinstance(node[0], str):
        # tf_keras writes TFOpLambda/SlicingOpLambda nodes FLAT:
        # ["layer", n, t, {kwargs}] rather than a list of such entries
        node = [node]
    refs = [
        {
            "class_name": "__keras_tensor__",
            "config": {"keras_history": [e[0], e[1], e[2]]},
        }
        for e in node
    ]
    kwargs = {}
    if node and len(node[0]) > 3 and isinstance(node[0][3], dict):
        kwargs = _legacy_kwarg_refs(node[0][3])
    # multi-input layers (Add/Concatenate/...) take one list argument in
    # Keras 3 call signatures; single-input layers take the bare tensor
    args = refs if len(refs) == 1 else [refs]
    return {"args": args, "kwargs": kwargs}


def _legacy_kwarg_refs(obj):
    """Keras-2 node kwargs embed tensor references as bare
    ``[layer_name, node_idx, tensor_idx]`` lists (e.g. the ``y`` operand of
    a TFOpLambda ``__operators__.add``) — rewrite them to the Keras-3
    ``__keras_tensor__`` dict form so _collect_history/_resolve see them."""
    if (
        isinstance(obj, list)
        and len(obj) in (3, 4)
        and isinstance(obj[0], str)
        and isinstance(obj[1], int)
        and isinstance(obj[2], int)
        and (len(obj) == 3 or isinstance(obj[3], dict))
    ):
        return {
            "class_name": "__keras_tensor__",
            "config": {"keras_history": [obj[0], obj[1], obj[2]]},
        }
    if isinstance(obj, dict):
        return {k: _legacy_kwarg_refs(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_legacy_kwarg_refs(v) for v in obj]
    return obj


def _collect_history(node):
    node = _normalize_node(node)
    refs = []

    def rec(obj):
        if isinstance(obj, dict):
            if obj.get("class_name") == "__keras_tensor__":
                h = obj["config"]["keras_history"]
                refs.append((h[0], h[1], h[2]))
            else:
                for vv in obj.values():
                    rec(vv)
        elif isinstance(obj, (list, tuple)):
            for vv in obj:
                rec(vv)

    rec(node.get("args", []))
    rec(node.get("kwargs", {}))
    return refs


def _resolve_refs(obj, values):
    if isinstance(obj, dict):
        if obj.get("class_name") == "__keras_tensor__":
            h = obj["config"]["keras_history"]
            return values[(h[0], h[1], h[2])]
        if obj.get("class_name") == "__slice__":
            c = obj.get("config", {})
            return slice(c.get("start"), c.get("stop"), c.get("step"))
        if obj.get("class_name") == "__ellipsis__":
            return Ellipsis
        return {k: _resolve_refs(vv, values) for k, vv in obj.items()}
    if isinstance(obj, list):
        return [_resolve_refs(vv, values) for vv in obj]
    if isinstance(obj, tuple):
        return tuple(_resolve_refs(vv, values) for vv in obj)
    return obj


def _resolve_args(node, values):
    node = _normalize_node(node)
    return [_resolve_refs(a, values) for a in node.get("args", [])]


def _resolve_kwargs(node, values):
    node = _normalize_node(node)
    return {k: _resolve_refs(v, values) for k, v in node.get("kwargs", {}).items()}
