"""Functional JAX layer ops with Keras/TF semantics (NHWC).

These back both the Keras-graph executor (imported checkpoints; reference
loads them via the TF runtime at src/identify_tracks.py:320-322) and the
native models. Every op is shape-static and jit-safe; convs/matmuls hit the
MXU via lax.conv_general_dilated / dot_general.
"""

import jax
import jax.numpy as jnp
import numpy as np

_DN = ("NHWC", "HWIO", "NHWC")


# ---------------------------------------------------------------------------
# activations (Keras names)
# ---------------------------------------------------------------------------


def _hard_sigmoid_k2(x):
    # Keras 2 (tf_keras) semantics: clip(0.2x + 0.5, 0, 1). Keras 3 changed
    # the definition to relu6(x + 3)/6 (= jax.nn.hard_sigmoid) — archives
    # must be executed with the semantics of the Keras that SAVED them.
    return jnp.clip(0.2 * x + 0.5, 0.0, 1.0)


def activation(name, keras2=False):
    """Resolve a Keras activation string. ``keras2`` selects Keras-2
    semantics where the two generations disagree (hard_sigmoid, and
    everything derived from it)."""
    if name is None or name == "linear":
        return lambda x: x
    hard_sig = _hard_sigmoid_k2 if keras2 else jax.nn.hard_sigmoid
    table = {
        "relu": jax.nn.relu,
        "relu6": lambda x: jnp.clip(x, 0, 6),
        "sigmoid": jax.nn.sigmoid,
        "tanh": jnp.tanh,
        "softmax": lambda x: jax.nn.softmax(x, axis=-1),
        "swish": jax.nn.silu,
        "silu": jax.nn.silu,
        # keras.activations.gelu defaults to approximate=False (exact erf)
        # in BOTH generations; jax.nn.gelu defaults to the tanh approximation
        "gelu": lambda x: jax.nn.gelu(x, approximate=False),
        "elu": jax.nn.elu,
        "selu": jax.nn.selu,
        "softplus": jax.nn.softplus,
        "exponential": jnp.exp,
        "hard_sigmoid": hard_sig,
        "hard_swish": lambda x: x * hard_sig(x),
        "hard_silu": lambda x: x * hard_sig(x),
        "leaky_relu": lambda x: jax.nn.leaky_relu(x, 0.3),  # Keras alpha default
        "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    }
    if name not in table:
        raise ValueError(f"unsupported activation {name!r}")
    return table[name]


# ---------------------------------------------------------------------------
# conv / dense
# ---------------------------------------------------------------------------


def conv2d(x, kernel, bias=None, strides=(1, 1), padding="SAME", dilation=(1, 1), groups=1):
    """Keras Conv2D: x NHWC, kernel HWIO (TF layout, imported unchanged)."""
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=tuple(strides),
        padding=padding.upper() if isinstance(padding, str) else padding,
        rhs_dilation=tuple(dilation),
        feature_group_count=groups,
        dimension_numbers=_DN,
    )
    if bias is not None:
        y = y + bias
    return y


def depthwise_conv2d(x, kernel, bias=None, strides=(1, 1), padding="SAME", dilation=(1, 1)):
    """Keras DepthwiseConv2D: kernel (h, w, C, mult) -> grouped conv."""
    h, w, c, mult = kernel.shape
    k = kernel.reshape(h, w, 1, c * mult)
    y = jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=tuple(strides),
        padding=padding.upper() if isinstance(padding, str) else padding,
        rhs_dilation=tuple(dilation),
        feature_group_count=c,
        dimension_numbers=_DN,
    )
    if bias is not None:
        y = y + bias
    return y


_DN1 = ("NWC", "WIO", "NWC")


def conv1d(x, kernel, bias=None, strides=1, padding="SAME", dilation=1, groups=1):
    """Keras Conv1D: x NWC, kernel WIO. ``padding='causal'`` left-pads by
    dilation*(k-1) (TF semantics) then runs VALID."""
    if isinstance(padding, str) and padding.lower() == "causal":
        pad = int(dilation) * (kernel.shape[0] - 1)
        x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
        padding = "VALID"
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(int(strides),),
        padding=padding.upper() if isinstance(padding, str) else padding,
        rhs_dilation=(int(dilation),),
        feature_group_count=groups,
        dimension_numbers=_DN1,
    )
    if bias is not None:
        y = y + bias
    return y


def depthwise_conv1d(x, kernel, bias=None, strides=1, padding="SAME", dilation=1):
    """Keras DepthwiseConv1D: kernel (w, C, mult) -> grouped conv."""
    w, c, mult = kernel.shape
    k = kernel.reshape(w, 1, c * mult)
    y = jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=(int(strides),),
        padding=padding.upper() if isinstance(padding, str) else padding,
        rhs_dilation=(int(dilation),),
        feature_group_count=c,
        dimension_numbers=_DN1,
    )
    if bias is not None:
        y = y + bias
    return y


def conv2d_transpose(x, kernel, bias=None, strides=(2, 2), padding="SAME", dilation=(1, 1)):
    """Keras Conv2DTranspose: TF kernel layout (h, w, out_ch, in_ch).

    lax.conv_transpose with transpose_kernel=True expects the FORWARD-conv
    kernel (HWIO with I=this op's output channels) and flips spatial dims +
    swaps I/O itself — exactly the TF gradient-of-conv semantics Keras uses,
    so TF's (h, w, O, I) maps to HWIO=(h, w, O, I) read as (h, w, "I", "O").
    """
    y = jax.lax.conv_transpose(
        x,
        kernel,
        strides=tuple(strides),
        padding=padding.upper() if isinstance(padding, str) else padding,
        rhs_dilation=tuple(dilation),
        dimension_numbers=_DN,
        transpose_kernel=True,
    )
    if bias is not None:
        y = y + bias
    return y


def conv1d_transpose(x, kernel, bias=None, strides=2, padding="SAME", dilation=1):
    """Keras Conv1DTranspose: TF kernel layout (w, out_ch, in_ch)."""
    y = jax.lax.conv_transpose(
        x,
        kernel,
        strides=(int(strides),),
        padding=padding.upper() if isinstance(padding, str) else padding,
        rhs_dilation=(int(dilation),),
        dimension_numbers=_DN1,
        transpose_kernel=True,
    )
    if bias is not None:
        y = y + bias
    return y


def dense(x, kernel, bias=None):
    y = jnp.dot(x, kernel, preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias
    return y


def batch_norm(x, mean, var, gamma=None, beta=None, eps=1e-3, axis=-1):
    """Inference-mode BatchNormalization (Keras eps default 1e-3)."""
    shape = [1] * x.ndim
    shape[axis] = x.shape[axis]
    inv = jax.lax.rsqrt(var.reshape(shape) + eps)
    y = (x - mean.reshape(shape)) * inv
    if gamma is not None:
        y = y * gamma.reshape(shape)
    if beta is not None:
        y = y + beta.reshape(shape)
    return y


# ---------------------------------------------------------------------------
# pooling
# ---------------------------------------------------------------------------


def max_pool2d(x, pool_size=(2, 2), strides=None, padding="VALID"):
    strides = tuple(strides or pool_size)
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1,) + tuple(pool_size) + (1,),
        (1,) + strides + (1,),
        padding.upper(),
    )


def avg_pool2d(x, pool_size=(2, 2), strides=None, padding="VALID"):
    """TF semantics: SAME padding excludes padded cells from the mean."""
    strides = tuple(strides or pool_size)
    window = (1,) + tuple(pool_size) + (1,)
    strides4 = (1,) + strides + (1,)
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides4, padding.upper())
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, window, strides4, padding.upper())
    return s / counts


def max_pool1d(x, pool_size=2, strides=None, padding="VALID"):
    strides = int(strides or pool_size)
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, int(pool_size), 1),
        (1, strides, 1),
        padding.upper(),
    )


def avg_pool1d(x, pool_size=2, strides=None, padding="VALID"):
    """TF semantics: SAME padding excludes padded cells from the mean."""
    strides = int(strides or pool_size)
    window = (1, int(pool_size), 1)
    strides3 = (1, strides, 1)
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides3, padding.upper())
    ones = jnp.ones(x.shape[1:2], x.dtype)[None, :, None]
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, window, strides3, padding.upper())
    return s / counts


def global_avg_pool2d(x, keepdims=False):
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)


def global_max_pool2d(x, keepdims=False):
    return jnp.max(x, axis=(1, 2), keepdims=keepdims)


# ---------------------------------------------------------------------------
# shape ops
# ---------------------------------------------------------------------------


def zero_padding2d(x, padding=((1, 1), (1, 1))):
    (pt, pb), (pl, pr) = padding
    return jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))


def cropping2d(x, cropping=((0, 0), (0, 0))):
    (ct, cb), (cl, cr) = cropping
    h, w = x.shape[1], x.shape[2]
    return x[:, ct : h - cb or None, cl : w - cr or None, :]


def up_sampling2d(x, size=(2, 2), interpolation="nearest"):
    n, h, w, c = x.shape
    if interpolation == "nearest":
        return jnp.repeat(jnp.repeat(x, size[0], axis=1), size[1], axis=2)
    return jax.image.resize(x, (n, h * size[0], w * size[1], c), method=interpolation)


def resize_with_pad(x, target_h, target_w):
    """tf.image.resize_with_pad semantics (used by the reference's MFCC
    concat, src/identify_tracks.py:279): scale preserving aspect ratio then
    centre-pad with zeros."""
    h, w = x.shape[-3], x.shape[-2]
    scale = min(target_h / h, target_w / w)
    new_h = max(1, int(h * scale))
    new_w = max(1, int(w * scale))
    resized = jax.image.resize(
        x, x.shape[:-3] + (new_h, new_w, x.shape[-1]), method="bilinear"
    )
    pad_top = (target_h - new_h) // 2
    pad_left = (target_w - new_w) // 2
    pads = [(0, 0)] * (x.ndim - 3) + [
        (pad_top, target_h - new_h - pad_top),
        (pad_left, target_w - new_w - pad_left),
        (0, 0),
    ]
    return jnp.pad(resized, pads)
