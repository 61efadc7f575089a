"""TuiNet: the framework's native JAX bird classifier.

The reference's released classifiers are small Keras CNNs over
[n_mels, time, 1] mel windows with a MagTransform frontend (reference:
src/identify_tracks.py:302-327, 26-40). TuiNet is this framework's
from-scratch equivalent, designed for the MXU: channel widths in
{64,128,256}, 3x3 convs, bfloat16-friendly, one fused forward over the whole
window grid. Plain functional JAX (explicit params pytree) so pjit sharding
annotations attach cleanly.
"""

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from audio_analysis_tpu.models import layers as L
from audio_analysis_tpu.models.magtransform import mag_transform


@dataclass(frozen=True)
class TuiNetConfig:
    num_classes: int = 8
    n_mels: int = 160
    time_steps: int = 226  # 3 s at 48 kHz / hop 640 -> 1 + 144000//640
    channels: tuple = (64, 128, 256)
    stem_channels: int = 32
    dense_units: int = 256
    dtype: str = "bfloat16"  # compute dtype; params stay float32


# keep the old name importable
BirdNetConfig = TuiNetConfig


def _conv_init(key, shape):
    fan_in = shape[0] * shape[1] * shape[2]
    return jax.random.normal(key, shape, jnp.float32) * np.sqrt(2.0 / fan_in)


def init_params(key, cfg: TuiNetConfig):
    """Build the parameter pytree."""
    params = {"mag_a": jnp.array([-1.0], jnp.float32)}
    keys = jax.random.split(key, 3 + 2 * len(cfg.channels))
    k = iter(keys)
    c_in = 1
    params["stem"] = {
        "w": _conv_init(next(k), (3, 3, c_in, cfg.stem_channels)),
        "b": jnp.zeros(cfg.stem_channels),
    }
    c_in = cfg.stem_channels
    blocks = []
    for c_out in cfg.channels:
        blocks.append(
            {
                "w1": _conv_init(next(k), (3, 3, c_in, c_out)),
                "bn1": _bn_init(c_out),
                "w2": _conv_init(next(k), (3, 3, c_out, c_out)),
                "bn2": _bn_init(c_out),
            }
        )
        c_in = c_out
    params["blocks"] = blocks
    params["head"] = {
        "w1": jax.random.normal(next(k), (c_in, cfg.dense_units), jnp.float32)
        * np.sqrt(2.0 / c_in),
        "b1": jnp.zeros(cfg.dense_units),
        "w2": jax.random.normal(next(k), (cfg.dense_units, cfg.num_classes), jnp.float32)
        * np.sqrt(1.0 / cfg.dense_units),
        "b2": jnp.zeros(cfg.num_classes),
    }
    return params


def _bn_init(c):
    return {
        "gamma": jnp.ones(c),
        "beta": jnp.zeros(c),
        "mean": jnp.zeros(c),
        "var": jnp.ones(c),
    }


def _bn_apply(x, bn, training=False):
    """Returns (normalised x, batch stats dict or None).

    In training mode normalisation uses the batch statistics (mean/var over
    N,H,W — under pjit the full-batch mean becomes an XLA psum across the
    'data' axis), and the stats are returned so the train step can EMA them
    into the running ``bn["mean"]/bn["var"]`` used at inference
    (Keras-compatible momentum, see parallel/train.py::BN_MOMENTUM)."""
    if training:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
        stats = {"mean": jax.lax.stop_gradient(mean), "var": jax.lax.stop_gradient(var)}
    else:
        mean, var = bn["mean"], bn["var"]
        stats = None
    return L.batch_norm(x, mean, var, bn["gamma"], bn["beta"], eps=1e-3), stats


def apply(params, x, cfg: TuiNetConfig, training: bool = False, with_stats: bool = False):
    """Forward pass: x [B, n_mels, T, 1] -> logits [B, num_classes].

    Internals run in cfg.dtype (bfloat16 on TPU) with float32 head, the
    standard MXU recipe. With ``with_stats=True`` (training only) returns
    ``(logits, bn_stats)`` where bn_stats mirrors the ``blocks[i]["bn1"/"bn2"]``
    structure with per-layer batch mean/var.
    """
    dt = jnp.dtype(cfg.dtype)
    y = mag_transform(jnp.maximum(x, 0.0), params["mag_a"])
    y = y.astype(dt)
    y = L.conv2d(y, params["stem"]["w"].astype(dt), params["stem"]["b"].astype(dt), strides=(2, 2))
    y = jax.nn.relu(y)
    bn_stats = []
    for blk in params["blocks"]:
        y = L.conv2d(y, blk["w1"].astype(dt), None)
        y, s1 = _bn_apply(y.astype(jnp.float32), blk["bn1"], training)
        y = jax.nn.relu(y.astype(dt))
        y = L.conv2d(y, blk["w2"].astype(dt), None)
        y, s2 = _bn_apply(y.astype(jnp.float32), blk["bn2"], training)
        y = jax.nn.relu(y.astype(dt))
        y = L.max_pool2d(y, (2, 2), (2, 2), "SAME")
        bn_stats.append({"bn1": s1, "bn2": s2})
    y = L.global_avg_pool2d(y.astype(jnp.float32))
    y = jax.nn.relu(L.dense(y, params["head"]["w1"], params["head"]["b1"]))
    logits = L.dense(y, params["head"]["w2"], params["head"]["b2"])
    if with_stats:
        return logits, bn_stats
    return logits


class BirdNet:
    """Object wrapper pairing a config with params (mirrors KerasModel API)."""

    def __init__(self, cfg: TuiNetConfig, params=None, seed=0):
        self.cfg = cfg
        self.params = params if params is not None else init_params(
            jax.random.PRNGKey(seed), cfg
        )

    def __call__(self, x):
        return self.apply(self.params, x)

    def apply(self, params, x, training=False):
        return apply(params, x, self.cfg, training)


TuiNet = BirdNet
