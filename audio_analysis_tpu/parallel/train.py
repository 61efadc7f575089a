"""Sharded training for the native classifier.

The reference repo ships no training code (SURVEY.md: inference-only); this
module gives the framework a first-class training path so natively trained
checkpoints exist end-to-end. One jit'd step fuses frontend + forward +
backward; shardings:

- batch (PCM windows + labels) along the mesh's ``data`` axis — DP, which for
  this workload is also the window/sequence axis (SP);
- TuiNet's dense head along ``model`` (TP): head matmuls become sharded
  dot_generals and XLA inserts the psum over activations.

BatchNorm batch statistics are all-reduced across 'data' implicitly by
computing them inside the sharded program (XLA turns the full-batch mean into
a psum); the train step EMAs the returned batch stats into the running
``bn.mean/var`` (Keras-compatible momentum 0.99) so inference-mode forwards
on natively trained checkpoints see real statistics, and weight decay is
masked to kernels only so the running stats / biases / gamma / beta are
never decayed.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from audio_analysis_tpu.models.birdnet import TuiNetConfig, init_params, apply
from audio_analysis_tpu.models.magtransform import mag_transform_apply_constraint
from audio_analysis_tpu.pipeline.frontend import spectrogram_grid


def loss_fn(params, pcm, labels, cfg: TuiNetConfig, sr: int, hop_length: int):
    feats = spectrogram_grid(
        pcm,
        sr=sr,
        hop_length=hop_length,
        n_fft=4096,
        n_mels=cfg.n_mels,
        mel_break=1750.0,
        htk=True,
        power=2.0,
        db_scale=True,
        normalize=True,
    )
    logits, bn_stats = apply(params, feats, cfg, training=True, with_stats=True)
    logp = jax.nn.log_softmax(logits)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()
    acc = jnp.mean(jnp.argmax(logits, axis=1) == labels)
    return nll, (acc, bn_stats)


BN_MOMENTUM = 0.99  # Keras BatchNormalization default


def _decay_mask(params):
    """Weight decay applies to conv/dense kernels only — not biases, not
    BatchNorm gamma/beta, and critically not the running mean/var (adamw
    would otherwise decay zero-gradient running stats toward 0)."""

    def mask_one(path, _leaf):
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        leaf_name = name.rsplit("/", 1)[-1]
        return leaf_name in ("w", "w1", "w2") and "bn" not in name

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    return jax.tree_util.tree_unflatten(
        treedef, [mask_one(path, leaf) for path, leaf in flat]
    )


def make_optimizer(lr=1e-3, weight_decay=1e-4, params=None):
    mask = _decay_mask(params) if params is not None else None
    return optax.adamw(lr, weight_decay=weight_decay, mask=mask)


def _ema_bn_stats(params, bn_stats, momentum=BN_MOMENTUM):
    """EMA the batch statistics into the running bn.mean/var."""
    params = dict(params)
    blocks = []
    for blk, stats in zip(params["blocks"], bn_stats):
        blk = dict(blk)
        for key in ("bn1", "bn2"):
            bn = dict(blk[key])
            s = stats[key]
            bn["mean"] = momentum * bn["mean"] + (1.0 - momentum) * s["mean"]
            bn["var"] = momentum * bn["var"] + (1.0 - momentum) * s["var"]
            blk[key] = bn
        blocks.append(blk)
    params["blocks"] = blocks
    return params


def param_shardings(params, mesh):
    """TP plan: dense-head kernels shard their output/input feature axis
    along 'model'; everything else replicates."""

    def shard_one(path, leaf):
        name = "/".join(str(p) for p in path)
        if "head/w1" in name:
            return NamedSharding(mesh, P(None, "model"))
        if "head/w2" in name:
            return NamedSharding(mesh, P("model", None))
        if "head/b1" in name:
            return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    shardings = [shard_one([getattr(k, "key", getattr(k, "idx", k)) for k in path], leaf) for path, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, shardings)


def make_train_step(
    cfg: TuiNetConfig, optimizer, sr=48000, hop_length=640, bn_momentum=BN_MOMENTUM
):
    def train_step(params, opt_state, pcm, labels):
        (loss, (acc, bn_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, pcm, labels, cfg, sr, hop_length
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = _ema_bn_stats(params, bn_stats, momentum=bn_momentum)
        # MagTransform v2 constraint (train-time, reference magtransformv2.py)
        params = dict(params)
        params["mag_a"] = mag_transform_apply_constraint(params["mag_a"])
        return params, opt_state, loss, acc

    return train_step


def build_sharded_train(
    mesh,
    cfg: TuiNetConfig,
    sr=48000,
    hop_length=640,
    lr=1e-3,
    seed=0,
    bn_momentum=BN_MOMENTUM,
):
    """Init params/optimizer on the mesh and return (params, opt_state, jit_step).

    jit_step's inputs: pcm [B, sample] sharded ('data',), labels [B]
    sharded ('data',); params/opt_state carry the TP plan.
    """
    params = init_params(jax.random.PRNGKey(seed), cfg)
    optimizer = make_optimizer(lr, params=params)
    p_shard = param_shardings(params, mesh)
    params = jax.device_put(params, p_shard)
    opt_state = optimizer.init(params)

    data_s = NamedSharding(mesh, P("data"))
    data_s2 = NamedSharding(mesh, P("data", None))
    step = make_train_step(
        cfg, optimizer, sr=sr, hop_length=hop_length, bn_momentum=bn_momentum
    )
    jit_step = jax.jit(
        step,
        in_shardings=(p_shard, None, data_s2, data_s),
        out_shardings=(p_shard, None, None, None),
        donate_argnums=(0, 1),
    )
    return params, opt_state, jit_step
