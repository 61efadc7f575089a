"""Fine-tune imported ``.keras`` checkpoints natively on TPU.

The reference ships no training code at all (SURVEY.md §2) and its users
fine-tune released Cacophony classifiers in TF. This module closes that
loop TPU-natively: take any checkpoint the importer can execute
(models/keras_graph.py), run sharded training steps against it, EMA the
BatchNorm running statistics, and hand the updated weights to
io/keras_export.write_keras_archive — producing a ``.keras`` artifact the
reference's own TF loader (and our TF-free importer) reads back.

Design notes (TPU-first):
- one jit'd step: forward (batch-stat BN + live dropout via
  KerasModel.apply_train) + backward + adamw + BN EMA, all fused;
- data parallel over a mesh 'data' axis (features and labels sharded,
  parameters replicated); XLA inserts the psum for the gradients and the
  full-batch BN statistics;
- frozen leaves (BN running stats, Normalization stats) receive exactly
  zero adam updates because their gradients are structurally zero in
  training mode and weight decay is masked to trainable kernels — the same
  scheme parallel/train.py uses for the native models.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

BN_MOMENTUM = 0.99  # Keras BatchNormalization default


def non_trainable_mask(km):
    """{weight_key: [bool per var]} — True marks leaves that must not
    train: BatchNorm running mean/var (the last two vars) and Normalization
    statistics (all vars). Matches km.params' structure."""
    frozen_rules = {}
    for key, cls, cfg in km.walk_layers():
        if cls == "BatchNormalization":
            frozen_rules[key] = "bn"
        elif cls == "Normalization":
            frozen_rules[key] = "all"
    mask = {}
    for key, vs in km.params.items():
        rule = frozen_rules.get(key)
        if rule == "all":
            mask[key] = [True] * len(vs)
        elif rule == "bn":
            mask[key] = [False] * (len(vs) - 2) + [True, True]
        else:
            mask[key] = [False] * len(vs)
    return mask


def decay_mask(km):
    """Weight decay on trainable kernels (ndim >= 2) only — never biases,
    gamma/beta, or the frozen statistics (adamw would decay the
    zero-gradient running stats toward 0)."""
    frozen = non_trainable_mask(km)
    return {
        key: [(v.ndim >= 2) and not fz for v, fz in zip(vs, frozen[key])]
        for key, vs in km.params.items()
    }


# layers that pass their single input through unchanged shape-wise — safe to
# trace through when walking back from the output spec to the head Dense
_PASS_THROUGH = {"Activation", "Softmax", "Dropout", "AlphaDropout", "Reshape",
                 "Flatten", "Identity"}


def _head_from_output(km):
    """Resolve the classification head by tracing the model's output spec
    backwards through pass-through wrappers to a Dense layer. Returns
    (weight_key, layer_config) or None when the output graph shape is not
    one we can follow (multi-output, Sequential, non-Dense tail)."""
    from audio_analysis_tpu.models.keras_graph import _collect_history

    spec = getattr(km, "_output_spec", None)
    if not spec or len(spec) != 1:
        return None
    name = spec[0][0]
    for _ in range(8):
        layer = km._by_name.get(name)
        if layer is None:
            return None
        cls = layer["class_name"]
        if cls == "Dense":
            return km._prefix + km._h5key[name], layer["config"]
        if cls not in _PASS_THROUGH:
            return None
        nodes = layer.get("inbound_nodes", [])
        if len(nodes) != 1:
            return None
        refs = _collect_history(nodes[0])
        if len(refs) != 1:
            return None
        name = refs[0][0]
    return None


def replace_head(km, num_classes, seed=0):
    """Re-initialise the final Dense layer for a new label space (transfer
    learning): Glorot-uniform kernel [in, num_classes], zero bias. Mutates
    km.params and the layer config (units) so an exported archive carries a
    consistent graph. Returns the head's weight key.

    The head is the Dense feeding the model's output spec; when that can't
    be traced (Sequential, unusual tail) fall back to the last Dense in
    config order, warning if the choice is ambiguous."""
    import logging

    head = _head_from_output(km)
    if head is None:
        denses = [(key, cfg) for key, cls, cfg in km.walk_layers() if cls == "Dense"]
        if not denses:
            raise ValueError("model has no Dense layer to act as the head")
        if len(denses) > 1:
            logging.warning(
                "could not trace the output head; %d Dense layers found, "
                "replacing the last in config order (%s)",
                len(denses),
                denses[-1][0],
            )
        head = denses[-1]
    key, cfg = head
    vs = km.params[key]
    fan_in = vs[0].shape[0]
    limit = float(np.sqrt(6.0 / (fan_in + num_classes)))
    rng = np.random.RandomState(seed)
    w = jnp.asarray(
        rng.uniform(-limit, limit, (fan_in, num_classes)).astype(np.float32)
    )
    new = [w]
    if len(vs) > 1:  # use_bias
        new.append(jnp.zeros((num_classes,), jnp.float32))
    km.params[key] = new
    cfg["units"] = int(num_classes)
    return key


def build_finetune(
    km,
    mesh=None,
    lr=1e-4,
    weight_decay=1e-4,
    bn_momentum=BN_MOMENTUM,
    outputs="probs",
    feats_ndim=4,
):
    """Return (params, opt_state, jit_step) for fine-tuning `km`.

    jit_step(params, opt_state, feats, labels, rng) -> (params, opt_state,
    loss, acc). `feats` is the model-input feature grid (e.g. mel windows
    [B, n_mels, T, C]); build it with pipeline.frontend.spectrogram_grid
    using the model's metadata. `outputs`: "probs" when the model ends in
    softmax (every released classifier), "logits" otherwise.
    """
    params = km.params

    # Integer variables (e.g. the adapted Normalization layer's `count`)
    # cannot be differentiated — split them out as step constants; None is
    # an empty pytree subtree, so the float structure stays consistent
    # across params / grads / optimizer state / masks.
    def _is_float(a):
        return jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)

    def _split_floats(p):
        fl = {k: [a if _is_float(a) else None for a in v] for k, v in p.items()}
        il = {k: [None if _is_float(a) else a for a in v] for k, v in p.items()}
        return fl, il

    def _merge(fl, il):
        return {
            k: [a if a is not None else b for a, b in zip(fl[k], il[k])] for k in fl
        }

    def _float_structured(mask):
        return {
            k: [m if _is_float(a) else None for m, a in zip(mask[k], params[k])]
            for k in mask
        }

    optimizer = optax.adamw(
        lr, weight_decay=weight_decay, mask=_float_structured(decay_mask(km))
    )
    frozen = _float_structured(non_trainable_mask(km))
    _, int_leaves = _split_floats(params)

    def loss_fn(pf, feats, labels, rng):
        out, bn_stats = km.apply_train(_merge(pf, int_leaves), feats, rng)
        if outputs == "probs":
            logp = jnp.log(jnp.clip(out, 1e-9, 1.0))
        else:
            logp = jax.nn.log_softmax(out)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()
        acc = jnp.mean(jnp.argmax(logp, axis=1) == labels)
        return nll, (acc, bn_stats)

    def step(p, opt_state, feats, labels, rng):
        pf, pi = _split_floats(p)
        (loss, (acc, bn_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            pf, feats, labels, rng
        )
        updates, opt_state = optimizer.update(grads, opt_state, pf)
        # hard-freeze the statistics: Normalization stats sit in the live
        # forward path, so their gradients are NOT structurally zero — the
        # EMA (BN) / nothing (Normalization) is their only legal update
        updates = {
            key: [
                None if u is None else (jnp.zeros_like(u) if fz else u)
                for u, fz in zip(us, frozen[key])
            ]
            for key, us in updates.items()
        }
        pf = optax.apply_updates(pf, updates)
        for key, (bm, bv) in bn_stats.items():
            vs = list(pf[key])
            vs[-2] = bn_momentum * vs[-2] + (1.0 - bn_momentum) * bm
            vs[-1] = bn_momentum * vs[-1] + (1.0 - bn_momentum) * bv
            pf[key] = vs
        return _merge(pf, pi), opt_state, loss, acc

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data2 = NamedSharding(mesh, P("data", *([None] * (feats_ndim - 1))))
        data1 = NamedSharding(mesh, P("data"))
        params = jax.device_put(params, jax.tree_util.tree_map(lambda _: repl, params))
        opt_state = optimizer.init(_split_floats(params)[0])
        jit_step = jax.jit(
            step,
            in_shardings=(
                jax.tree_util.tree_map(lambda _: repl, params),
                None,
                data2,
                data1,
                None,
            ),
            donate_argnums=(0, 1),
        )
    else:
        # fresh buffers: jit donates argument 0, and donating km.params'
        # own arrays would leave the model holding deleted buffers after
        # the first step (real-TPU donation; the CPU test backend ignores
        # donation, which would mask the bug)
        params = jax.tree_util.tree_map(jnp.array, params)
        opt_state = optimizer.init(_split_floats(params)[0])
        jit_step = jax.jit(step, donate_argnums=(0, 1))
    return params, opt_state, jit_step
