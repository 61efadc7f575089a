"""Classifier loading: route a model path to the right backend.

The reference loads every model through tf.keras
(src/identify_tracks.py:302-327); here a model path may be:

- a ``.keras`` archive (or a dir containing one): imported TF-free into the
  KerasModel executor;
- a native checkpoint dir (metadata.txt with ``"architecture": "tuinet"`` +
  weights.npz): the framework's own trained models;
- a native dense stack (``"architecture": "dense"``): flat-vector inputs —
  the TF-free deployment path for embeddings classifier heads (reference
  loads them through tf.keras, src/identify_tracks.py:302-327) without
  needing a .keras archive.

Every returned model is a jit'd callable ``model(x) -> probs`` over a
[n_windows, ...] feature grid.
"""

from pathlib import Path

import jax

from audio_analysis_tpu.io.modelconfig import ModelConfig

_MODEL_CACHE = {}


def _resolved_compute_dtype(cfg: ModelConfig):
    """The compute dtype a load would actually use: metadata net_dtype wins;
    otherwise AAT_KERAS_BF16 (explicit) or the AAT_FAST preset picks bf16.
    Cache-keying on the RESOLVED value (not the raw env) means a pinned
    net_dtype model — or A/B flips that resolve to the same dtype — shares
    one device-resident instance."""
    from audio_analysis_tpu.utils.runtime import env_flag, fast_mode

    cdt = (cfg.raw or {}).get("net_dtype")
    if cdt is not None:
        return str(cdt)
    bf16 = env_flag("AAT_KERAS_BF16")
    if bf16 is None:
        bf16 = fast_mode()
    return "bfloat16" if bf16 else None


class _JittedModel:
    def __init__(self, apply_fn, params):
        self.apply_fn = apply_fn  # pure (params, x) -> probs; inlines in jit
        self.params = params
        self._fn = jax.jit(apply_fn)

    def __call__(self, x):
        return self._fn(self.params, x)


def load_classifier(model_path, cfg: ModelConfig):
    """Load (and cache per path+mtime) a classifier. Caching keeps weights on
    device across recordings and gives the fused classify program a stable
    function identity to key its compile cache on."""
    model_path = Path(model_path)
    try:
        stamp = max(p.stat().st_mtime for p in model_path.rglob("*")) if model_path.is_dir() else model_path.stat().st_mtime
    except (OSError, ValueError):
        stamp = 0
    key = (
        str(model_path.resolve()),
        stamp,
        _resolved_compute_dtype(cfg),
    )
    if key in _MODEL_CACHE:
        return _MODEL_CACHE[key]
    model = _load_classifier_uncached(model_path, cfg)
    _MODEL_CACHE[key] = model
    return model


def _load_classifier_uncached(model_path, cfg: ModelConfig):
    arch = (cfg.raw or {}).get("architecture")

    if arch == "dense":
        # native dense stack over flat vectors [N, D] (embeddings heads;
        # also usable as a toy embedder). Params: list of {kernel, bias};
        # relu between layers, "output_activation" on the last (default
        # softmax, "linear" for embedders). Optional "net_pool" p first
        # mean-pools [N, S] -> [N, S//p, p] -> mean over the middle axis.
        from audio_analysis_tpu.io.checkpoint import load_checkpoint_params
        import jax.nn
        import jax.numpy as jnp

        params = load_checkpoint_params(model_path)
        raw = cfg.raw or {}
        pool = raw.get("net_pool")
        activation = raw.get("output_activation", "softmax")
        act_fn = {
            "softmax": lambda z: jax.nn.softmax(z, axis=-1),
            "sigmoid": jax.nn.sigmoid,
            "linear": lambda z: z,
        }[activation]

        def apply_dense(p, x):
            x = jnp.asarray(x, jnp.float32)
            if pool:
                x = x.reshape(x.shape[0], -1, int(pool)).mean(axis=1)
            for i, layer in enumerate(p):
                x = x @ layer["kernel"] + layer["bias"]
                if i < len(p) - 1:
                    x = jax.nn.relu(x)
            return act_fn(x)

        return _JittedModel(apply_dense, params)

    if arch == "tuinet" or (model_path.is_dir() and (model_path / "weights.npz").exists()):
        from audio_analysis_tpu.models.birdnet import TuiNet, TuiNetConfig, apply as tuinet_apply
        from audio_analysis_tpu.io.checkpoint import load_checkpoint_params

        params = load_checkpoint_params(model_path)
        raw = cfg.raw or {}
        net_cfg = TuiNetConfig(
            num_classes=len(cfg.labels) or int(raw.get("num_classes", 8)),
            n_mels=int(cfg.n_mels),
            channels=tuple(raw.get("net_channels", (64, 128, 256))),
            stem_channels=int(raw.get("net_stem_channels", 32)),
            dense_units=int(raw.get("net_dense_units", 256)),
            dtype=raw.get("net_dtype", "bfloat16"),
        )
        import jax.nn

        # output activation (metadata "output_activation"): classifiers use
        # softmax; binary heads (e.g. morepork ensemble members, reference
        # identify_morepork.py sigmoid models) use sigmoid; "linear" for raw
        activation = (cfg.raw or {}).get("output_activation", "softmax")
        act_fn = {
            "softmax": lambda z: jax.nn.softmax(z, axis=-1),
            "sigmoid": jax.nn.sigmoid,
            "linear": lambda z: z,
        }[activation]

        def apply_probs(p, x):
            return act_fn(tuinet_apply(p, x, net_cfg))

        return _JittedModel(apply_probs, params)

    # Keras archive (file or dir containing one)
    from audio_analysis_tpu.models.keras_graph import KerasModel

    # compute dtype: metadata "net_dtype" wins; AAT_KERAS_BF16=1 (or the
    # AAT_FAST preset — an explicit AAT_KERAS_BF16=0 overrides it) flips the
    # default to bfloat16 (throughput knob — float32 keeps strict parity
    # with the reference's TF runtime; bound in test_keras_import.py)
    km = KerasModel.load(model_path, compute_dtype=_resolved_compute_dtype(cfg))
    return _JittedModel(km.apply, km.params)
