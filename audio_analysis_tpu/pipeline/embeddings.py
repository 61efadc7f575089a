"""Embedding-model support (``name == "embeddings"`` configs).

The reference embeds 5 s / 32 kHz track windows with Google's TF-Hub
bird-vocalization-classifier and classifies the embedding vectors with the
model group's own classifier (reference: src/identify_tracks.py:330-384,
498-499). This framework makes the embedder pluggable via the model's
``metadata.txt``:

- ``"embedding_model": <path>`` — a LOCAL embedder artifact: a converted
  ``.keras`` archive (runs TF-free on TPU through models/keras_graph — the
  recommended deployment: convert the released SavedModel once with
  tools/convert_model.py), a SavedModel dir (auto-converted, with an opaque
  host-TF fallback for non-Keras graphs), or a native checkpoint dir.
- absent — fall back to downloading the TF-Hub handle at runtime (requires
  tensorflow_hub, declared as the ``[hub]`` extra; needs network).

Unlike the reference's per-window Python loop, every window of every track
is embedded in ONE batched forward pass.
"""

from pathlib import Path

import numpy as np

HUB_HANDLE = "https://tfhub.dev/google/bird-vocalization-classifier/1"
EMBED_SR = 32000


def get_chirp_samples(rec_data, tracks, sr=32000, stride=1, length=5):
    """Per-track fixed-length windows for embedding models
    (reference: src/identify_tracks.py:330-350)."""
    samples = []
    sr_length = int(length * sr)
    sr_stride = stride * sr
    for track in tracks:
        track_samples = []
        start = int(track.start * sr)
        while True:
            end = start + sr_length
            s = rec_data[start:end]
            if len(s) < length * sr:
                s = np.pad(s, (0, int(length * sr - len(s))))
            start += sr_stride
            track_samples.append(s)
            if end / sr > track.end:
                break
        samples.append(track_samples)
    return samples


def _embedding_output(out):
    """The embedder contract returns (logits, embedding) — reference
    model.infer_tf (src/identify_tracks.py:363); single-output models are
    treated as returning the embedding directly."""
    if isinstance(out, (list, tuple)):
        return np.asarray(out[1])
    return np.asarray(out)


class _HubEmbedder:
    def __init__(self):
        try:
            import tensorflow_hub as hub
        except ImportError as e:
            raise RuntimeError(
                "no 'embedding_model' path in metadata.txt and tensorflow_hub "
                "is not installed; either convert the bird-vocalization-"
                "classifier SavedModel with tools/convert_model.py and set "
                '"embedding_model", or pip install audio-analysis-tpu[hub]'
            ) from e
        self._model = hub.load(HUB_HANDLE)

    def __call__(self, batch):
        logits, embedding = self._model.infer_tf(np.asarray(batch))
        return np.asarray(logits), np.asarray(embedding)


_EMBEDDER_CACHE = {}


def _jitted_keras(target):
    """Load a .keras embedder as ONE jitted program, cached per path+mtime.
    A raw KerasModel executes eagerly (one device dispatch per layer — fatal
    over the RPC tunnel) and would re-read the archive per recording."""
    from audio_analysis_tpu.models.keras_graph import KerasModel
    from audio_analysis_tpu.models.registry import _JittedModel

    target = Path(target).resolve()
    key = (str(target), target.stat().st_mtime)
    if key not in _EMBEDDER_CACHE:
        km = KerasModel.load(target)
        _EMBEDDER_CACHE[key] = _JittedModel(km.apply, km.params)
    return _EMBEDDER_CACHE[key]


def load_embedder(path=None):
    """Resolve an embedder callable: batch [N, samples] -> (logits, emb) or
    emb-only. See module docstring for accepted artifacts."""
    if path is None:
        return _HubEmbedder()
    p = Path(path)
    if p.is_file() and p.suffix == ".keras" or (p.is_dir() and list(p.glob("*.keras"))):
        target = p if p.is_file() else next(iter(sorted(p.glob("*.keras"))))
        return _jitted_keras(target)
    if (p / "saved_model.pb").exists():
        from audio_analysis_tpu.io.convert import (
            ConversionError,
            HostSavedModel,
            auto_convert_saved_model,
        )

        try:
            converted = auto_convert_saved_model(p)
        except ConversionError:
            return HostSavedModel(p)
        return _jitted_keras(converted / "audioModel.keras")
    if (p / "weights.npz").exists():
        from audio_analysis_tpu.io.modelconfig import ModelConfig
        from audio_analysis_tpu.models.registry import load_classifier

        try:
            cfg = ModelConfig.load(p)
        except FileNotFoundError:
            cfg = ModelConfig.from_meta({}, p)
        return load_classifier(p, cfg)
    raise FileNotFoundError(f"no embedder artifact at {path}")


def chirp_embeddings(frames, sr, tracks, stride=5, embedder=None):
    """Per-track embedding vectors (reference: src/identify_tracks.py:353-368).

    `embedder`: a callable from load_embedder(); defaults to the TF-Hub
    download path. All windows are embedded in one batched call.
    """
    from audio_analysis_tpu.ops.resample import resample

    if embedder is None:
        embedder = _HubEmbedder()
    frames = np.asarray(frames)
    if frames.dtype == np.int16:  # the prefer_int16 decode fast path
        frames = frames.astype(np.float32) / 32768.0
    rec_data = np.asarray(resample(frames, sr, EMBED_SR))
    samples = get_chirp_samples(rec_data, tracks, sr=EMBED_SR, stride=stride)
    counts = [len(t) for t in samples]
    if sum(counts) == 0:
        return [[] for _ in samples]
    batch = np.stack([s for t in samples for s in t]).astype(np.float32)
    emb = _embedding_output(embedder(batch))
    out = []
    offset = 0
    for c in counts:
        out.append([emb[offset + i] for i in range(c)])
        offset += c
    return out
