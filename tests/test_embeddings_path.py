"""Embeddings-model classification path (reference:
src/identify_tracks.py:498-499 + 536-551): per-track embedding vectors ->
classifier head -> track means.

Two levels: a fake embedder injected through load_embedder (fast), and the
real thing — a local ``embedding_model`` .keras artifact named in
metadata.txt, embedded TF-free in one batched forward (the deployment path;
the TF-Hub download fallback needs network and stays untested here)."""

import json
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import importlib

classify_mod = importlib.import_module("audio_analysis_tpu.pipeline.classify")

SR = 48000
EMB_DIM = 32
EMB_SAMPLES = 5 * 32000
LABELS = ["bird", "noise"]


def _classifier_head_dir(d, extra_meta=None):
    d.mkdir(parents=True, exist_ok=True)
    tf.keras.utils.set_random_seed(5)
    inp = tf.keras.Input((EMB_DIM,))
    out = tf.keras.layers.Dense(len(LABELS), activation="softmax")(inp)
    tf.keras.Model(inp, out).save(str(d / "audioModel.keras"))
    meta = {
        "name": "embeddings",
        "labels": LABELS,
        "segment_stride": 5,
        "threshold": 0.1,
    }
    meta.update(extra_meta or {})
    (d / "metadata.txt").write_text(json.dumps(meta))
    return d


def _recording(rng):
    t = np.arange(10 * SR) / SR
    y = (0.01 * rng.randn(len(t))).astype(np.float32)
    m = (t > 2) & (t < 3.2)
    phase = 2 * np.pi * (2800 * t[m] + 250 * (t[m] - 2) ** 2)
    y[m] += (0.6 * np.sin(phase)).astype(np.float32)
    return y


def _assert_embedding_results(tracks):
    assert len(tracks) >= 1
    for tr in tracks:
        assert len(tr.results) == 1
        res = tr.results[0]
        assert res.model == "embeddings"
        assert res.predictions or res.raw_prediction is not None


def test_embeddings_path_with_fake_embedder(tmp_path, monkeypatch, rng):
    model_dir = _classifier_head_dir(tmp_path / "emb")

    def fake_load_embedder(path=None):
        def embed(batch):
            n = batch.shape[0]
            emb = batch.reshape(n, -1, EMB_DIM).mean(axis=1)
            return np.zeros((n, 4), np.float32), emb.astype(np.float32)

        return embed

    # classify does a call-time `from ...embeddings import load_embedder`,
    # so patching the module attribute is sufficient
    monkeypatch.setattr(
        "audio_analysis_tpu.pipeline.embeddings.load_embedder",
        fake_load_embedder,
    )

    tracks, *_ = classify_mod.classify_frames(
        _recording(rng), SR, [str(model_dir)], False, None, rng=None
    )
    _assert_embedding_results(tracks)


def test_embeddings_path_local_keras_embedder(tmp_path, rng):
    """The full deployment path: metadata names a local .keras embedder;
    embedding + classification run TF-free end-to-end."""
    emb_path = tmp_path / "embedder.keras"
    tf.keras.utils.set_random_seed(6)
    inp = tf.keras.Input((EMB_SAMPLES,))
    x = tf.keras.layers.Reshape((EMB_SAMPLES // EMB_DIM, EMB_DIM))(inp)
    x = tf.keras.layers.GlobalAveragePooling1D()(x)
    logits = tf.keras.layers.Dense(8, name="logits")(x)
    emb = tf.keras.layers.Dense(EMB_DIM, name="embedding")(x)
    tf.keras.Model(inp, [logits, emb]).save(str(emb_path))

    model_dir = _classifier_head_dir(
        tmp_path / "emb", extra_meta={"embedding_model": str(emb_path)}
    )
    tracks, *_ = classify_mod.classify_frames(
        _recording(rng), SR, [str(model_dir)], False, None, rng=None
    )
    _assert_embedding_results(tracks)


def test_load_embedder_missing():
    from audio_analysis_tpu.pipeline.embeddings import load_embedder

    with pytest.raises(FileNotFoundError):
        load_embedder("/nonexistent/embedder")
