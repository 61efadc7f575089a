"""Embeddings-model classification path (reference:
src/identify_tracks.py:498-499 + 536-551): per-track embedding vectors ->
classifier head -> track means. The TF-Hub embedder is stubbed (no network)."""

import json
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import importlib

classify_mod = importlib.import_module("audio_analysis_tpu.pipeline.classify")

SR = 48000
EMB_DIM = 32
LABELS = ["bird", "noise"]


@pytest.fixture
def embeddings_model(tmp_path):
    d = tmp_path / "emb"
    d.mkdir()
    inp = tf.keras.Input((EMB_DIM,))
    out = tf.keras.layers.Dense(len(LABELS), activation="softmax")(inp)
    tf.keras.Model(inp, out).save(str(d / "audioModel.keras"))
    (d / "metadata.txt").write_text(
        json.dumps(
            {
                "name": "embeddings",
                "labels": LABELS,
                "segment_stride": 5,
                "threshold": 0.1,
            }
        )
    )
    return d


def test_embeddings_path(embeddings_model, monkeypatch, rng):
    def fake_chirp_embeddings(frames, sr, tracks, stride):
        r = np.random.RandomState(0)
        return [
            [r.randn(EMB_DIM).astype(np.float32) for _ in range(3)] for _ in tracks
        ]

    monkeypatch.setattr(
        "audio_analysis_tpu.pipeline.embeddings.chirp_embeddings",
        fake_chirp_embeddings,
    )

    t = np.arange(10 * SR) / SR
    y = (0.01 * rng.randn(len(t))).astype(np.float32)
    m = (t > 2) & (t < 3.2)
    phase = 2 * np.pi * (2800 * t[m] + 250 * (t[m] - 2) ** 2)
    y[m] += (0.6 * np.sin(phase)).astype(np.float32)

    tracks, length, signals, raw_length, bird_labels = classify_mod.classify_frames(
        y, SR, [str(embeddings_model)], False, None, rng=None
    )
    assert len(tracks) >= 1
    for tr in tracks:
        assert len(tr.results) == 1
        res = tr.results[0]
        assert res.model == "embeddings"
        assert res.predictions or res.raw_prediction is not None
