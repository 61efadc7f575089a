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


# ---------------------------------------------------------------------------
# batch serving (round 4): BatchAnalyzer handles embeddings groups
# ---------------------------------------------------------------------------


def _local_embedder(tmp_path):
    emb_path = tmp_path / "embedder.keras"
    tf.keras.utils.set_random_seed(6)
    inp = tf.keras.Input((EMB_SAMPLES,))
    x = tf.keras.layers.Reshape((EMB_SAMPLES // EMB_DIM, EMB_DIM))(inp)
    x = tf.keras.layers.GlobalAveragePooling1D()(x)
    logits = tf.keras.layers.Dense(8, name="logits")(x)
    emb = tf.keras.layers.Dense(EMB_DIM, name="embedding")(x)
    tf.keras.Model(inp, [logits, emb]).save(str(emb_path))
    return emb_path


def _batch_recs(n=3):
    recs = []
    for i in range(n):
        rng = np.random.RandomState(40 + i)
        t = np.arange(10 * SR) / SR
        y = (0.01 * rng.randn(len(t))).astype(np.float32)
        m = (t > 1.5 + i) & (t < 2.7 + i)
        phase = 2 * np.pi * ((2600 + 200 * i) * t[m] + 250 * (t[m] - 1.5 - i) ** 2)
        y[m] += (0.6 * np.sin(phase)).astype(np.float32)
        recs.append(y)
    return recs


def _compare_tracks(got_results, single_tracks_per_rec):
    for got, ref_tracks in zip(got_results, single_tracks_per_rec):
        ids = got["species_identify"]
        assert len(ids) == len(ref_tracks)
        for a, tr in zip(ids, ref_tracks):
            b = tr.get_meta()
            assert a["begin_s"] == pytest.approx(b["begin_s"])
            assert [r["model"] for r in a["model_results"]] == [
                r["model"] for r in b["model_results"]
            ]
            for ra, rb in zip(a["model_results"], b["model_results"]):
                pa, pb = ra["predictions"], rb["predictions"]
                assert [p["label"] for p in pa] == [p["label"] for p in pb]
                for x, y in zip(pa, pb):
                    assert abs(x["confidence"] - y["confidence"]) <= 1


def test_batch_embeddings_only_matches_single(tmp_path):
    """An embeddings-only model list through BatchAnalyzer equals the
    single-recording path track-for-track (VERDICT r3 weak #3: the batch
    path used to feed embeddings groups spectral features)."""
    from audio_analysis_tpu.pipeline.serve import BatchAnalyzer

    emb_path = _local_embedder(tmp_path)
    model_dir = _classifier_head_dir(
        tmp_path / "emb", extra_meta={"embedding_model": str(emb_path)}
    )
    recs = _batch_recs()
    batch = BatchAnalyzer(
        [str(model_dir)], sr=SR, bucket_seconds=10, rng=None
    ).analyse_recordings(recs)
    singles = [
        classify_mod.classify_frames(r, SR, [str(model_dir)], False, None, rng=None)[0]
        for r in recs
    ]
    for tracks in singles:
        for t in tracks:
            t.set_master_tag()
    _compare_tracks(batch, singles)


def test_batch_mixed_spectral_plus_embeddings_matches_single(tmp_path):
    """Spectral mean group + embeddings pre-model group: both paths must
    agree, and per-track prediction ORDER (spectral first) must match the
    single path's group order."""
    import json as _json

    from audio_analysis_tpu.pipeline.serve import BatchAnalyzer

    emb_path = _local_embedder(tmp_path)
    emb_dir = _classifier_head_dir(
        tmp_path / "emb",
        extra_meta={"embedding_model": str(emb_path), "pre_model": True},
    )
    spec_dir = tmp_path / "spec"
    spec_dir.mkdir()
    tf.keras.utils.set_random_seed(7)
    inp = tf.keras.Input((64, 226, 1))
    x = tf.keras.layers.Conv2D(4, 3, strides=4, padding="same", activation="relu")(inp)
    x = tf.keras.layers.GlobalAveragePooling2D()(x)
    out = tf.keras.layers.Dense(3, activation="softmax")(x)
    tf.keras.Model(inp, out).save(str(spec_dir / "audioModel.keras"))
    (spec_dir / "metadata.txt").write_text(
        _json.dumps(
            {
                "name": "specnet",
                "labels": ["bird", "human", "noise"],
                "segment_length": 3,
                "segment_stride": 1.5,
                "hop_length": 640,
                "n_mels": 64,
                "break_freq": 1750,
                "htk": True,
                "threshold": 0.2,
                "normalize": True,
            }
        )
    )
    models = [str(spec_dir), str(emb_dir)]
    recs = _batch_recs()
    batch = BatchAnalyzer(
        models, sr=SR, bucket_seconds=10, rng=None
    ).analyse_recordings(recs)
    singles = [
        classify_mod.classify_frames(r, SR, models, False, None, rng=None)[0]
        for r in recs
    ]
    for tracks in singles:
        for t in tracks:
            t.set_master_tag()
    assert any(len(t.results) == 2 for tracks in singles for t in tracks)
    _compare_tracks(batch, singles)


def test_embeddings_path_native_dense_tf_free(tmp_path, rng):
    """The fully TF-free embeddings deployment: a native 'dense' classifier
    head whose metadata names a native 'dense' embedder — no .keras archive
    anywhere (registry arch 'dense'; the dryrun_multichip mixed leg uses
    exactly this shape)."""
    from audio_analysis_tpu.io.checkpoint import save_checkpoint

    r = np.random.RandomState(9)
    emb_dim = 32
    emb_dir = tmp_path / "embedder"
    save_checkpoint(
        emb_dir,
        [{
            "kernel": (r.randn(emb_dim, emb_dim) * 0.5).astype(np.float32),
            "bias": np.zeros(emb_dim, np.float32),
        }],
        {"architecture": "dense", "net_pool": emb_dim,
         "output_activation": "linear", "labels": []},
    )
    head_dir = tmp_path / "head"
    save_checkpoint(
        head_dir,
        [{
            "kernel": r.randn(emb_dim, 2).astype(np.float32),
            "bias": np.zeros(2, np.float32),
        }],
        {"name": "embeddings", "architecture": "dense",
         "labels": ["bird", "noise"], "segment_stride": 5,
         "threshold": 0.1, "embedding_model": str(emb_dir)},
    )
    tracks = classify_mod.classify_frames(
        _recording(rng), SR, [str(head_dir)], False, None, rng=None
    )[0]
    _assert_embedding_results(tracks)

    # the head's math is checkable by hand: softmax(relu-free single layer)
    from audio_analysis_tpu.models.registry import load_classifier
    from audio_analysis_tpu.io.modelconfig import ModelConfig
    import jax.numpy as jnp

    head = load_classifier(head_dir, ModelConfig.load(head_dir))
    x = r.randn(3, emb_dim).astype(np.float32)
    k, b = [np.load(head_dir / "weights.npz")[n] for n in ("0/kernel", "0/bias")]
    z = x @ k + b
    want = np.exp(z) / np.exp(z).sum(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(head(jnp.asarray(x))), want, rtol=1e-5)
