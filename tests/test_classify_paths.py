"""classify() edge paths: multi-model ensemble mean, pre+main groups, the
band-pass filter path, embeddings windowing, and short-circuit returns."""

import json
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp

from audio_analysis_tpu.pipeline.classify import classify_frames
from audio_analysis_tpu.pipeline.embeddings import get_chirp_samples
from audio_analysis_tpu.detect.signal import Signal

SR = 48000
LABELS = ["bird", "morepork", "human", "noise"]


def _save_model(d, name, labels=LABELS, seed=0, extra_meta=None, n_mels=64):
    d.mkdir(parents=True, exist_ok=True)
    tf.keras.utils.set_random_seed(seed)
    inp = tf.keras.Input((n_mels, 226, 1))
    x = tf.keras.layers.Conv2D(4, 3, strides=4, padding="same", activation="relu")(inp)
    x = tf.keras.layers.GlobalAveragePooling2D()(x)
    out = tf.keras.layers.Dense(len(labels), activation="softmax")(x)
    tf.keras.Model(inp, out).save(str(d / "audioModel.keras"))
    meta = {
        "name": name,
        "labels": labels,
        "segment_length": 3,
        "segment_stride": 1.5,
        "hop_length": 640,
        "n_mels": n_mels,
        "break_freq": 1750,
        "htk": True,
        "threshold": 0.2,
        "normalize": True,
    }
    meta.update(extra_meta or {})
    (d / "metadata.txt").write_text(json.dumps(meta))
    return d


def _recording(seed=0, seconds=12):
    rng = np.random.RandomState(seed)
    t = np.arange(seconds * SR) / SR
    y = 0.01 * rng.randn(len(t)).astype(np.float32)
    for f0, t0, dur in [(3000, 2.0, 0.8), (2600, 7.0, 1.0)]:
        m = (t >= t0) & (t < t0 + dur)
        y[m] += (0.5 * np.sin(2 * np.pi * f0 * t[m])).astype(np.float32)
    return y


def test_two_model_ensemble_means(tmp_path):
    """Two same-group models -> probabilities are the model mean
    (reference: src/identify_tracks.py:543-551)."""
    d1 = _save_model(tmp_path / "m1", "net_a", seed=1)
    d2 = _save_model(tmp_path / "m2", "net_b", seed=2)
    d1.mkdir(exist_ok=True)
    rec = _recording()

    tr_both, *_ = classify_frames(rec, SR, [str(d1), str(d2)], False, None, rng=None)
    tr_a, *_ = classify_frames(rec, SR, [str(d1)], False, None, rng=None)
    tr_b, *_ = classify_frames(rec, SR, [str(d2)], False, None, rng=None)
    assert len(tr_both) == len(tr_a) == len(tr_b) >= 1

    def conf_map(tracks):
        return {
            (i, p.what): p.confidence
            for i, t in enumerate(tracks)
            for p in t.results[0].predictions
        }

    both, a, b = conf_map(tr_both), conf_map(tr_a), conf_map(tr_b)
    for key in both:
        ca = a.get(key, None)
        cb = b.get(key, None)
        if ca is not None and cb is not None:
            assert abs(both[key] - (ca + cb) / 2) <= 1  # rounded means


def test_pre_and_main_groups(tmp_path):
    main = _save_model(tmp_path / "main", "mainnet", seed=3)
    pre = _save_model(
        tmp_path / "pre", "prenet", labels=["bird", "human", "noise"], seed=4,
        extra_meta={"pre_model": True},
    )
    rec = _recording(1)
    tracks, *_ = classify_frames(rec, SR, [str(main), str(pre)], False, None, rng=None)
    assert len(tracks) >= 1
    # each track carries a result from BOTH groups
    models_seen = {r.model for r in tracks[0].results}
    assert models_seen == {"mainnet", "prenet"}
    pre_flags = {r.model: r.pre_model for r in tracks[0].results}
    assert pre_flags["prenet"] is True and pre_flags["mainnet"] is False


def test_out_of_band_tracks_still_union_bird_labels(tmp_path):
    """When every track is outside both models' frequency bands, the group
    loop must still visit every group and union its bird_labels (reference
    updates bird_labels per group, src/identify_tracks.py:494, even with no
    windows; get_chirps consumes the union). Regression: a `break` used to
    drop the second group's labels."""
    main = _save_model(
        tmp_path / "main", "mainnet", seed=7,
        extra_meta={"fmin": 20000, "fmax": 23000, "bird_labels": ["bird"]},
    )
    pre = _save_model(
        tmp_path / "pre", "prenet", labels=["bird", "human", "noise"], seed=8,
        extra_meta={
            "pre_model": True,
            "fmin": 20000,
            "fmax": 23000,
            "bird_labels": ["kiwi", "whistler"],
        },
    )
    rec = _recording(3)
    tracks, length, signals, raw_length, bird_labels = classify_frames(
        rec, SR, [str(main), str(pre)], False, None, rng=None
    )
    assert len(tracks) >= 1
    assert all(len(t.results) == 0 for t in tracks)  # no in-band windows
    assert set(bird_labels) == {"bird", "kiwi", "whistler"}


def test_filter_below_bandpass_path(tmp_path):
    """filter_below triggers the per-track Butterworth path for low tracks
    (reference: src/identify_tracks.py:156-161); pipeline still completes
    and produces results."""
    d = _save_model(
        tmp_path / "m", "filternet", seed=5, extra_meta={"filter_below": 20000}
    )
    rec = _recording(2)
    tracks, *_ = classify_frames(rec, SR, [str(d)], False, None, rng=None)
    assert len(tracks) >= 1
    assert all(len(t.results) == 1 for t in tracks)


def test_int16_input_matches_float(tmp_path):
    """classify_frames fed int16 PCM (the decode fast path: half the upload
    bytes, converted on device by /32768) must reproduce the float run on
    the identically-scaled signal."""
    d = _save_model(tmp_path / "m", "i16net", seed=9)
    rec_f = _recording(4)
    rec_i16 = np.clip(rec_f * 32768.0, -32768, 32767).astype(np.int16)
    rec_f_scaled = rec_i16.astype(np.float32) / 32768.0

    tr_i, *rest_i = classify_frames(rec_i16, SR, [str(d)], False, None, rng=None)
    tr_f, *rest_f = classify_frames(rec_f_scaled, SR, [str(d)], False, None, rng=None)
    assert len(tr_i) == len(tr_f) >= 1
    for a, b in zip(tr_i, tr_f):
        assert (a.start, a.end, a.freq_start, a.freq_end) == (
            b.start, b.end, b.freq_start, b.freq_end,
        )
        pa = {p.what: p.confidence for p in a.results[0].predictions}
        pb = {p.what: p.confidence for p in b.results[0].predictions}
        assert pa == pb


def test_load_recording_prefer_int16(tmp_path):
    from audio_analysis_tpu.io.audio import load_recording, write_wav

    y = (np.sin(2 * np.pi * 440 * np.arange(SR) / SR) * 0.4).astype(np.float32)
    p = tmp_path / "r.wav"
    write_wav(p, y, SR)  # writes 16-bit PCM
    fast, sr_fast = load_recording(p, resample=SR, prefer_int16=True)
    assert fast.dtype == np.int16 and sr_fast == SR
    slow, sr_slow = load_recording(p, resample=SR)
    assert slow.dtype == np.float32
    np.testing.assert_allclose(fast.astype(np.float32) / 32768.0, slow, atol=1e-7)
    # non-matching rate falls back to the float path
    f2, sr2 = load_recording(p, resample=16000, prefer_int16=True)
    assert f2.dtype == np.float32 and sr2 == 16000


def test_analyse_tracks_requires_meta(tmp_path):
    d = _save_model(tmp_path / "m", "n", seed=6)
    assert classify_frames(_recording(), SR, [str(d)], True, None, rng=None) is None


def test_get_chirp_samples_windows():
    rec = np.arange(32000 * 12, dtype=np.float32)
    tracks = [Signal(1.0, 7.0, 100, 200)]
    samples = get_chirp_samples(rec, tracks, sr=32000, stride=5, length=5)
    assert len(samples) == 1
    ws = samples[0]
    # windows at 1s and 6s (5s stride), 5s long; loop breaks when end/sr > t.end
    assert len(ws) == 2
    assert ws[0][0] == 32000.0 and len(ws[0]) == 5 * 32000
    # second window starts one 5 s stride later
    assert ws[1][0] == 6 * 32000 and len(ws[1]) == 5 * 32000


def _prenet_result_map(tracks):
    out = {}
    for i, t in enumerate(tracks):
        for r in t.results:
            if r.model == "prenet":
                preds = sorted((p.what, p.confidence) for p in r.predictions)
                raw = (
                    (r.raw_prediction.what, r.raw_prediction.confidence)
                    if r.raw_prediction is not None
                    else None
                )
                out[i] = (preds, raw)
    return out


def test_cross_group_feature_reuse_matches_reference(tmp_path):
    """Two groups whose configs differ only in break_freq: the reference
    feeds group-1's computed FEATURES to group 2 verbatim
    (src/identify_tracks.py:525-528, ``data = track_data``), so group-2
    predictions must equal a run where the group-2 model carries group-1's
    spectral config — NOT features recomputed with its own break_freq."""
    import shutil

    main = _save_model(tmp_path / "main", "mainnet", seed=3)
    # linear head amplifies feature differences past the int rounding
    pre = tmp_path / "pre"
    pre.mkdir()
    tf.keras.utils.set_random_seed(21)
    inp = tf.keras.Input((64, 226, 1))
    x = tf.keras.layers.Conv2D(4, 3, strides=4, padding="same", activation="relu")(inp)
    x = tf.keras.layers.GlobalAveragePooling2D()(x)
    out = tf.keras.layers.Dense(len(LABELS))(x)
    tf.keras.Model(inp, out).save(str(pre / "audioModel.keras"))
    meta = {
        "name": "prenet",
        "labels": LABELS,
        "segment_length": 3,
        "segment_stride": 1.5,
        "hop_length": 640,
        "n_mels": 64,
        "break_freq": 700,
        "htk": True,
        "threshold": 0.05,
        "normalize": True,
        "pre_model": True,
    }
    (pre / "metadata.txt").write_text(json.dumps(meta))
    # same weights, group-1 spectral config: the reference-expected oracle
    pre_ref = tmp_path / "pre_ref"
    shutil.copytree(pre, pre_ref)
    meta_ref = dict(meta, break_freq=1750)
    (pre_ref / "metadata.txt").write_text(json.dumps(meta_ref))

    rec = _recording(5)
    got, *_ = classify_frames(rec, SR, [str(main), str(pre)], False, None, rng=None)
    want, *_ = classify_frames(rec, SR, [str(main), str(pre_ref)], False, None, rng=None)
    assert len(got) == len(want) >= 1
    got_map, want_map = _prenet_result_map(got), _prenet_result_map(want)
    assert got_map == want_map and got_map

    # sanity: with its own break_freq=700 features the prenet output is
    # genuinely different — otherwise this test would be vacuous
    alone, *_ = classify_frames(rec, SR, [str(pre)], False, None, rng=None)
    assert _prenet_result_map(alone) != got_map
