"""Config-space differential fuzz: random metadata.txt knob combinations
through BATCH serving vs the SINGLE-recording pipeline.

The fixed-config serve tests pin one point of the knob cross-product; the
planning/bucketing/feature plumbing (plan_for_config, _combine_plans,
pad_plan_to_bucket, the fused group program's cfg baking) branches on many
of them. A knob combination that diverges the two paths would ship
silently — every released model carries a different metadata.txt
(reference: src/identify_tracks.py:465-497 reads ~25 keys with defaults).

The model input shape follows the config (n_mels/MFCC concat/segment
frames), so each case asks the frontend for its feature shape first and
builds a matching tiny classifier.
"""

import json

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from audio_analysis_tpu.pipeline.serve import BatchAnalyzer
from audio_analysis_tpu.pipeline.classify import (
    classify_frames,
    features_for_config,
)
from audio_analysis_tpu.io.modelconfig import ModelConfig

SR = 48000
LABELS = ["bird", "morepork", "human", "noise"]


def _random_meta(rng):
    meta = {
        "name": "fuzznet",
        "labels": LABELS,
        "bird_labels": ["bird", "morepork"],
        "threshold": 0.2,
        "segment_length": float(rng.choice([2.0, 3.0, 4.5])),
        "segment_stride": float(rng.choice([1.0, 1.5])),
        "hop_length": int(rng.choice([560, 640, 800])),
        "n_fft": int(rng.choice([2048, 4096])),
        "n_mels": int(rng.choice([32, 64, 96])),
        "break_freq": float(rng.choice([700.0, 1000.0, 1750.0])),
        "htk": bool(rng.randint(2)),
        "fmin": float(rng.choice([0.0, 50.0, 300.0])),
        "fmax": float(rng.choice([8000.0, 11000.0])),
        "power": float(rng.choice([1.0, 2.0])),
        "db_scale": bool(rng.randint(2)),
        "normalize": bool(rng.randint(2)),
        "mean_sub": bool(rng.randint(2)),
        "use_mfcc": bool(rng.randint(2)),
        "channels": int(rng.choice([1, 3])),
        "pad_short_tracks": bool(rng.randint(2)),
        "magv2": bool(rng.randint(2)),
    }
    # band-pass branch, occasionally (the rarest serving path)
    if rng.randint(4) == 0:
        meta["filter_below"] = 9000.0
    return meta


def _feature_shape(meta):
    cfg = ModelConfig.from_meta(meta)
    probe = features_for_config(
        np.zeros((1, int(cfg.segment_length * SR)), np.float32), SR, cfg
    )
    return probe.shape[1:]


def _model_dir_for(meta, tmp_path, rng_seed, input_shape=None):
    if input_shape is None:
        input_shape = _feature_shape(meta)
    tf.keras.utils.set_random_seed(rng_seed)
    inp = tf.keras.Input(input_shape)
    x = tf.keras.layers.Conv2D(4, 3, strides=4, padding="same", activation="relu")(inp)
    x = tf.keras.layers.GlobalAveragePooling2D()(x)
    out = tf.keras.layers.Dense(len(LABELS), activation="softmax")(x)
    d = tmp_path / f"fuzzmodel{rng_seed}"
    d.mkdir()
    tf.keras.Model(inp, out).save(str(d / "audioModel.keras"))
    (d / "metadata.txt").write_text(json.dumps(meta))
    return d


def _recs(rng, n=2, seconds=8):
    recs = []
    t = np.arange(seconds * SR) / SR
    for _ in range(n):
        y = 0.01 * rng.randn(len(t)).astype(np.float32)
        for _ in range(rng.randint(1, 4)):
            f0 = rng.uniform(500, 8000)
            t0 = rng.uniform(0.5, seconds - 2.0)
            dur = rng.uniform(0.4, 1.4)
            m = (t >= t0) & (t < t0 + dur)
            y[m] += 0.5 * np.sin(2 * np.pi * f0 * t[m]).astype(np.float32)
        recs.append(y)
    return recs


def _assert_equal_results(got, ref_tracks):
    for t in ref_tracks:
        t.set_master_tag()
    ref = [t.get_meta() for t in ref_tracks]
    assert len(got["species_identify"]) == len(ref)
    for a, b in zip(got["species_identify"], ref):
        assert a["begin_s"] == pytest.approx(b["begin_s"])
        assert a["end_s"] == pytest.approx(b["end_s"])
        assert a["freq_start"] == b["freq_start"]
        assert a["freq_end"] == b["freq_end"]
        assert len(a["model_results"]) == len(b["model_results"])
        for ma, mb in zip(a["model_results"], b["model_results"]):
            assert ma["model"] == mb["model"]
            assert ma["pre_model"] == mb["pre_model"]
            pa, pb = ma["predictions"], mb["predictions"]
            assert [p["label"] for p in pa] == [p["label"] for p in pb]
            for x, y in zip(pa, pb):
                assert abs(x["confidence"] - y["confidence"]) <= 1


def _two_group_dirs(rng, tmp_path, seed):
    """Main group + pre-model group with INDEPENDENTLY drawn configs.

    Later groups consume group-1's features verbatim (reference
    src/identify_tracks.py:525-528 ``data = track_data``; see
    pipeline/classify.py::classify_frames), so the pre-model's network is
    built on GROUP-1's feature shape while its metadata draws its own —
    possibly conflicting — spectral knobs, exactly the deployed-ensemble
    shape (released pre-model and bird-model metadata differ)."""
    meta1 = _random_meta(rng)
    meta2 = _random_meta(rng)
    meta2["name"] = "prefuzznet"
    meta2["pre_model"] = True
    d1 = _model_dir_for(meta1, tmp_path, seed)
    d2 = _model_dir_for(
        meta2, tmp_path, seed + 500, input_shape=_feature_shape(meta1)
    )
    return d1, d2


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(8))
def test_config_fuzz_batch_matches_single(tmp_path, seed):
    rng = np.random.RandomState(1000 + seed)
    meta = _random_meta(rng)
    d = _model_dir_for(meta, tmp_path, seed)
    recs = _recs(rng)

    # rng=None pins window offsets deterministically on BOTH paths (the
    # seeded-rng draw parity has its own dedicated tests); the fuzz targets
    # the config plumbing
    analyzer = BatchAnalyzer([str(d)], sr=SR, bucket_seconds=8, rng=None)
    batch = analyzer.analyse_recordings(recs)

    for rec, got in zip(recs, batch):
        tracks, length, signals, raw_length, bird_labels = classify_frames(
            rec, SR, [str(d)], False, None, rng=None
        )
        _assert_equal_results(got, tracks)


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(4))
def test_config_fuzz_two_groups_batch_matches_single(tmp_path, seed):
    """Main + pre-model groups with independently drawn configs: the
    cross-group feature-reuse plumbing (group 2 consumes group-1's
    features verbatim) must agree between batch serving and the
    single-recording path for EVERY group's predictions."""
    rng = np.random.RandomState(7000 + seed)
    d1, d2 = _two_group_dirs(rng, tmp_path, seed)
    recs = _recs(rng)

    dirs = [str(d1), str(d2)]
    analyzer = BatchAnalyzer(dirs, sr=SR, bucket_seconds=8, rng=None)
    batch = analyzer.analyse_recordings(recs)

    for rec, got in zip(recs, batch):
        tracks, *_ = classify_frames(rec, SR, dirs, False, None, rng=None)
        _assert_equal_results(got, tracks)


def _random_track_meta(rng, seconds=8):
    """Random sidecar "Tracks" metadata: 0-3 boxes, optional freq bounds
    (absent bounds default to 0/MAX_FREQUENCY like the reference), geometry
    kept inside the recording (a track far past the end hits the preserved
    NaN-crash quirk, pinned separately in test_serve)."""
    tracks = []
    for j in range(rng.randint(0, 4)):
        t0 = float(rng.uniform(0.0, seconds - 0.5))
        t1 = min(float(seconds), t0 + float(rng.uniform(0.2, 4.0)))
        tr = {"id": 100 + j, "start": round(t0, 2), "end": round(t1, 2)}
        if rng.randint(2):
            f0 = float(rng.uniform(100, 9000))
            tr["minFreq"] = round(f0)
            tr["maxFreq"] = round(f0 + float(rng.uniform(200, 8000)))
        tracks.append(tr)
    return {"Tracks": tracks}


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(4))
def test_config_fuzz_analyse_tracks_batch_matches_single(tmp_path, seed):
    """analyse-tracks mode across the config knob space: random metadata
    tracks (incl. out-of-band boxes and band-pass configs) through batch
    serving vs the single path."""
    rng = np.random.RandomState(3000 + seed)
    meta = _random_meta(rng)
    d = _model_dir_for(meta, tmp_path, seed)
    recs = _recs(rng)
    metas = [_random_track_meta(rng) for _ in recs]

    analyzer = BatchAnalyzer([str(d)], sr=SR, bucket_seconds=8, rng=None)
    batch = analyzer.analyse_recordings(recs, meta_data=metas, analyse_tracks=True)

    for rec, md, got in zip(recs, metas, batch):
        assert "chirps" not in got and "cacophony_index" not in got
        res = classify_frames(rec, SR, [str(d)], True, md, rng=None)
        _assert_equal_results(got, res[0])
