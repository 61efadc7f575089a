"""Batch serving: BatchAnalyzer results match the single-recording pipeline."""

import json
from pathlib import Path

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp

from audio_analysis_tpu.pipeline.serve import BatchAnalyzer
from audio_analysis_tpu.pipeline.classify import classify_frames
from audio_analysis_tpu.pipeline.cacophony import (
    calc_cacophony_index,
    filter_tracks,
    get_chirps,
    get_max_chirps,
)

SR = 48000
LABELS = ["bird", "morepork", "human", "noise"]


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("servemodel")
    inp = tf.keras.Input((64, 226, 1))
    x = tf.keras.layers.Conv2D(4, 3, strides=4, padding="same", activation="relu")(inp)
    x = tf.keras.layers.GlobalAveragePooling2D()(x)
    out = tf.keras.layers.Dense(len(LABELS), activation="softmax")(x)
    tf.keras.Model(inp, out).save(str(d / "audioModel.keras"))
    (d / "metadata.txt").write_text(
        json.dumps(
            {
                "name": "servenet",
                "labels": LABELS,
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
    return d


def _rec(seed, seconds=12):
    rng = np.random.RandomState(seed)
    t = np.arange(seconds * SR) / SR
    y = 0.01 * rng.randn(len(t)).astype(np.float32)
    for f0, t0, dur in [(3000, 2.0, 0.8), (2600, 7.0, 1.0)]:
        m = (t >= t0) & (t < t0 + dur)
        y[m] += (0.5 * np.sin(2 * np.pi * f0 * t[m])).astype(np.float32)
    return y


def _single_pipeline_result(rec, model_dir):
    tracks, length, signals, raw_length, bird_labels = classify_frames(
        rec, SR, [str(model_dir)], False, None, rng=None
    )
    for t in tracks:
        t.set_master_tag()
    rec_signals = [s.to_array() for s in signals]
    chirps = get_chirps(tracks, bird_labels, signals)
    ci, _ = calc_cacophony_index(filter_tracks(tracks), length)
    return {
        "duration": raw_length,
        "cacophony_index": ci,
        "chirps": {
            "chirps": chirps,
            "max_chirps": get_max_chirps(length),
            "signals": rec_signals,
        },
        "species_identify": [t.get_meta() for t in tracks],
    }


def test_batch_matches_single(model_dir):
    recs = [_rec(0), _rec(1), _rec(2)]
    analyzer = BatchAnalyzer([str(model_dir)], sr=SR, bucket_seconds=12, rng=None)
    batch_results = analyzer.analyse_recordings(recs)
    assert len(batch_results) == 3

    for rec, got in zip(recs, batch_results):
        ref = _single_pipeline_result(rec, model_dir)
        assert got["duration"] == pytest.approx(ref["duration"])
        assert got["chirps"]["chirps"] == ref["chirps"]["chirps"]
        assert got["chirps"]["signals"] == ref["chirps"]["signals"]
        assert got["cacophony_index"] == ref["cacophony_index"]
        assert len(got["species_identify"]) == len(ref["species_identify"])
        for a, b in zip(got["species_identify"], ref["species_identify"]):
            assert a["begin_s"] == pytest.approx(b["begin_s"])
            assert a["end_s"] == pytest.approx(b["end_s"])
            ma = a.get("master_tag", {}).get("prediction", {}).get("label")
            mb = b.get("master_tag", {}).get("prediction", {}).get("label")
            assert ma == mb
            pa = a["model_results"][0]["predictions"]
            pb = b["model_results"][0]["predictions"]
            assert [p["label"] for p in pa] == [p["label"] for p in pb]
            for x, y in zip(pa, pb):
                assert abs(x["confidence"] - y["confidence"]) <= 1


def test_stream_matches_batch(model_dir):
    recs_a = [_rec(10), _rec(11)]
    recs_b = [_rec(12)]
    analyzer = BatchAnalyzer([str(model_dir)], sr=SR, bucket_seconds=12, rng=None)
    streamed = list(analyzer.analyse_stream([recs_a, recs_b]))
    direct = [analyzer.analyse_recordings(recs_a), analyzer.analyse_recordings(recs_b)]
    assert len(streamed) == 2
    for s_batch, d_batch in zip(streamed, direct):
        for s, d in zip(s_batch, d_batch):
            assert s["chirps"]["signals"] == d["chirps"]["signals"]
            assert len(s["species_identify"]) == len(d["species_identify"])


def test_stream_async_upload_matches_sync(model_dir, monkeypatch):
    """AAT_ASYNC_UPLOAD=1 (background-thread dispatch — the default) must
    yield the exact results of the synchronous stream (=0) — the thread only
    overlaps the wire wait with host work, never changes what is computed."""
    recs_a = [_rec(10), _rec(11)]
    recs_b = [_rec(12)]
    recs_c = [_rec(13)]
    analyzer = BatchAnalyzer([str(model_dir)], sr=SR, bucket_seconds=12, rng=None)
    monkeypatch.setenv("AAT_ASYNC_UPLOAD", "0")
    sync = list(analyzer.analyse_stream([recs_a, recs_b, recs_c]))
    monkeypatch.setenv("AAT_ASYNC_UPLOAD", "1")
    asyn = list(analyzer.analyse_stream([recs_a, recs_b, recs_c]))
    assert len(sync) == len(asyn) == 3
    import json

    for s_batch, a_batch in zip(sync, asyn):
        for s, a in zip(s_batch, a_batch):
            s = {k: v for k, v in s.items() if k != "processing_time_seconds"}
            a = {k: v for k, v in a.items() if k != "processing_time_seconds"}
            assert json.dumps(s, sort_keys=True, default=str) == json.dumps(
                a, sort_keys=True, default=str
            )


def test_stream_encode_ahead_matches_single_worker(model_dir, monkeypatch):
    """AAT_ENCODE_AHEAD=1 (two-stage prepare/upload pipeline, default off —
    measured a wash on the tunnel) must yield the exact results of the
    shared-single-worker default; also pins that the cross-pool future
    handoff neither deadlocks nor reorders batches."""
    import json

    recs_a = [_rec(10), _rec(11)]
    recs_b = [_rec(12)]
    analyzer = BatchAnalyzer([str(model_dir)], sr=SR, bucket_seconds=12, rng=None)
    monkeypatch.setenv("AAT_ASYNC_UPLOAD", "1")
    monkeypatch.setenv("AAT_ENCODE_AHEAD", "0")
    base = list(analyzer.analyse_stream([recs_a, recs_b]))
    monkeypatch.setenv("AAT_ENCODE_AHEAD", "1")
    ahead = list(analyzer.analyse_stream([recs_a, recs_b]))
    assert len(base) == len(ahead) == 2
    for b_batch, a_batch in zip(base, ahead):
        for b, a in zip(b_batch, a_batch):
            b = {k: v for k, v in b.items() if k != "processing_time_seconds"}
            a = {k: v for k, v in a.items() if k != "processing_time_seconds"}
            assert json.dumps(b, sort_keys=True, default=str) == json.dumps(
                a, sort_keys=True, default=str
            )


def test_batch_int16_matches_float(model_dir):
    y = _rec(20)
    y16 = np.clip(y * 32768.0, -32768, 32767).astype(np.int16)
    yf = y16.astype(np.float32) / 32768.0  # exactly what the device computes
    analyzer = BatchAnalyzer([str(model_dir)], sr=SR, bucket_seconds=12, rng=None)
    a = analyzer.analyse_recordings([y16])
    b = analyzer.analyse_recordings([yf])
    assert a[0]["chirps"]["signals"] == b[0]["chirps"]["signals"]
    ta = [t["model_results"][0]["predictions"] for t in a[0]["species_identify"]]
    tb = [t["model_results"][0]["predictions"] for t in b[0]["species_identify"]]
    assert ta == tb


def test_batch_timings_surface(model_dir, monkeypatch):
    monkeypatch.setenv("AAT_TIMINGS", "1")
    analyzer = BatchAnalyzer([str(model_dir)], sr=SR, bucket_seconds=12, rng=None)
    res = analyzer.analyse_recordings([_rec(30)])
    t = res[0]["timing"]
    assert {"dispatch", "detect", "plan", "post"} <= set(t)
    assert all(v >= 0 for v in t.values())


def test_batch_wire_codec_matches_raw(model_dir, monkeypatch):
    """AAT_WIRE_CODEC=1 serving must be byte-identical to the raw int16
    upload (the codec is lossless and decodes on device)."""
    import json

    y16 = np.clip(_rec(21) * 32768.0, -32768, 32767).astype(np.int16)
    recs = [y16, (y16[: len(y16) // 2]).copy()]
    analyzer = BatchAnalyzer([str(model_dir)], sr=SR, bucket_seconds=12, rng=None)
    monkeypatch.setenv("AAT_WIRE_CODEC", "1")
    a = analyzer.analyse_recordings(recs)
    monkeypatch.setenv("AAT_WIRE_CODEC", "0")
    b = analyzer.analyse_recordings(recs)
    assert json.dumps(a) == json.dumps(b)


def test_batch_filter_below_matches_single(tmp_path):
    """Batch serving must apply the per-track band-pass exactly like the
    single-recording path (filter_below configs)."""
    d = tmp_path / "fm"
    d.mkdir()
    inp = tf.keras.Input((64, 226, 1))
    x = tf.keras.layers.Conv2D(4, 3, strides=4, padding="same", activation="relu")(inp)
    x = tf.keras.layers.GlobalAveragePooling2D()(x)
    out = tf.keras.layers.Dense(len(LABELS), activation="softmax")(x)
    tf.keras.Model(inp, out).save(str(d / "audioModel.keras"))
    (d / "metadata.txt").write_text(
        json.dumps(
            {
                "name": "filterserve",
                "labels": LABELS,
                "n_mels": 64,
                "hop_length": 640,
                "htk": True,
                "threshold": 0.2,
                "normalize": True,
                "filter_below": 20000,
            }
        )
    )
    # the 9 s recording is SHORTER than the bucket: the band-pass path must
    # plan windows against the true length, not the zero-padded bucket (its
    # tone ends right at the recording end, so the short-track clamp pulls
    # the last window back — against the pad it would read zeros instead)
    recs = [_rec(30), _rec(31), _rec(32, seconds=9)]
    analyzer = BatchAnalyzer([str(d)], sr=SR, bucket_seconds=12, rng=None)
    batch = analyzer.analyse_recordings(recs)
    for rec, got in zip(recs, batch):
        ref = _single_pipeline_result(rec, d)
        assert len(got["species_identify"]) == len(ref["species_identify"])
        assert len(got["species_identify"]) >= 1
        for a, b in zip(got["species_identify"], ref["species_identify"]):
            pa = a["model_results"][0]["predictions"]
            pb = b["model_results"][0]["predictions"]
            assert [p["label"] for p in pa] == [p["label"] for p in pb]
            for x, y in zip(pa, pb):
                assert abs(x["confidence"] - y["confidence"]) <= 1


def test_batch_mixed_lengths(model_dir):
    recs = [_rec(3, seconds=6), _rec(4, seconds=12)]
    analyzer = BatchAnalyzer([str(model_dir)], sr=SR, bucket_seconds=12, rng=None)
    out = analyzer.analyse_recordings(recs)
    assert out[0]["duration"] == pytest.approx(6.0)
    assert out[1]["duration"] == pytest.approx(12.0)


def test_sharded_group_program_matches(model_dir):
    """The fused group program with a ('data',)-sharded window axis and
    replicated PCM produces the same track means as unsharded (the psum XLA
    inserts for the segment means is the only collective).

    Runs in a fresh interpreter: the 8-device CPU SPMD executable flakily
    aborts when launched late in a long suite process (XLA runtime state),
    while the logic itself is sound — isolation keeps the suite stable.
    """
    import subprocess
    import sys

    script = f"""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
os.environ["AAT_COMPILATION_CACHE"] = "0"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from audio_analysis_tpu.parallel.mesh import make_mesh
from audio_analysis_tpu.io.modelconfig import ModelConfig
from audio_analysis_tpu.models.registry import load_classifier
from audio_analysis_tpu.pipeline.classify import _fused_group_program
from audio_analysis_tpu.pipeline.samples import plan_windows, pad_plan_to_bucket
from audio_analysis_tpu.detect.signal import Signal

SR = {SR}
rng = np.random.RandomState(7)
t = np.arange(12 * SR) / SR
rec = (0.01 * rng.randn(len(t))).astype(np.float32)
mesh = make_mesh(n_devices=8, model_parallel=1)
cfg = ModelConfig.load({str(model_dir)!r})
model = load_classifier({str(model_dir)!r}, cfg)
tracks = [Signal(1.0, 4.5, 2000, 5000), Signal(6.0, 9.0, 2500, 4000)]
plan = pad_plan_to_bucket(plan_windows(len(rec), SR, tracks, 3.0, 1.5, rng=None), 64)
prog = _fused_group_program([model], cfg, SR, plan.sample_size, 8)
frames = jnp.asarray(rec)
args_plain = (frames, jnp.asarray(plan.base), jnp.asarray(plan.valid_lo),
              jnp.asarray(plan.valid_hi), jnp.asarray(plan.track_index))
base_out = np.asarray(prog(*args_plain))
rep = NamedSharding(mesh, P())
dat = NamedSharding(mesh, P("data"))
args_shard = (jax.device_put(frames, rep),) + tuple(
    jax.device_put(a, dat) for a in args_plain[1:])
shard_out = np.asarray(prog(*args_shard))
np.testing.assert_allclose(shard_out, base_out, rtol=2e-4, atol=2e-5)
print("SHARDED-OK")
"""
    r = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=900,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin", "PYTHONPATH": str(Path(__file__).parent.parent), "HOME": "/root"},
    )
    assert r.returncode == 0 and "SHARDED-OK" in r.stdout, r.stderr[-2000:]


@pytest.mark.slow
def test_batch_sharded_matches_unsharded(model_dir):
    """Full mesh-sharded serving e2e. Isolated in a fresh interpreter (slow
    GSPMD CPU compiles + the XLA CPU multi-device runtime flakily aborts in
    long-lived suite processes)."""
    import subprocess
    import sys

    script = f"""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
os.environ["AAT_COMPILATION_CACHE"] = "0"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from audio_analysis_tpu.pipeline.serve import BatchAnalyzer
from audio_analysis_tpu.parallel.mesh import make_mesh

SR = {SR}
def _rec(seed, seconds=6):
    rng = np.random.RandomState(seed)
    t = np.arange(seconds * SR) / SR
    y = 0.01 * rng.randn(len(t)).astype(np.float32)
    for f0, t0, dur in [(3000, 2.0, 0.8)]:
        m = (t >= t0) & (t < t0 + dur)
        y[m] += (0.5 * np.sin(2 * np.pi * f0 * t[m])).astype(np.float32)
    return y

recs = [_rec(s) for s in range(8)]
mesh = make_mesh(n_devices=8, model_parallel=1)
base = BatchAnalyzer([{str(model_dir)!r}], sr=SR, bucket_seconds=6, rng=None)
shard = BatchAnalyzer([{str(model_dir)!r}], sr=SR, bucket_seconds=6, rng=None, mesh=mesh)
a = base.analyse_recordings(recs)
b = shard.analyse_recordings(recs)
for ra, rb in zip(a, b):
    assert ra["chirps"]["signals"] == rb["chirps"]["signals"]
    la = [t["model_results"][0]["predictions"] for t in ra["species_identify"]]
    lb = [t["model_results"][0]["predictions"] for t in rb["species_identify"]]
    for pa, pb in zip(la, lb):
        assert [p["label"] for p in pa] == [p["label"] for p in pb]
        for x, y in zip(pa, pb):
            assert abs(x["confidence"] - y["confidence"]) <= 1
print("SHARDED-E2E-OK")
"""
    r = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=1200,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin", "PYTHONPATH": str(Path(__file__).parent.parent), "HOME": "/root"},
    )
    assert r.returncode == 0 and "SHARDED-E2E-OK" in r.stdout, r.stderr[-2000:]


# ---------------------------------------------------------------------------
# differential fuzz: mixed-length batches vs the single-recording pipeline
# ---------------------------------------------------------------------------


def _rec_end_tone(seed, seconds):
    """Noise floor + a tone ending exactly at the recording end — the
    short-track clamp geometry that distinguishes true-length window
    planning from padded-bucket planning (the r3 serve band-pass bug)."""
    rng = np.random.RandomState(seed)
    n = int(seconds * SR)
    t = np.arange(n) / SR
    y = 0.01 * rng.randn(n).astype(np.float32)
    dur = min(1.2, seconds * 0.5)
    m = t >= (seconds - dur)
    y[m] += (0.5 * np.sin(2 * np.pi * 2900 * t[m])).astype(np.float32)
    if seconds >= 8:
        m2 = (t >= 2.0) & (t < 3.0)
        y[m2] += (0.4 * np.sin(2 * np.pi * 3400 * t[m2])).astype(np.float32)
    return y


def _assert_matches_single(got, ref):
    assert got["duration"] == pytest.approx(ref["duration"])
    assert got["chirps"]["signals"] == ref["chirps"]["signals"]
    assert got["cacophony_index"] == ref["cacophony_index"]
    assert len(got["species_identify"]) == len(ref["species_identify"])
    for a, b in zip(got["species_identify"], ref["species_identify"]):
        assert a["begin_s"] == pytest.approx(b["begin_s"])
        assert a["end_s"] == pytest.approx(b["end_s"])
        for mra, mrb in zip(a["model_results"], b["model_results"]):
            pa, pb = mra["predictions"], mrb["predictions"]
            assert [p["label"] for p in pa] == [p["label"] for p in pb]
            for x, y in zip(pa, pb):
                assert abs(x["confidence"] - y["confidence"]) <= 1


@pytest.mark.parametrize("filtered", [False, True])
def test_batch_matches_single_fuzz_lengths(model_dir, tmp_path, filtered):
    """One mixed-length batch (recordings from 2.5 s up to the full 12 s
    bucket, every one with a tone anchored at its end) against the
    single-recording pipeline, on both the fused path and the band-pass
    slow path. Catches any divergence between bucketed serving and the
    reference-parity path under end-of-recording clamping, short-track
    padding, and per-track filtering."""
    if filtered:
        d = tmp_path / "fuzzfm"
        d.mkdir()
        inp = tf.keras.Input((64, 226, 1))
        x = tf.keras.layers.Conv2D(4, 3, strides=4, padding="same", activation="relu")(inp)
        x = tf.keras.layers.GlobalAveragePooling2D()(x)
        out = tf.keras.layers.Dense(len(LABELS), activation="softmax")(x)
        tf.keras.Model(inp, out).save(str(d / "audioModel.keras"))
        (d / "metadata.txt").write_text(
            json.dumps(
                {
                    "name": "fuzzfilter",
                    "labels": LABELS,
                    "n_mels": 64,
                    "hop_length": 640,
                    "htk": True,
                    "threshold": 0.2,
                    "normalize": True,
                    "filter_below": 20000,
                }
            )
        )
    else:
        d = model_dir
    lengths = [2.5, 5.5, 9, 12]
    recs = [_rec_end_tone(40 + i, s) for i, s in enumerate(lengths)]
    analyzer = BatchAnalyzer([str(d)], sr=SR, bucket_seconds=12, rng=None)
    batch = analyzer.analyse_recordings(recs)
    assert len(batch) == len(recs)
    n_tracks = 0
    for rec, got in zip(recs, batch):
        ref = _single_pipeline_result(rec, d)
        _assert_matches_single(got, ref)
        n_tracks += len(got["species_identify"])
    assert n_tracks >= len(recs)  # every recording's end tone must track


def test_batch_filter_seeded_rng_matches_single(tmp_path):
    """With a SEEDED rng and a band-pass config whose tracks are shorter
    than segment_length (so window planning draws random pad offsets), the
    batch path must consume the rng exactly like the single-recording
    pipeline: plan once per recording. (Regression: _infer_with_filters
    used to RE-plan after _finish had already planned, double-drawing the
    rng — seeded batch windows landed at different offsets than a seeded
    single run.)"""
    d = tmp_path / "fmseed"
    d.mkdir()
    inp = tf.keras.Input((64, 226, 1))
    x = tf.keras.layers.Conv2D(4, 3, strides=4, padding="same", activation="relu")(inp)
    x = tf.keras.layers.GlobalAveragePooling2D()(x)
    out = tf.keras.layers.Dense(len(LABELS), activation="softmax")(x)
    tf.keras.Model(inp, out).save(str(d / "audioModel.keras"))
    (d / "metadata.txt").write_text(
        json.dumps(
            {
                "name": "fseed",
                "labels": LABELS,
                "n_mels": 64,
                "hop_length": 640,
                "htk": True,
                "threshold": 0.2,
                "normalize": True,
                "filter_below": 20000,
            }
        )
    )
    rec = _rec(33)  # ~1 s tones -> tracks < segment_length -> offset draws
    rng_b = np.random.RandomState(3)
    analyzer = BatchAnalyzer([str(d)], sr=SR, bucket_seconds=12, rng=rng_b)
    got = analyzer.analyse_recordings([rec])[0]
    rng_s = np.random.RandomState(3)
    tracks, length, signals, raw_length, bird_labels = classify_frames(
        rec, SR, [str(d)], False, None, rng=rng_s
    )
    # both paths must have consumed the SAME draws: the next value from
    # each rng agrees only if the draw counts (and thus the offsets every
    # window actually used) were identical — integer confidences alone can
    # absorb a shifted window, this cannot
    assert rng_b.randint(0, 2**31) == rng_s.randint(0, 2**31)
    for t in tracks:
        t.set_master_tag()
    ref = [t.get_meta() for t in tracks]
    assert len(got["species_identify"]) == len(ref) >= 1
    # guard against vacuity: the double-draw regression lives in the
    # band-pass branch, which is taken only when a track's freq_end is
    # below filter_below — pin that the fixture still triggers it
    assert all(
        t["freq_end"] < 20000 for t in got["species_identify"]
    ), "fixture no longer exercises the filter_below band-pass branch"
    for a, b in zip(got["species_identify"], ref):
        pa = a["model_results"][0]["predictions"]
        pb = b["model_results"][0]["predictions"]
        # identical rng draws -> identical windows -> identical confidences
        assert pa == pb


def test_prewarm_compiles_everything_and_preserves_seeded_results(model_dir):
    """prewarm() leaves no classify program left to compile for a
    typical same-bucket batch, and a seeded analyzer produces the exact
    same results whether or not it was prewarmed (prewarm planning draws
    from a PRIVATE rng, never the shared one)."""
    import importlib

    # the pipeline package exposes a `classify` FUNCTION that shadows the
    # submodule attribute — go through importlib for the module itself
    cls = importlib.import_module("audio_analysis_tpu.pipeline.classify")

    recs = [
        (np.clip(_rec(s), -1, 1) * 32767).astype(np.int16) for s in (0, 1)
    ]

    warmed = BatchAnalyzer(
        [str(model_dir)], sr=SR, bucket_seconds=12, rng=np.random.RandomState(7)
    )
    stages = warmed.prewarm(batch_size=2)
    assert stages.get("dispatch", 0) > 0  # it really ran a batch
    n_programs = len(cls._GROUP_PROGRAMS)
    got = warmed.analyse_recordings(recs)
    # the real batch (same bucket, typical track counts) found every
    # fused program already compiled
    assert len(cls._GROUP_PROGRAMS) == n_programs

    cold = BatchAnalyzer(
        [str(model_dir)], sr=SR, bucket_seconds=12, rng=np.random.RandomState(7)
    )
    ref = cold.analyse_recordings(recs)
    assert json.dumps(got, sort_keys=True, default=str) == json.dumps(
        ref, sort_keys=True, default=str
    )


def _labels_only_oracle(rec, md, model_dirs):
    """Single-path analyse-tracks result (pipeline/analysis.py:43-72 with
    analyse_tracks=True: filter_by_location -> master tags -> labels only)."""
    from audio_analysis_tpu.io.modelconfig import NON_BIRD
    from audio_analysis_tpu.pipeline.ebird import filter_by_location

    res = classify_frames(rec, SR, model_dirs, True, md, rng=None)
    if res is None:
        return {
            "non_bird_tags": NON_BIRD,
            "species_identify": [],
            "species_identify_version": "2025-12-01",
        }
    tracks, *_ = res
    if md is not None:
        filter_by_location(md, tracks)
    for t in tracks:
        t.set_master_tag()
    return {
        "non_bird_tags": NON_BIRD,
        "species_identify": [t.get_meta() for t in tracks],
        "species_identify_version": "2025-12-01",
    }


def _assert_tracks_equal(got_list, ref_list):
    assert len(got_list) == len(ref_list)
    for a, b in zip(got_list, ref_list):
        assert a["begin_s"] == pytest.approx(b["begin_s"])
        assert a["end_s"] == pytest.approx(b["end_s"])
        assert a.get("track_id") == b.get("track_id")
        assert len(a["model_results"]) == len(b["model_results"])
        ma = a.get("master_tag", {}).get("prediction", {}).get("label")
        mb = b.get("master_tag", {}).get("prediction", {}).get("label")
        assert ma == mb
        for ra, rb in zip(a["model_results"], b["model_results"]):
            pa, pb = ra["predictions"], rb["predictions"]
            assert [p["label"] for p in pa] == [p["label"] for p in pb]
            assert [p["filtered"] for p in pa] == [p["filtered"] for p in pb]
            for x, y in zip(pa, pb):
                assert abs(x["confidence"] - y["confidence"]) <= 1


def test_batch_analyse_tracks_matches_single(model_dir):
    """analyse_tracks mode: tracks come from sidecar metadata, detection is
    skipped, and results carry labels only (no chirps/cacophony block) —
    exactly the single path's schema (pipeline/analysis.py:55-69)."""
    recs = [_rec(0), _rec(1)]
    metas = [
        {
            "Tracks": [
                {"id": 11, "start": 1.5, "end": 4.0, "minFreq": 1000, "maxFreq": 6000},
                {"id": 12, "start": 6.5, "end": 8.5},
            ]
        },
        {"Tracks": [{"id": 21, "start": 0.5, "end": 3.5, "minFreq": 2000, "maxFreq": 4000}]},
    ]
    analyzer = BatchAnalyzer([str(model_dir)], sr=SR, bucket_seconds=12, rng=None)
    got = analyzer.analyse_recordings(recs, meta_data=metas, analyse_tracks=True)
    assert len(got) == 2
    for rec, md, g in zip(recs, metas, got):
        ref = _labels_only_oracle(rec, md, [str(model_dir)])
        assert set(g.keys()) == set(ref.keys())  # no chirps/cacophony keys
        assert g["non_bird_tags"] == ref["non_bird_tags"]
        assert g["species_identify_version"] == ref["species_identify_version"]
        _assert_tracks_equal(g["species_identify"], ref["species_identify"])
        assert [t["track_id"] for t in g["species_identify"]] == [
            t["id"] for t in md["Tracks"]
        ]

    # a recording with no metadata -> empty track list (the single path
    # returns None; the batch path emits the same empty-labels result)
    got2 = analyzer.analyse_recordings([recs[0]], meta_data=[None], analyse_tracks=True)
    assert got2[0]["species_identify"] == []
    assert "chirps" not in got2[0]


def test_batch_location_filter_matches_single(tmp_path):
    """Sidecar location metadata drives eBird filtering in batch serving
    exactly like the single path (filter_by_location before master tags) —
    previously batch results were silently unfiltered."""
    from audio_analysis_tpu.pipeline.ebird import filter_by_location

    d = tmp_path / "ebirdnet"
    d.mkdir()
    tf.keras.utils.set_random_seed(5)
    inp = tf.keras.Input((64, 226, 1))
    x = tf.keras.layers.Conv2D(4, 3, strides=4, padding="same", activation="relu")(inp)
    x = tf.keras.layers.GlobalAveragePooling2D()(x)
    out = tf.keras.layers.Dense(len(LABELS), activation="softmax")(x)
    tf.keras.Model(inp, out).save(str(d / "audioModel.keras"))
    (d / "metadata.txt").write_text(
        json.dumps(
            {
                "name": "ebirdnet",
                "labels": LABELS,
                # fake ids never observed anywhere -> any kept prediction
                # with an id gets marked filtered and a generic bird re-added
                "ebird_ids": [["zzz_fake_a"], ["zzz_fake_b"], None, None],
                "segment_length": 3,
                "segment_stride": 1.5,
                "hop_length": 640,
                "n_mels": 64,
                "break_freq": 1750,
                "htk": True,
                "threshold": 0.05,
                "normalize": True,
            }
        )
    )
    meta = {"location": {"lat": -36.85, "lng": 174.76}}  # Auckland

    recs = [_rec(3), _rec(4)]
    analyzer = BatchAnalyzer([str(d)], sr=SR, bucket_seconds=12, rng=None)
    got = analyzer.analyse_recordings(recs, meta_data=[meta, meta])

    saw_filtered = False
    for rec, g in zip(recs, got):
        tracks, *_ = classify_frames(rec, SR, [str(d)], False, None, rng=None)
        filter_by_location(meta, tracks)
        for t in tracks:
            t.set_master_tag()
        ref = [t.get_meta() for t in tracks]
        _assert_tracks_equal(g["species_identify"], ref)
        saw_filtered = saw_filtered or any(
            p["filtered"]
            for t in g["species_identify"]
            for r in t["model_results"]
            for p in r["predictions"]
        )
    assert saw_filtered  # the fixture genuinely exercises the filter


def test_batch_analyse_tracks_adversarial_geometry(model_dir):
    """Metadata tracks with hostile geometry — out-of-band frequencies,
    sub-window tracks, a zero-length box, an empty Tracks list, missing
    freq bounds — behave identically to the single path."""
    recs = [_rec(5), _rec(6, seconds=4), _rec(7)]
    metas = [
        {
            "Tracks": [
                # entirely above the model's band -> no windows planned
                {"id": 1, "start": 0.5, "end": 2.5, "minFreq": 20000, "maxFreq": 23000},
                # far shorter than one segment
                {"id": 3, "start": 3.0, "end": 3.1, "minFreq": 500, "maxFreq": 4000},
            ]
        },
        {"Tracks": []},
        {
            "Tracks": [
                # zero-length box at time 0
                {"id": 4, "start": 0.0, "end": 0.0},
                {"id": 5, "start": 1.0, "end": 11.0, "minFreq": 100, "maxFreq": 11000},
            ]
        },
    ]
    analyzer = BatchAnalyzer([str(model_dir)], sr=SR, bucket_seconds=12, rng=None)
    got = analyzer.analyse_recordings(recs, meta_data=metas, analyse_tracks=True)
    for rec, md, g in zip(recs, metas, got):
        ref = _labels_only_oracle(rec, md, [str(model_dir)])
        _assert_tracks_equal(g["species_identify"], ref["species_identify"])


def test_analyse_tracks_beyond_end_crashes_both_paths(model_dir):
    """Quirk preserved: a metadata track extending FAR past the recording
    end yields all-zero windows; normalize divides 0/0 -> NaN confidences,
    and round(100*NaN) raises ValueError — exactly the reference's fate
    (normalize_data src/identify_tracks.py:199-209 then Prediction :851
    round on a numpy-NaN). Both our paths crash the same way; the watch
    daemon's bisect then isolates and strikes just that file."""
    rec = _rec(8)
    md = {"Tracks": [{"id": 2, "start": 10.0, "end": 20.0}]}
    with pytest.raises(ValueError):
        classify_frames(rec, SR, [str(model_dir)], True, md, rng=None)
    analyzer = BatchAnalyzer([str(model_dir)], sr=SR, bucket_seconds=12, rng=None)
    with pytest.raises(ValueError):
        analyzer.analyse_recordings([rec], meta_data=[md], analyse_tracks=True)


def test_analyse_tracks_sidecar_without_tracks_key_raises_both_paths(model_dir):
    """Quirk preserved: a sidecar that EXISTS but has no "Tracks" key raises
    KeyError on both paths (reference src/identify_tracks.py:425 indexes
    meta_data["Tracks"] unguarded); only meta_data=None degrades to the
    labels-only empty result."""
    rec = _rec(9)
    md = {"foo": 1}
    with pytest.raises(KeyError):
        classify_frames(rec, SR, [str(model_dir)], True, md, rng=None)
    analyzer = BatchAnalyzer([str(model_dir)], sr=SR, bucket_seconds=12, rng=None)
    with pytest.raises(KeyError):
        analyzer.analyse_recordings([rec], meta_data=[md], analyse_tracks=True)
    # md=None: empty labels-only result, no crash (single path returns None)
    got = analyzer.analyse_recordings([rec], meta_data=[None], analyse_tracks=True)
    assert got[0]["species_identify"] == []
