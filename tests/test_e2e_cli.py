"""End-to-end CLI tests (SURVEY.md §4.5): synthetic WAV + tiny .keras model
through the full analyse pipeline; output schema matches the reference's
(src/analyse.py:155-175, src/identify_tracks.py:1018-1033)."""

import json
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from audio_analysis_tpu.io.audio import write_wav
from audio_analysis_tpu.cli.analyse import run as cli_run

SR = 48000
LABELS = ["bird", "morepork", "human", "noise"]


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    """A tiny classifier over [64, 226, 1] mel windows + metadata.txt."""
    d = tmp_path_factory.mktemp("birdmodel")
    inp = tf.keras.Input((64, 226, 1))
    x = tf.keras.layers.Conv2D(4, 3, strides=4, padding="same", activation="relu")(inp)
    x = tf.keras.layers.GlobalAveragePooling2D()(x)
    out = tf.keras.layers.Dense(len(LABELS), activation="softmax")(x)
    model = tf.keras.Model(inp, out)
    model.save(str(d / "audioModel.keras"))
    meta = {
        "name": "testnet",
        "labels": LABELS,
        "ebird_ids": [[], ["morepo2"], [], []],
        "segment_length": 3,
        "segment_stride": 1.5,
        "hop_length": 640,
        "n_mels": 64,
        "break_freq": 1750,
        "htk": True,
        "fmin": 50,
        "fmax": 11000,
        "power": 2,
        "db_scale": True,
        "threshold": 0.2,
        "n_fft": 4096,
        "normalize": True,
        "bird_labels": ["bird", "morepork"],
    }
    (d / "metadata.txt").write_text(json.dumps(meta))
    return d


@pytest.fixture(scope="module")
def recording(tmp_path_factory):
    d = tmp_path_factory.mktemp("rec")
    rng = np.random.RandomState(0)
    t = np.arange(20 * SR) / SR
    y = 0.01 * rng.randn(len(t)).astype(np.float32)
    for f0, t0, dur in [(3000, 2.0, 0.8), (2600, 8.0, 1.0)]:
        m = (t >= t0) & (t < t0 + dur)
        y[m] += (0.5 * np.sin(2 * np.pi * f0 * t[m])).astype(np.float32)
    p = d / "rec.wav"
    write_wav(p, y, SR)
    return p


def test_cli_full_pipeline_stdout(model_dir, recording, capsys):
    summary = cli_run(
        ["-o", str(recording), "--bird-model", str(model_dir), "--seed", "0"]
    )
    out = capsys.readouterr().out
    parsed = json.loads(out)

    for key in (
        "duration",
        "cacophony_index",
        "cacophony_index_version",
        "chirps",
        "non_bird_tags",
        "species_identify",
        "species_identify_version",
        "processing_time_seconds",
    ):
        assert key in parsed, key

    assert parsed["duration"] == pytest.approx(20.0, abs=0.1)
    assert parsed["cacophony_index_version"] == "2.0"
    assert parsed["species_identify_version"] == "2025-12-01"
    assert parsed["non_bird_tags"] == ["human", "noise", "insect"]
    chirps = parsed["chirps"]
    assert set(chirps) == {"chirps", "max_chirps", "chirp_index", "signals"}
    assert chirps["max_chirps"] == int(20 / 0.26)
    assert len(parsed["species_identify"]) >= 1
    tr = parsed["species_identify"][0]
    for key in ("begin_s", "end_s", "freq_start", "freq_end", "model_results"):
        assert key in tr, key
    mr = tr["model_results"][0]
    assert mr["model"] == "testnet"
    assert mr["pre_model"] is False
    # every prediction entry carries the reference fields
    for p in mr["predictions"]:
        assert set(p) == {"label", "confidence", "filtered", "ebird_id", "threshold_used"}
    if mr["predictions"]:
        assert all(isinstance(p["confidence"], int) for p in mr["predictions"])
    else:
        assert "raw_prediction" in mr
    # master tag was chosen
    assert "master_tag" in tr


def test_cli_sidecar_merge(model_dir, recording, tmp_path):
    import shutil

    wav = tmp_path / "r.wav"
    shutil.copy(recording, wav)
    (tmp_path / "r.txt").write_text(json.dumps({"location": {"lat": -43.5, "lng": 172.6}}))
    cli_run([str(wav), "--bird-model", str(model_dir), "--seed", "0"])
    data = json.loads((tmp_path / "r.txt").read_text())
    assert "analysis_result" in data
    assert data["location"]["lat"] == -43.5  # original keys preserved
    assert "species_identify" in data["analysis_result"]


def test_cli_old_cacophony_index(recording, capsys):
    summary = cli_run(["-o", "--old-cacophony-index", str(recording)])
    parsed = json.loads(capsys.readouterr().out)
    assert parsed["cacophony_index_old_version"] == "2020-01-20_A"
    assert "cacophony_index_old" in parsed


def test_cli_analyse_tracks(model_dir, recording, tmp_path, capsys):
    import shutil

    wav = tmp_path / "m.wav"
    shutil.copy(recording, wav)
    (tmp_path / "m.txt").write_text(
        json.dumps(
            {"Tracks": [{"id": 41, "start": 1.8, "end": 3.2, "minFreq": 1000, "maxFreq": 6000}]}
        )
    )
    summary = cli_run(["-o", str(wav), "--bird-model", str(model_dir), "--analyse-tracks", "true", "--seed", "0"])
    parsed = json.loads(capsys.readouterr().out)
    # analyse-tracks mode: no chirps/cacophony block (reference :157-171)
    assert "chirps" not in parsed
    assert "duration" not in parsed
    assert len(parsed["species_identify"]) == 1
    assert parsed["species_identify"][0]["track_id"] == 41


def test_batch_watch_mode(model_dir, recording, tmp_path):
    """--watch analyses new spool files, skips already-analysed ones
    (sidecar carries analysis_result), and is restart-safe."""
    from audio_analysis_tpu.cli.batch import run as batch_run

    spool = tmp_path / "spool"
    spool.mkdir()
    import shutil

    new = spool / "new.wav"
    done = spool / "done.wav"
    shutil.copy(recording, new)
    shutil.copy(recording, done)
    (spool / "done.txt").write_text(json.dumps({"analysis_result": {"marker": 1}}))
    (spool / "notes.md").write_text("ignored")
    # a truncated sidecar (writer killed mid-dump) must not crash the daemon
    corrupt = spool / "corrupt.wav"
    shutil.copy(recording, corrupt)
    (spool / "corrupt.txt").write_text('{"analysis_resu')

    batch_run(
        ["--watch", "--max-polls", "1", "--poll-interval", "0",
         "--bird-model", str(model_dir), "--seed", "0", str(spool)]
    )
    out = json.loads((spool / "new.txt").read_text())
    assert "species_identify" in out["analysis_result"]
    # the already-analysed file is untouched
    assert json.loads((spool / "done.txt").read_text())["analysis_result"] == {"marker": 1}
    # second run: nothing pending, new.txt unchanged
    before = (spool / "new.txt").read_text()
    batch_run(
        ["--watch", "--max-polls", "1", "--poll-interval", "0",
         "--bird-model", str(model_dir), "--seed", "0", str(spool)]
    )
    assert (spool / "new.txt").read_text() == before
