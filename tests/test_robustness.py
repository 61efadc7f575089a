"""Edge-input robustness: silence, very short recordings, batch CLI."""

import json
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from audio_analysis_tpu.io.audio import write_wav
from audio_analysis_tpu.cli.analyse import run as cli_run
from audio_analysis_tpu.cli.batch import run as batch_run

SR = 48000


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("robustmodel")
    inp = tf.keras.Input((32, 226, 1))
    x = tf.keras.layers.Conv2D(4, 3, strides=4, padding="same", activation="relu")(inp)
    x = tf.keras.layers.GlobalAveragePooling2D()(x)
    out = tf.keras.layers.Dense(3, activation="softmax")(x)
    tf.keras.Model(inp, out).save(str(d / "audioModel.keras"))
    (d / "metadata.txt").write_text(
        json.dumps(
            {
                "name": "robustnet",
                "labels": ["bird", "human", "noise"],
                "n_mels": 32,
                "hop_length": 640,
                "htk": True,
                "threshold": 0.2,
            }
        )
    )
    return d


def test_silence_produces_empty_tracks(model_dir, tmp_path, capsys):
    p = tmp_path / "silence.wav"
    write_wav(p, np.zeros(10 * SR, np.float32), SR)
    cli_run(["-o", str(p), "--bird-model", str(model_dir), "--seed", "0"])
    parsed = json.loads(capsys.readouterr().out)
    assert parsed["species_identify"] == []
    # silence: the end-scan finds a flat first chunk -> length 0
    assert parsed["chirps"]["chirps"] == 0
    assert json.dumps(parsed)  # schema JSON-serialisable, no NaN leakage


def test_very_short_recording(model_dir, tmp_path, capsys):
    rng = np.random.RandomState(0)
    p = tmp_path / "short.wav"
    y = (0.1 * rng.randn(int(0.9 * SR))).astype(np.float32)
    write_wav(p, y, SR)
    cli_run(["-o", str(p), "--bird-model", str(model_dir), "--seed", "0"])
    parsed = json.loads(capsys.readouterr().out)
    assert parsed["duration"] == pytest.approx(0.9, abs=0.05)


def test_batch_cli(model_dir, tmp_path, capsys):
    rng = np.random.RandomState(1)
    files = []
    for i in range(3):
        t = np.arange(8 * SR) / SR
        y = (0.01 * rng.randn(len(t))).astype(np.float32)
        m = (t > 2) & (t < 3)
        phase = 2 * np.pi * (2800 * t[m] + 300 * (t[m] - 2) ** 2)
        y[m] += (0.5 * np.sin(phase)).astype(np.float32)
        p = tmp_path / f"r{i}.wav"
        write_wav(p, y, SR)
        files.append(str(p))

    results = batch_run(["-o", "--bird-model", str(model_dir), "--batch-size", "2", "--seed", "0", *files])
    parsed = json.loads(capsys.readouterr().out)
    assert len(parsed) == 3
    assert [r["file"] for r in parsed] == files
    for r in parsed:
        assert "species_identify" in r["analysis"]
        assert len(r["analysis"]["species_identify"]) >= 1


def test_batch_cli_sidecars(model_dir, tmp_path):
    rng = np.random.RandomState(2)
    y = (0.05 * rng.randn(6 * SR)).astype(np.float32)
    p = tmp_path / "s.wav"
    write_wav(p, y, SR)
    batch_run(["--bird-model", str(model_dir), str(p)])
    side = json.loads((tmp_path / "s.txt").read_text())
    assert "analysis_result" in side


def test_watch_bisect_isolates_poison_file(tmp_path):
    """A batch-level analysis failure must strike only the poison file:
    the chunk is bisected so healthy neighbours still get analysed and
    written (advisor finding: the sorted chunk otherwise re-forms each
    poll and healthy files exhaust their 3-strike budget alongside it)."""
    from audio_analysis_tpu.cli.batch import _analyse_chunk

    class FakeAnalyzer:
        def analyse_recordings(self, recs, **kw):
            if any(r is None for r in recs):
                raise RuntimeError("poison recording")
            return [{"ok": True} for _ in recs]

    files = [tmp_path / f"r{i}.wav" for i in range(4)]
    for f in files:
        f.write_bytes(b"")
    recs = [object(), None, object(), object()]  # r1 is poison
    fail_counts, done = {}, set()
    import time

    _analyse_chunk(FakeAnalyzer(), files, recs, fail_counts, done, time.time())
    # only the poison file accumulated a strike; the rest completed
    assert fail_counts == {files[1]: 1}
    assert done == {files[0], files[2], files[3]}
    for f in done:
        assert json.loads((tmp_path / (f.stem + ".txt")).read_text())[
            "analysis_result"
        ] == {"ok": True, "processing_time_seconds": pytest.approx(0, abs=10)}


def test_watch_sidecar_write_failure_strikes_only_its_file(tmp_path, monkeypatch):
    """One failing sidecar write must not discard the batch's other
    results or strike already-written files."""
    import audio_analysis_tpu.cli.batch as batch_mod

    class FakeAnalyzer:
        def analyse_recordings(self, recs, **kw):
            return [{"ok": i} for i in range(len(recs))]

    files = [tmp_path / f"w{i}.wav" for i in range(3)]
    for f in files:
        f.write_bytes(b"")
    real_write = batch_mod.write_sidecar_result

    def flaky_write(fname, result):
        if fname == files[1]:
            raise OSError("disk full")
        real_write(fname, result)

    monkeypatch.setattr(batch_mod, "write_sidecar_result", flaky_write)
    fail_counts, done = {}, set()
    import time

    batch_mod._analyse_chunk(
        FakeAnalyzer(), files, [object()] * 3, fail_counts, done, time.time()
    )
    assert fail_counts == {files[1]: 1}
    assert done == {files[0], files[2]}
    assert (tmp_path / "w0.txt").exists() and (tmp_path / "w2.txt").exists()
    assert not (tmp_path / "w1.txt").exists()


def test_watch_recycles_on_rss_threshold(tmp_path, monkeypatch):
    """--recycle-rss-mb re-execs the daemon (same argv, -m module form)
    when host RSS crosses the threshold AFTER analysis work happened; the
    sidecar completion records make the restart lossless. Motivated by
    the measured remote-tunnel PJRT client leak (RSS grows by every
    uploaded byte, tools/leak_repro_axon.py) — the daemon itself must
    bound its footprint on such hosts."""
    import sys
    import numpy as np
    import audio_analysis_tpu.cli.batch as batch_mod

    calls = []
    monkeypatch.setattr(batch_mod, "_rss_mb", lambda: 9999.0)
    monkeypatch.setattr(
        __import__("os"), "execv", lambda exe, argv: calls.append((exe, argv))
    )
    monkeypatch.setattr(
        batch_mod, "load_recording",
        lambda f, resample=None, prefer_int16=True: (np.zeros(100, np.int16), resample),
    )

    class FakeAnalyzer:
        sr = 48000

        def analyse_recordings(self, recs, **kw):
            return [{} for _ in recs]

    # idle spool: RSS over threshold but no work since exec -> NO recycle
    # (a fresh process's baseline can exceed a low threshold; restarting
    # in a loop would shrink nothing)
    spool = tmp_path / "spool"
    spool.mkdir()
    argv = ["--watch", "--max-polls", "1", "--poll-interval", "0",
            "--recycle-rss-mb", "100", str(spool)]
    args = batch_mod.parse_args(argv)
    batch_mod.watch(args, FakeAnalyzer(), 0.0)
    assert not calls, "idle daemon must not re-exec"

    # pending file -> work happens -> recycle fires with verbatim argv
    (spool / "a.wav").write_bytes(b"\0" * 64)
    batch_mod.watch(args, FakeAnalyzer(), 0.0)
    assert calls, "execv not invoked despite work + RSS over threshold"
    exe, cmd = calls[0]
    assert exe == sys.executable
    assert cmd[:3] == [sys.executable, "-m", "audio_analysis_tpu.cli.batch"]
    assert cmd[3:] == argv  # verbatim argv -> identical daemon config

    # under the threshold: no recycle even with work
    calls.clear()
    monkeypatch.setattr(batch_mod, "_rss_mb", lambda: 50.0)
    (spool / "a.txt").unlink()  # make a.wav pending again
    batch_mod.watch(args, FakeAnalyzer(), 0.0)
    assert not calls


def test_batch_cli_prewarm_runs_before_first_batch(model_dir, tmp_path, monkeypatch):
    """--prewarm compiles on a synthetic batch BEFORE any real file is
    analysed (full-bucket prewarm is exercised for real in test_serve;
    here we pin the CLI contract cheaply)."""
    from audio_analysis_tpu.pipeline.serve import BatchAnalyzer

    calls = []
    monkeypatch.setattr(
        BatchAnalyzer, "prewarm",
        lambda self, batch_size=8, seed=0: calls.append(batch_size) or {"dispatch": 1.0},
    )
    orig = BatchAnalyzer.analyse_recordings

    def spy(self, recs, *a, **kw):
        assert calls, "prewarm must run before the first real batch"
        return orig(self, recs, *a, **kw)

    monkeypatch.setattr(BatchAnalyzer, "analyse_recordings", spy)
    rng = np.random.RandomState(3)
    p = tmp_path / "w.wav"
    write_wav(p, (0.05 * rng.randn(6 * SR)).astype(np.float32), SR)
    batch_run(["--prewarm", "--batch-size", "4", "--bird-model", str(model_dir), str(p)])
    assert calls == [4]
    assert "analysis_result" in json.loads((tmp_path / "w.txt").read_text())


def test_batch_cli_analyse_tracks(model_dir, tmp_path, capsys):
    """--analyse-tracks true: tracks come from each file's sidecar metadata;
    results carry per-track labels only (reference --analyse-tracks)."""
    rng = np.random.RandomState(2)
    t = np.arange(8 * SR) / SR
    y = (0.01 * rng.randn(len(t))).astype(np.float32)
    m = (t > 1) & (t < 5)
    y[m] += (0.4 * np.sin(2 * np.pi * 2500 * t[m])).astype(np.float32)
    p = tmp_path / "tracked.wav"
    write_wav(p, y, SR)
    (tmp_path / "tracked.txt").write_text(
        json.dumps(
            {
                "Tracks": [
                    {"id": 7, "start": 1.0, "end": 5.0, "minFreq": 1500, "maxFreq": 4000},
                    {"id": 8, "start": 6.0, "end": 7.5},
                ]
            }
        )
    )
    batch_run(
        ["--analyse-tracks", "true", "--bird-model", str(model_dir),
         "--seed", "0", str(p)]
    )
    side = json.loads((tmp_path / "tracked.txt").read_text())
    assert side["Tracks"][0]["id"] == 7  # original metadata preserved
    result = side["analysis_result"]
    assert "chirps" not in result and "cacophony_index" not in result
    ids = [t["track_id"] for t in result["species_identify"]]
    assert ids == [7, 8]
    for tr in result["species_identify"]:
        assert tr["model_results"][0]["predictions"]


def test_batch_cli_accepts_directory(model_dir, tmp_path, capsys):
    """Non-watch batch mode expands directory arguments to their audio
    files (the documented FILES_OR_DIR contract), skipping sidecars."""
    rng = np.random.RandomState(4)
    spool = tmp_path / "recs"
    spool.mkdir()
    for i in range(2):
        y = (0.05 * rng.randn(6 * SR)).astype(np.float32)
        write_wav(spool / f"d{i}.wav", y, SR)
    (spool / "notes.txt").write_text("{}")

    results = batch_run(
        ["-o", "--bird-model", str(model_dir), "--seed", "0", str(spool)]
    )
    parsed = json.loads(capsys.readouterr().out)
    assert len(parsed) == len(results) == 2
    assert sorted(r["file"] for r in parsed) == [
        str(spool / "d0.wav"), str(spool / "d1.wav")
    ]


def test_batch_cli_analyse_tracks_sync_upload(model_dir, tmp_path, monkeypatch, capsys):
    """The sync-dispatch stream leg (AAT_ASYNC_UPLOAD=0) threads metadata
    identically to the async default."""
    monkeypatch.setenv("AAT_ASYNC_UPLOAD", "0")
    rng = np.random.RandomState(6)
    p = tmp_path / "s.wav"
    write_wav(p, (0.05 * rng.randn(8 * SR)).astype(np.float32), SR)
    (tmp_path / "s.txt").write_text(
        json.dumps({"Tracks": [{"id": 3, "start": 1.0, "end": 4.0}]})
    )
    batch_run(
        ["--analyse-tracks", "true", "--bird-model", str(model_dir),
         "--seed", "0", str(p)]
    )
    result = json.loads((tmp_path / "s.txt").read_text())["analysis_result"]
    assert [t["track_id"] for t in result["species_identify"]] == [3]
    assert "chirps" not in result


def test_cpu_primary_platform_check():
    """The persistent-compile-cache gate must key on the PRIMARY platform:
    the resolved jax_platforms config is a priority list ("axon,cpu"), and
    a substring check silently disabled the cache in every TPU process
    (round-5 finding — 199 s tunnel compiles were never cached)."""
    from audio_analysis_tpu.utils.runtime import _cpu_primary

    assert _cpu_primary("cpu")
    assert _cpu_primary("cpu,axon")
    assert _cpu_primary(" CPU , axon")
    assert not _cpu_primary("axon,cpu")  # the bug: substring said True
    assert not _cpu_primary("axon")
    assert not _cpu_primary("tpu,cpu")
    assert not _cpu_primary("")
    assert not _cpu_primary(None)
