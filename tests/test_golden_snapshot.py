"""Golden end-to-end regression snapshot.

Runs the full analysis on a deterministic synthetic recording with a
committed native checkpoint and compares against a committed JSON snapshot.
Catches any unintended behaviour drift across refactors (the reference has
no tests at all, SURVEY.md §4 — this is the framework's own regression net).

Regenerate intentionally with:
  AAT_REGEN_GOLDEN=1 python -m pytest tests/test_golden_snapshot.py
"""

import json
import os
from pathlib import Path

import numpy as np
import pytest

from audio_analysis_tpu.pipeline.classify import classify_frames
from audio_analysis_tpu.pipeline.cacophony import (
    calc_cacophony_index,
    filter_tracks,
    get_chirps,
    get_max_chirps,
)

SR = 48000
DATA = Path(__file__).parent / "data"
MODEL = DATA / "golden_model"
SNAPSHOT = DATA / "golden_snapshot.json"


def _recording():
    rng = np.random.RandomState(123)
    t = np.arange(20 * SR) / SR
    y = 0.01 * rng.randn(len(t)).astype(np.float32)
    for f0, sweep, t0, dur in [
        (2800, 300, 2.0, 0.9),
        (3500, -400, 8.0, 1.1),
        (1800, 200, 14.0, 0.7),
    ]:
        m = (t >= t0) & (t < t0 + dur)
        phase = 2 * np.pi * (f0 * t[m] + sweep * (t[m] - t0) ** 2)
        y[m] += (0.5 * np.sin(phase)).astype(np.float32)
    return y


def _run():
    tracks, length, signals, raw_length, bird_labels = classify_frames(
        _recording(), SR, [str(MODEL)], False, None, rng=None
    )
    for t in tracks:
        t.set_master_tag()
    rec_signals = [s.to_array() for s in signals]
    chirps = get_chirps(tracks, bird_labels, signals)
    ci, _ = calc_cacophony_index(filter_tracks(tracks), length)
    return {
        "duration": raw_length,
        "length": length,
        "signals": rec_signals,
        "chirps": chirps,
        "max_chirps": get_max_chirps(length),
        "cacophony_index": ci,
        "tracks": [t.get_meta() for t in tracks],
    }


def _normalise(obj):
    """Round floats for a stable cross-platform comparison."""
    if isinstance(obj, dict):
        return {k: _normalise(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_normalise(v) for v in obj]
    if isinstance(obj, float):
        return round(obj, 3)
    return obj


def test_golden_snapshot():
    got = _normalise(json.loads(json.dumps(_run())))
    if os.environ.get("AAT_REGEN_GOLDEN") or not SNAPSHOT.exists():
        SNAPSHOT.write_text(json.dumps(got, indent=2, sort_keys=True))
        pytest.skip("golden snapshot (re)generated")
    ref = _normalise(json.loads(SNAPSHOT.read_text()))

    assert got["signals"] == ref["signals"]
    assert got["chirps"] == ref["chirps"]
    assert got["cacophony_index"] == ref["cacophony_index"]
    assert len(got["tracks"]) == len(ref["tracks"])
    for a, b in zip(got["tracks"], ref["tracks"]):
        assert a["begin_s"] == b["begin_s"] and a["end_s"] == b["end_s"]
        assert a["freq_start"] == b["freq_start"] and a["freq_end"] == b["freq_end"]
        pa = a["model_results"][0]["predictions"]
        pb = b["model_results"][0]["predictions"]
        assert [p["label"] for p in pa] == [p["label"] for p in pb]
        for x, y in zip(pa, pb):
            assert abs(x["confidence"] - y["confidence"]) <= 1
        ma = a.get("master_tag", {}).get("prediction", {}).get("label")
        mb = b.get("master_tag", {}).get("prediction", {}).get("label")
        assert ma == mb
