"""Train -> checkpoint -> serve round trip: a natively trained TuiNet
checkpoint loads through the registry and classifies through the full
pipeline (the capability loop the reference never had)."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from audio_analysis_tpu.io.audio import write_wav

SR = 48000


@pytest.mark.slow
def test_train_tool_end_to_end(tmp_path):
    # two trivially separable classes: tone vs noise
    rng = np.random.RandomState(0)
    data = tmp_path / "data"
    for label, make in [
        ("bird", lambda t: 0.5 * np.sin(2 * np.pi * 3000 * t)),
        ("noise", lambda t: 0.2 * rng.randn(len(t))),
    ]:
        d = data / label
        d.mkdir(parents=True)
        for i in range(2):
            t = np.arange(9 * SR) / SR
            write_wav(d / f"{i}.wav", make(t).astype(np.float32), SR)

    out_dir = tmp_path / "model"
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"}
    r = subprocess.run(
        [
            sys.executable,
            str(Path(__file__).resolve().parent.parent / "tools/train_tuinet.py"),
            str(data),
            str(out_dir),
            "--epochs", "2",
            "--batch", "8",
            "--n-mels", "32",
            "--hop-length", "640",
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert (out_dir / "weights.npz").exists()
    meta = json.loads((out_dir / "metadata.txt").read_text())
    assert meta["labels"] == ["bird", "noise"]

    # serve with the trained checkpoint; use a frequency-swept chirp — a
    # bin-centred pure tone is only ~1 FFT bin tall and the reference's 4x4
    # opening (faithfully ported) erases it
    from audio_analysis_tpu.pipeline.serve import BatchAnalyzer

    t = np.arange(10 * SR) / SR
    rec = (0.01 * rng.randn(len(t))).astype(np.float32)
    m = (t > 2) & (t < 3.2)
    phase = 2 * np.pi * (2800 * t[m] + 250 * (t[m] - 2) ** 2)
    rec[m] += (0.6 * np.sin(phase)).astype(np.float32)
    analyzer = BatchAnalyzer([str(out_dir)], sr=SR, bucket_seconds=10, rng=None)
    results = analyzer.analyse_recordings([rec])
    assert len(results) == 1
    assert len(results[0]["species_identify"]) >= 1
