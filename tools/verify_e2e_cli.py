#!/usr/bin/env python3
"""Broad on-chip e2e CLI verification (VERDICT r4 next #7).

Runs the remaining CLI legs the round-3 on-chip verify didn't cover, each
through the REAL public entry point (cli.analyse.run) on the current
backend, and writes a VERIFY artifact with the emitted JSON:

  1. default pipeline (-o, seeded)
  2. --old-cacophony-index
  3. --analyse-tracks with a sidecar "Tracks" file
  4. a band-pass model config (filter_below -> per-track Butterworth path)
  5. --morepork-model (legacy detector, 2-member ensemble)

Usage:
  python tools/verify_e2e_cli.py --out VERIFY_R5_TPU.json          # real TPU
  python tools/verify_e2e_cli.py --cpu --out VERIFY_R5_CPU.json    # oracle

Run both and diff: everything except processing_time_seconds must be
byte-identical (the fixtures are seeded, so model weights match across
processes). Reference legs: /root/reference/src/analyse.py:382-420.
"""

import argparse
import contextlib
import io
import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os

FIX = Path(os.environ.get("AAT_VERIFY_FIX_DIR", "/tmp/verify_r5_broad"))
SR = 48000


def build_fixtures():
    """Seeded model dirs + WAV + sidecars, reused across backend runs."""
    import numpy as np
    import tensorflow as tf

    from audio_analysis_tpu.io.audio import write_wav

    FIX.mkdir(parents=True, exist_ok=True)
    done = FIX / ".built"
    if done.exists():
        return
    tf.keras.utils.set_random_seed(0)

    labels = ["bird", "morepork", "human", "noise"]
    meta = {
        "name": "testnet", "labels": labels,
        "ebird_ids": [[], ["morepo2"], [], []],
        "segment_length": 3, "segment_stride": 1.5, "hop_length": 640,
        "n_mels": 64, "break_freq": 1750, "htk": True, "fmin": 50,
        "fmax": 11000, "power": 2, "db_scale": True, "threshold": 0.2,
        "n_fft": 4096, "normalize": True, "bird_labels": ["bird", "morepork"],
    }
    for name, extra in (("model", {}), ("bandpass", {"filter_below": 20000})):
        d = FIX / name
        d.mkdir(exist_ok=True)
        inp = tf.keras.Input((64, 226, 1))
        x = tf.keras.layers.Conv2D(
            4, 3, strides=4, padding="same", activation="relu"
        )(inp)
        x = tf.keras.layers.GlobalAveragePooling2D()(x)
        out = tf.keras.layers.Dense(len(labels), activation="softmax")(x)
        tf.keras.Model(inp, out).save(str(d / "audioModel.keras"))
        (d / "metadata.txt").write_text(json.dumps({**meta, **extra}))

    # legacy morepork ensemble in the REFERENCE'S input format: TF
    # SavedModel dirs (model_paths discovers saved_model.pb,
    # reference src/identify_morepork.py:30-39) — exercises the
    # auto-convert-to-.keras ingestion, not just the converted artifact
    import tf_keras as tk

    tk.utils.set_random_seed(0)
    mp_root = FIX / "morepork"
    for i in range(2):
        d = mp_root / f"mp{i}"
        d.mkdir(parents=True, exist_ok=True)
        inp = tk.Input((60, 60, 1))
        x = tk.layers.GlobalAveragePooling2D()(inp)
        out = tk.layers.Dense(
            1, activation="sigmoid",
            bias_initializer=tk.initializers.Constant(4.0),
        )(x)
        tk.Model(inp, out).save(str(d), save_format="tf")

    rng = np.random.RandomState(0)
    t = np.arange(20 * SR) / SR
    y = 0.01 * rng.randn(len(t)).astype(np.float32)
    for f0, t0, dur in [(3000, 2.0, 0.8), (2600, 8.0, 1.0), (800, 14.0, 1.0)]:
        m = (t >= t0) & (t < t0 + dur)
        y[m] += (0.5 * np.sin(2 * np.pi * f0 * t[m])).astype(np.float32)
    write_wav(FIX / "rec.wav", y, SR)
    (FIX / "tracks_sidecar.json").write_text(json.dumps({
        "Tracks": [
            {"id": 41, "start": 1.8, "end": 3.2, "minFreq": 1000,
             "maxFreq": 6000},
            {"id": 42, "start": 7.5, "end": 9.5},
        ]
    }))
    done.write_text("ok")


def run_legs():
    from audio_analysis_tpu.cli.analyse import run as cli_run

    model = FIX / "model"
    legs = {}

    def capture(name, argv, sidecar_src=None):
        t0 = time.time()
        work = FIX / f"work_{name}"
        if work.exists():
            shutil.rmtree(work)
        work.mkdir()
        wav = work / "rec.wav"
        shutil.copy(FIX / "rec.wav", wav)
        if sidecar_src is not None:
            shutil.copy(sidecar_src, work / "rec.txt")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            cli_run([a.replace("@WAV@", str(wav)) for a in argv])
        out = buf.getvalue()
        result = json.loads(out) if out.strip() else None
        sidecar = None
        if (work / "rec.txt").exists():
            sidecar = json.loads((work / "rec.txt").read_text())
        legs[name] = {
            "argv": argv,
            "stdout_json": result,
            "sidecar": sidecar,
            "elapsed_s": round(time.time() - t0, 1),
        }
        print(f"[{name}] ok ({legs[name]['elapsed_s']}s)", flush=True)

    capture("default", ["-o", "@WAV@", "--bird-model", str(model),
                        "--seed", "0"])
    capture("old_cacophony_index", ["-o", "--old-cacophony-index", "@WAV@"])
    capture(
        "analyse_tracks",
        ["-o", "@WAV@", "--bird-model", str(model), "--analyse-tracks",
         "true", "--seed", "0"],
        sidecar_src=FIX / "tracks_sidecar.json",
    )
    capture("bandpass", ["-o", "@WAV@", "--bird-model",
                         str(FIX / "bandpass"), "--seed", "0"])
    capture("morepork", ["-o", "@WAV@", "--bird-model", str(model),
                         "--morepork-model", str(FIX / "morepork"),
                         "--seed", "0"])
    return legs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    build_fixtures()
    legs = run_legs()
    record = {
        "generated": time.strftime("%Y-%m-%d %H:%M:%S"),
        "backend": jax.default_backend(),
        "legs": legs,
    }
    Path(args.out).write_text(json.dumps(record, indent=2))
    print(f"wrote {args.out} (backend={record['backend']})")


if __name__ == "__main__":
    main()
