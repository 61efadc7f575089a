#!/usr/bin/env python3
"""Verify the reference's RELEASED model artifacts against this framework.

This image has no network, so the released Cacophony checkpoints (fetched by
the reference at image build time, /root/reference/Dockerfile:31-37) and the
TF-Hub bird-vocalization-classifier (src/identify_tracks.py:353-368) have
never been executed here. This harness closes that gap the day artifacts are
reachable — run it unattended in any online environment:

  python tools/verify_released_models.py --fetch --models-dir /models
  python tools/verify_released_models.py --models-dir /models   # pre-fetched
  python tools/verify_released_models.py --models-dir D --skip-hub  # offline
                                                                # stand-ins

Stages (each reported in the JSON written to --out):
1. acquire   — optional download of audioModel.tar / premodel.tar from the
               AI-Model release (same URLs as the reference's Dockerfile)
               into the bird-model-v2m/ + pre-model/ layout;
2. import    — every model dir loads TF-free through io/keras_import +
               models/keras_graph and runs a forward pass;
3. parity    — when tensorflow is importable, logits are compared against
               tf.keras on random input (max |diff| must be < --tol);
4. pipeline  — a synthetic chirp WAV runs through the full analyse CLI with
               the released models; the result JSON schema is validated;
5. hub       — unless --skip-hub, the TF-Hub embedder is downloaded, run on
               5 s of audio, and the embeddings classify path is exercised.

Exit code 0 = every attempted stage passed; non-zero otherwise.
"""

import argparse
import json
import sys
import tarfile
import tempfile
import urllib.request
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

RELEASE_URL = (
    "https://github.com/TheCacophonyProject/AI-Model/releases/download/"
    "audio-v{version}/{name}"
)
ARTIFACTS = {  # tar name -> model dir (reference Dockerfile:31-37)
    "audioModel.tar": "bird-model-v2m",
    "premodel.tar": "pre-model",
}
HUB_HANDLE = "https://tfhub.dev/google/bird-vocalization-classifier/1"

RESULT_KEYS = {
    "duration",
    "cacophony_index",
    "cacophony_index_version",
    "chirps",
    "non_bird_tags",
    "species_identify",
    "species_identify_version",
}


def fetch_release(models_dir: Path, version: str, report: dict) -> list:
    models_dir.mkdir(parents=True, exist_ok=True)
    dirs = []
    for tar_name, sub in ARTIFACTS.items():
        url = RELEASE_URL.format(version=version, name=tar_name)
        dest = models_dir / sub
        dest.mkdir(parents=True, exist_ok=True)
        print(f"fetching {url}")
        with tempfile.NamedTemporaryFile(suffix=".tar") as tmp:
            urllib.request.urlretrieve(url, tmp.name)
            with tarfile.open(tmp.name) as tf_:
                # --strip-components=1, like the reference's tar invocation;
                # refuse traversal components and extract with the stdlib
                # 'data' filter (no absolute paths/links outside dest)
                for m in tf_.getmembers():
                    parts = Path(m.name).parts
                    if len(parts) <= 1:
                        continue
                    if ".." in parts or Path(m.name).is_absolute():
                        continue
                    m.name = str(Path(*parts[1:]))
                    tf_.extract(m, dest, filter="data")
        dirs.append(dest)
        report.setdefault("acquire", []).append({"url": url, "dest": str(dest)})
    return dirs


def discover_model_dirs(models_dir: Path) -> list:
    out = []
    for d in sorted(models_dir.iterdir()) if models_dir.is_dir() else []:
        if d.is_dir() and (d / "metadata.txt").exists():
            out.append(d)
    return out


def input_shape_from_config(km) -> tuple:
    """Batch-1 input shape from the archive's InputLayer config."""
    cfg = km.config["config"] if "config" in km.config else km.config
    for layer in cfg["layers"]:
        if layer["class_name"] == "InputLayer":
            shape = layer["config"].get("batch_shape") or layer["config"].get(
                "batch_input_shape"
            )
            return tuple(1 if s is None else int(s) for s in shape)
    raise ValueError("no InputLayer in model config")


def verify_import_and_parity(model_dir: Path, tol: float, report: dict) -> bool:
    from audio_analysis_tpu.models.keras_graph import KerasModel

    entry = {"model": str(model_dir)}
    report.setdefault("models", []).append(entry)
    km = KerasModel.load(model_dir)
    shape = input_shape_from_config(km)
    rng = np.random.RandomState(0)
    x = rng.randn(*shape).astype(np.float32)
    ours = np.asarray(km(x))
    entry["import"] = "ok"
    entry["input_shape"] = list(shape)
    entry["output_shape"] = list(ours.shape)

    try:
        import tensorflow as tf  # noqa: F401
    except Exception:
        entry["parity"] = "skipped (tensorflow not importable)"
        return True
    keras_file = model_dir / "audioModel.keras"
    if not keras_file.exists():
        kerases = list(model_dir.glob("*.keras"))
        if not kerases:
            entry["parity"] = "skipped (no .keras file)"
            return True
        keras_file = kerases[0]
    # Keras-3 archives (what the reference's pinned TF 2.19 writes) load via
    # tf.keras; fall back to tf_keras (Keras 2) for legacy-era artifacts.
    import tensorflow as tf

    try:
        tf_model = tf.keras.models.load_model(str(keras_file), compile=False)
    except Exception:
        import tf_keras

        tf_model = tf_keras.models.load_model(str(keras_file), compile=False)
    theirs = np.asarray(tf_model(x))
    diff = float(np.max(np.abs(ours - theirs)))
    entry["parity_max_abs_diff"] = diff
    entry["parity"] = "ok" if diff < tol else f"FAIL (> {tol})"
    return diff < tol


def fixture_wav(path: Path, seconds=20, sr=48000):
    from audio_analysis_tpu.io.audio import write_wav

    rng = np.random.RandomState(0)
    t = np.arange(seconds * sr) / sr
    y = 0.01 * rng.randn(len(t)).astype(np.float32)
    m = (t > 2) & (t < 3.2)
    y[m] += (0.5 * np.sin(2 * np.pi * (2800 * t[m] + 250 * (t[m] - 2) ** 2))).astype(
        np.float32
    )
    write_wav(path, y, sr)


def verify_pipeline(model_dirs: list, report: dict) -> bool:
    from audio_analysis_tpu.cli.analyse import run as cli_run

    with tempfile.TemporaryDirectory() as td:
        wav = Path(td) / "fixture.wav"
        fixture_wav(wav)
        argv = [str(wav), "--seed", "0"]
        for d in model_dirs:
            argv += ["--bird-model", str(d)]
        cli_run(argv)
        result = json.loads((Path(td) / "fixture.txt").read_text())["analysis_result"]
    missing = RESULT_KEYS - set(result)
    report["pipeline"] = {
        "schema_missing": sorted(missing),
        "n_tracks": len(result.get("species_identify", [])),
        "ok": not missing,
    }
    return not missing


def verify_hub(report: dict) -> bool:
    import tensorflow_hub as hub

    print(f"loading {HUB_HANDLE}")
    model = hub.load(HUB_HANDLE)
    x = np.zeros((1, 5 * 32000), np.float32)
    logits, embedding = model.infer_tf(x)
    report["hub"] = {
        "handle": HUB_HANDLE,
        "logits_shape": list(np.asarray(logits).shape),
        "embedding_shape": list(np.asarray(embedding).shape),
        "ok": True,
    }
    return True


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models-dir", default="/models")
    ap.add_argument("--version", default="0.8")
    ap.add_argument("--fetch", action="store_true",
                    help="download the AI-Model release artifacts first")
    ap.add_argument("--skip-hub", action="store_true")
    ap.add_argument("--tol", type=float, default=2e-4)
    ap.add_argument("--out", default="verify_released_models.json")
    args = ap.parse_args(argv)

    report = {"ok": False}
    models_dir = Path(args.models_dir)
    ok = True
    try:
        if args.fetch:
            fetch_release(models_dir, args.version, report)
        model_dirs = discover_model_dirs(models_dir)
        if not model_dirs:
            print(f"no model dirs (metadata.txt) under {models_dir}", file=sys.stderr)
            ok = False
        for d in model_dirs:
            ok = verify_import_and_parity(d, args.tol, report) and ok
        if model_dirs:
            ok = verify_pipeline(model_dirs, report) and ok
        if not args.skip_hub:
            ok = verify_hub(report) and ok
    except Exception as e:  # report the stage failure, keep the JSON
        report["error"] = f"{type(e).__name__}: {e}"
        ok = False
    report["ok"] = ok
    Path(args.out).write_text(json.dumps(report, indent=2, sort_keys=True))
    print(json.dumps(report, indent=2, sort_keys=True))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
