#!/usr/bin/env python3
"""Convert TF-era model artifacts to this framework's native checkpoint.

Handles:
- TF1/TF2 SavedModel dirs (the legacy morepork ensembles,
  reference: src/identify_morepork.py:30-39) — requires tensorflow;
- .keras archives — converted without TF (weights re-keyed into the native
  npz layout is unnecessary: .keras runs directly via models/keras_graph,
  so this just validates it imports and copies it in place).

Usage:
  python tools/convert_model.py SRC DST_DIR [--labels morepork ...]
"""

import argparse
import json
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def convert_keras(src: Path, dst: Path, labels):
    from audio_analysis_tpu.models.keras_graph import KerasModel

    KerasModel.load(src)  # validate import
    dst.mkdir(parents=True, exist_ok=True)
    shutil.copy(src, dst / "audioModel.keras")
    meta_src = (src.parent if src.is_file() else src) / "metadata.txt"
    if meta_src.exists():
        shutil.copy(meta_src, dst / "metadata.txt")
    elif labels:
        (dst / "metadata.txt").write_text(json.dumps({"labels": labels}, indent=4))
    print(f"validated + staged .keras model at {dst}")


def convert_saved_model(src: Path, dst: Path, labels):
    from audio_analysis_tpu.io.convert import ConversionError
    from audio_analysis_tpu.io.convert import convert_saved_model as _convert

    try:
        _convert(src, dst, labels=labels)
    except ConversionError as e:
        sys.exit(str(e))
    print(f"converted SavedModel -> {dst / 'audioModel.keras'} (logit parity verified)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--labels", nargs="*", default=None)
    args = ap.parse_args()
    src, dst = Path(args.src), Path(args.dst)
    if src.suffix == ".keras" or (src.is_dir() and list(src.glob("*.keras"))):
        convert_keras(src, dst, args.labels)
    elif (src / "saved_model.pb").exists():
        convert_saved_model(src, dst, args.labels)
    else:
        sys.exit(f"unrecognised model artifact: {src}")


if __name__ == "__main__":
    main()
