"""Offline dry-run of tools/verify_released_models.py with local stand-in
model dirs — proves the released-artifact verification harness (VERDICT:
importer logit parity + e2e pipeline, runnable unattended once network
exists) works end to end without the real release."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

TOOLS = Path(__file__).resolve().parent.parent / "tools"
sys.path.insert(0, str(TOOLS))

LABELS = ["bird", "morepork", "human", "noise"]


def _standin_model(d, name, labels=LABELS, seed=0, extra_meta=None):
    d.mkdir(parents=True, exist_ok=True)
    tf.keras.utils.set_random_seed(seed)
    inp = tf.keras.Input((64, 226, 1))
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
        "n_mels": 64,
        "break_freq": 1750,
        "htk": True,
        "threshold": 0.2,
        "normalize": True,
    }
    meta.update(extra_meta or {})
    (d / "metadata.txt").write_text(json.dumps(meta))
    return d


@pytest.mark.slow
def test_verify_harness_offline_dry_run(tmp_path):
    from verify_released_models import main as verify_main

    models = tmp_path / "models"
    _standin_model(models / "bird-model-v2m", "standin-main", seed=1)
    _standin_model(
        models / "pre-model",
        "standin-pre",
        labels=["bird", "human", "noise"],
        seed=2,
        extra_meta={"pre_model": True},
    )
    out = tmp_path / "report.json"
    rc = verify_main(
        ["--models-dir", str(models), "--skip-hub", "--out", str(out)]
    )
    report = json.loads(out.read_text())
    assert rc == 0, report
    assert report["ok"] is True
    assert len(report["models"]) == 2
    for entry in report["models"]:
        assert entry["import"] == "ok"
        assert entry["parity"] == "ok"
        assert entry["parity_max_abs_diff"] < 2e-4
    assert report["pipeline"]["ok"] is True
    assert report["pipeline"]["schema_missing"] == []


def test_verify_harness_reports_missing_models(tmp_path):
    from verify_released_models import main as verify_main

    out = tmp_path / "report.json"
    rc = verify_main(
        ["--models-dir", str(tmp_path / "empty"), "--skip-hub", "--out", str(out)]
    )
    assert rc == 1
    assert json.loads(out.read_text())["ok"] is False
