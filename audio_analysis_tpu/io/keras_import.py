"""Read ``.keras`` archives without TensorFlow.

The reference loads released classifiers through the TF C++ runtime
(src/identify_tracks.py:320-322). Here the archive (a zip of config.json +
model.weights.h5) is parsed directly: JSON gives the functional graph, h5py
gives the weights under ``layers/<name>/vars/<i>`` (nested functionals
recurse through ``layers/<name>/layers/...``).
"""

import io
import json
import zipfile
from pathlib import Path

import numpy as np


def read_keras_archive(path):
    """Return (config_dict, weights, meta) where weights maps
    "layer/path" -> [np.ndarray var0, var1, ...] in Keras variable order and
    meta is the archive's metadata.json ({"keras_version": ...} — the
    saving generation changes both graph-ref conventions and some
    activation SEMANTICS, e.g. Keras-2 hard_sigmoid)."""
    path = Path(path)
    if path.is_dir():
        # a model dir containing the archive (reference passes either form)
        candidates = sorted(path.glob("*.keras"))
        if not candidates:
            raise FileNotFoundError(f"no .keras archive in {path}")
        path = candidates[0]
    with zipfile.ZipFile(path) as z:
        config = json.loads(z.read("config.json"))
        h5_bytes = z.read("model.weights.h5")
        try:
            meta = json.loads(z.read("metadata.json"))
        except KeyError:
            meta = {}
    weights = _read_weights_h5(h5_bytes)
    return config, weights, meta


def _read_weights_h5(h5_bytes):
    import h5py

    weights = {}

    def walk(group, prefix):
        for key in group:
            item = group[key]
            if key == "vars" and not hasattr(item, "dtype"):
                arrs = []
                for idx in sorted(item, key=lambda s: int(s)):
                    arrs.append(np.asarray(item[idx]))
                if arrs:
                    weights[prefix.rstrip("/")] = arrs
                continue
            if hasattr(item, "dtype"):  # stray dataset
                continue
            walk(item, prefix + key + "/")

    with h5py.File(io.BytesIO(h5_bytes), "r") as f:
        root = f["layers"] if "layers" in f else f
        walk(root, "")
    return weights
