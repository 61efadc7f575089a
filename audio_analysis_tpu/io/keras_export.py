"""Write fine-tuned weights back into a ``.keras`` archive.

The counterpart of io/keras_import.py: take the ORIGINAL archive (so every
byte we do not understand — metadata.json, compile config, attribute
layout — is preserved verbatim), swap the variable values inside
model.weights.h5, optionally swap config.json (head replacement changes
Dense units), and emit a new archive. The result loads both through this
framework's TF-free importer and through ``tf.keras.models.load_model`` —
i.e. a fine-tuned checkpoint remains a first-class reference-compatible
artifact (the reference loads classifiers at
src/identify_tracks.py:320-322).
"""

import io
import json
import zipfile
from pathlib import Path

import numpy as np


def write_keras_archive(src_path, params, out_path, config=None):
    """Copy the archive at ``src_path`` to ``out_path`` with the variable
    values replaced by ``params`` ({weight_key: [arrays]}, the layout
    read_keras_archive returns). Keys absent from ``params`` keep their
    original values; shape changes (e.g. a replaced head) recreate the
    dataset. ``config``: optional replacement config dict (written as
    config.json)."""
    import h5py

    src_path = Path(src_path)
    if src_path.is_dir():
        candidates = sorted(src_path.glob("*.keras"))
        if not candidates:
            raise FileNotFoundError(f"no .keras archive in {src_path}")
        src_path = candidates[0]

    with zipfile.ZipFile(src_path) as z:
        names = z.namelist()
        members = {n: z.read(n) for n in names}

    buf = io.BytesIO(members["model.weights.h5"])
    with h5py.File(buf, "r+") as f:
        root = f["layers"] if "layers" in f else f
        for key, arrays in params.items():
            group = root.get(key + "/vars")
            if group is None:
                raise KeyError(f"weight key {key!r} not present in the archive")
            for i, arr in enumerate(arrays):
                ds = group.get(str(i))
                if ds is None:
                    raise KeyError(f"variable {key}/vars/{i} not in the archive")
                arr = np.asarray(arr, dtype=ds.dtype)
                if ds.shape == arr.shape:
                    ds[...] = arr
                else:  # replaced head: recreate at the new shape
                    del group[str(i)]
                    group.create_dataset(str(i), data=arr)
    members["model.weights.h5"] = buf.getvalue()
    if config is not None:
        members["config.json"] = json.dumps(config).encode()

    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for n in names:
            z.writestr(n, members[n])
    return out_path
