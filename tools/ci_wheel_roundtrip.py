"""CI smoke: from a wheel-installed package, build a tiny .keras model with TF,
import it TF-free through the checkpoint loader, and run one jitted forward.

Exercises the fresh-venv contract from pyproject (h5py is a core dep): a user
who `pip install audio-analysis-tpu` must be able to load a released Cacophony
`.keras` checkpoint (reference fetches them at image build,
/root/reference/Dockerfile:31-37).
"""

import json
import os
import sys
import tempfile
from pathlib import Path

import numpy as np

os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
import jax

jax.config.update("jax_platforms", "cpu")  # CI runners have no accelerator


def main() -> int:
    import tensorflow as tf

    tmp = Path(tempfile.mkdtemp())
    inp = tf.keras.Input((32, 32, 1))
    x = tf.keras.layers.Conv2D(4, 3, padding="same", activation="relu")(inp)
    x = tf.keras.layers.GlobalAveragePooling2D()(x)
    out = tf.keras.layers.Dense(3, activation="softmax")(x)
    model = tf.keras.Model(inp, out)
    model.save(tmp / "audioModel.keras")
    (tmp / "metadata.txt").write_text(
        json.dumps({"name": "ci", "labels": ["a", "b", "bird"], "n_mels": 32})
    )

    from audio_analysis_tpu.models.keras_graph import KerasModel

    km = KerasModel.load(tmp / "audioModel.keras")
    rng = np.random.default_rng(0)
    batch = rng.standard_normal((2, 32, 32, 1)).astype(np.float32)
    got = np.asarray(km(batch))
    want = model.predict(batch, verbose=0)
    assert np.allclose(got, want, atol=1e-4), (got, want)
    print("wheel round-trip OK: .keras imported TF-free, logits match TF")
    return 0


if __name__ == "__main__":
    sys.exit(main())
