"""Model zoo: JAX-native classifiers + a Keras-graph importer/executor.

The reference ships TF/Keras CNN classifiers loaded from ``.keras`` archives
(reference: src/identify_tracks.py:302-327). Here released checkpoints import
directly (zipfile + h5py + JSON — no TensorFlow needed) into a functional JAX
executor, and the flagship native model (models.birdnet) provides the
trained-from-scratch path.
"""

from audio_analysis_tpu.models.magtransform import mag_transform
from audio_analysis_tpu.models.keras_graph import KerasModel
from audio_analysis_tpu.models.birdnet import BirdNet

__all__ = ["mag_transform", "KerasModel", "BirdNet"]
