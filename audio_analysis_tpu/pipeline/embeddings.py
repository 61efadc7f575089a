"""TF-Hub embedding models (optional capability, network/TF-gated).

The reference supports ``name == "embeddings"`` models via Google's
bird-vocalization-classifier at 32 kHz / 5 s windows and a dead YAMNet path
(src/identify_tracks.py:330-384). Those require tensorflow_hub and network
access; this module ports the sample-windowing (which is pure) and gates the
hub call with a clear error when the dependency is absent.
"""

import numpy as np


def get_chirp_samples(rec_data, tracks, sr=32000, stride=1, length=5):
    """Per-track fixed-length windows for embedding models
    (reference: src/identify_tracks.py:330-350)."""
    samples = []
    sr_length = int(length * sr)
    sr_stride = stride * sr
    for track in tracks:
        track_samples = []
        start = int(track.start * sr)
        while True:
            end = start + sr_length
            s = rec_data[start:end]
            if len(s) < length * sr:
                s = np.pad(s, (0, int(length * sr - len(s))))
            start += sr_stride
            track_samples.append(s)
            if end / sr > track.end:
                break
        samples.append(track_samples)
    return samples


def chirp_embeddings(frames, sr, tracks, stride=5):
    """Embed track windows with the TF-Hub bird-vocalization-classifier
    (reference: src/identify_tracks.py:353-368). Requires tensorflow_hub."""
    try:
        import tensorflow_hub as hub
    except ImportError as e:
        raise RuntimeError(
            "embeddings models need tensorflow_hub, which is not available "
            "in this environment"
        ) from e
    from audio_analysis_tpu.ops.resample import resample

    rec_data = np.asarray(resample(frames, sr, 32000))
    samples = get_chirp_samples(rec_data, tracks, sr=32000, stride=stride)
    model = hub.load("https://tfhub.dev/google/bird-vocalization-classifier/1")
    embeddings = []
    for track_sample in samples:
        track_embeddings = []
        for s in track_sample:
            logits, embedding = model.infer_tf(s[np.newaxis, :])
            track_embeddings.append(embedding[0])
        embeddings.append(track_embeddings)
    return embeddings
