# Container for the TPU-native audio-analysis framework.
# Mirrors the reference's deployment story (reference: Dockerfile:1-41 — a
# TF base image + ffmpeg + models fetched at build time) with a JAX TPU base.
FROM python:3.12-slim-bookworm

RUN apt-get update && apt-get install -y --no-install-recommends \
        ffmpeg opus-tools g++ \
    && rm -rf /var/lib/apt/lists/*

# JAX with TPU support (libtpu comes from the release wheel)
RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir numpy h5py

WORKDIR /src
COPY audio_analysis_tpu /src/audio_analysis_tpu
COPY pyproject.toml /src/
RUN pip install --no-cache-dir -e /src

# Model artifacts: mount or bake released checkpoints at /models, matching
# the reference's default paths (/models/pre-model/audioModel.keras,
# /models/bird-model-v2m/audioModel.keras).
# ADD https://github.com/TheCacophonyProject/AI-Model/releases/... /models/

ENTRYPOINT ["python3", "-m", "audio_analysis_tpu.cli.analyse"]
