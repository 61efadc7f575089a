#!/usr/bin/env python3
"""Benchmark: full-pipeline audio throughput on one chip.

Measures the end-to-end analysis path on a synthetic 60 s recording —
end-scan, signal detection (STFT + morphology on device, CCL on host), track
merging, window grid, spectrogram frontend, two-model ensemble forward,
per-track means, master tags, chirps, cacophony index — i.e. everything
between PCM-in and result-JSON-out (decode excluded; there is no ffmpeg in
this image and decode is not a TPU workload).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio-s/s/chip", "vs_baseline": N}

vs_baseline compares against the measured CPU reference-equivalent pipeline
(numpy+cv2+TF on this host, same model architecture; see BASELINE.md and
tools/measure_cpu_baseline.py).
"""

import json
import time
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

# measured by tools/measure_cpu_baseline.py (see BASELINE.md)
DEFAULT_CPU_BASELINE = None  # audio-s/s; None -> read BASELINE_CPU.json


def build_fixture_models(tmp: Path):
    """Two native TuiNet checkpoints (main + pre model), reference metadata
    schema, no TF needed."""
    import jax
    from audio_analysis_tpu.models.birdnet import TuiNetConfig, init_params
    from audio_analysis_tpu.io.checkpoint import save_checkpoint

    labels_main = ["bird", "kiwi", "morepork", "whistler", "noise", "human", "insect", "other"]
    labels_pre = ["bird", "human", "noise"]
    specs = [
        ("bird-model", labels_main, False),
        ("pre-model", labels_pre, True),
    ]
    import zlib

    dirs = []
    for name, labels, pre in specs:
        d = tmp / name
        if not (d / "weights.npz").exists():
            cfg = TuiNetConfig(num_classes=len(labels), n_mels=160)
            # stable digest, not hash(): PYTHONHASHSEED randomises str hashes
            params = init_params(jax.random.PRNGKey(zlib.crc32(name.encode())), cfg)
            save_checkpoint(
                d,
                params,
                {
                    "name": name,
                    "architecture": "tuinet",
                    "labels": labels,
                    "pre_model": pre,
                    "segment_length": 3,
                    "segment_stride": 1.5,
                    "hop_length": 640,
                    "n_mels": 160,
                    "break_freq": 1750,
                    "htk": True,
                    "fmin": 50,
                    "fmax": 11000,
                    "power": 2,
                    "db_scale": True,
                    "threshold": 0.7,
                    "n_fft": 4096,
                    "normalize": True,
                },
            )
        dirs.append(str(d))
    return dirs


def make_recording(seconds=60, sr=48000, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(seconds * sr) / sr
    y = 0.01 * rng.randn(len(t)).astype(np.float32)
    for k, (f0, t0, dur) in enumerate(
        [(3000, 2.0, 0.8), (2600, 8.0, 1.0), (4500, 18.0, 0.5), (2000, 30.0, 1.2), (3500, 45.0, 0.9)]
    ):
        m = (t >= t0) & (t < t0 + dur)
        y[m] += (0.5 * np.sin(2 * np.pi * f0 * t[m])).astype(np.float32)
    return y, sr


def run_analysis(frames, sr, models, rng):
    from audio_analysis_tpu.pipeline.classify import classify_frames
    from audio_analysis_tpu.pipeline.cacophony import (
        calc_cacophony_index,
        filter_tracks,
        get_chirps,
        get_max_chirps,
    )

    tracks, length, signals, raw_length, bird_labels = classify_frames(
        frames, sr, models, False, None, rng=rng
    )
    for t in tracks:
        t.set_master_tag()
    chirps = get_chirps(tracks, bird_labels, signals)
    cacophony_index, _ = calc_cacophony_index(filter_tracks(tracks), length)
    return {
        "duration": raw_length,
        "cacophony_index": cacophony_index,
        "chirps": chirps,
        "tracks": [t.get_meta() for t in tracks],
    }


def build_efficientnet_fixture(tmp: Path):
    """EfficientNetB0 (the reference's flagship scale,
    src/identify_tracks.py:539) over [160, 226, 3] mel windows, built with
    tf.keras once and imported TF-free thereafter. Returns the model dir or
    None when TF is unavailable."""
    d = tmp / "efficientnet-b0"
    labels = ["bird", "kiwi", "morepork", "whistler", "noise", "human", "insect", "other"]
    if not (d / "audioModel.keras").exists():
        try:
            import tensorflow as tf
        except ImportError:
            return None
        tf.keras.utils.set_random_seed(7)
        model = tf.keras.applications.EfficientNetB0(
            weights=None, input_shape=(160, 226, 3), classes=len(labels)
        )
        d.mkdir(parents=True, exist_ok=True)
        model.save(str(d / "audioModel.keras"))
        (d / "metadata.txt").write_text(
            json.dumps(
                {
                    "name": "efficientnet-b0",
                    "labels": labels,
                    "segment_length": 3,
                    "segment_stride": 1.5,
                    "hop_length": 640,
                    "n_mels": 160,
                    "break_freq": 1750,
                    "htk": True,
                    "fmin": 50,
                    "fmax": 11000,
                    "power": 2,
                    "db_scale": True,
                    "threshold": 0.7,
                    "n_fft": 4096,
                    "normalize": True,
                }
            )
        )
    return str(d)


def _force(x):
    """Force execution on axon (block_until_ready does not block there):
    transfer a dependent scalar."""
    import jax.numpy as jnp

    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


V5E_PEAK_FLOPS = 197e12  # bf16 MXU peak, one v5e chip


from contextlib import contextmanager


@contextmanager
def _env(**kv):
    """Temporarily set env vars (the A/B knobs are read at call time)."""
    import os

    old = {k: os.environ.get(k) for k in kv}
    os.environ.update({k: v for k, v in kv.items() if v is not None})
    for k, v in kv.items():
        if v is None:
            os.environ.pop(k, None)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


# the parity legs must not inherit an ambient AAT_FAST/AAT_PALLAS/
# AAT_KERAS_BF16 (e.g. `AAT_FAST=1 python bench.py` would otherwise measure
# fast mode twice and label one of them parity). AAT_ASYNC_UPLOAD is left at
# its default (ON) here — the stream legs pin it explicitly per A/B side.
_PARITY_ENV = dict(AAT_FAST=None, AAT_PALLAS=None, AAT_KERAS_BF16=None)


def bench_mfu(effnet_dir, sr=48000):
    """Windows/s + MFU of the fused gather->frontend->EfficientNetB0->means
    program on a dense 256-window grid, INTERLEAVED A/B between the
    parity-strict mode (f32 compute; split-bf16 exact-Pallas frontend — the
    TPU default, measured MORE accurate than the XLA FFT+einsum it replaced)
    and AAT_FAST (bf16 + Pallas mel) — alternating measured windows so the
    tunnel/host noise hits both modes equally (the round-2 bf16
    contradiction came from non-interleaved runs)."""
    import os
    import jax
    import jax.numpy as jnp
    from audio_analysis_tpu.io.modelconfig import ModelConfig
    from audio_analysis_tpu.models.registry import load_classifier
    from audio_analysis_tpu.pipeline.classify import _fused_group_program

    cfg = ModelConfig.load(Path(effnet_dir))
    with _env(**_PARITY_ENV):
        model = load_classifier(Path(effnet_dir), cfg)
    with _env(AAT_FAST="1"):
        model_fast = load_classifier(Path(effnet_dir), cfg)
    n_windows = 256
    sample_size = int(cfg.segment_length * sr)
    frames = jnp.asarray(
        np.random.RandomState(0).randn(60 * sr).astype(np.float32) * 0.1
    )
    base = np.random.RandomState(1).randint(0, 60 * sr - sample_size, n_windows)
    base = np.sort(base).astype(np.int64)
    vlo = np.zeros(n_windows, np.int32)
    vhi = np.full(n_windows, sample_size, np.int32)
    tidx = np.arange(n_windows, dtype=np.int32) // 8
    n_tracks_b = 32
    with _env(**_PARITY_ENV):
        prog = _fused_group_program([model], cfg, sr, sample_size, n_tracks_b)
    with _env(AAT_FAST="1"):
        prog_fast = _fused_group_program(
            [model_fast], cfg, sr, sample_size, n_tracks_b
        )
    args = (frames, jnp.asarray(base), jnp.asarray(vlo), jnp.asarray(vhi), jnp.asarray(tidx))
    _force(prog(*args))  # compile + warm
    _force(prog_fast(*args))

    flops = None
    try:
        lowered = jax.jit(
            lambda f, b, lo, hi, t: prog(f, b, lo, hi, t)
        ).lower(*args)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
    except Exception:
        pass
    if flops is None:
        # analytic fallback: EfficientNetB0 ~0.39 GMACs at 224x224, scaled
        # by input area, x2 FLOPs/MAC, plus the 4096-FFT frontend
        flops = n_windows * (0.39e9 * (160 * 226) / (224 * 224) * 2 + 226 * 5 * 4096 * np.log2(4096) * 2)

    def measure(p):
        # reps=64: each measurement window carries a ~3.7 ms dispatch+sync
        # floor over the tunnel (measured via an input-only prefix program);
        # at reps=8 that floor inflated per-call time ~25% on the fast
        # program. 64 calls amortize it below 1%.
        reps = 64
        t0 = time.perf_counter()
        for _ in range(reps):
            out = p(*args)
        _force(out)
        return n_windows * reps / (time.perf_counter() - t0)

    best = {"parity": 0.0, "fast": 0.0}
    for _ in range(3):  # interleaved windows, best-of per mode
        best["parity"] = max(best["parity"], measure(prog))
        best["fast"] = max(best["fast"], measure(prog_fast))

    def pack(wps):
        return {
            "windows_per_s": round(wps, 1),
            "mfu_vs_bf16_peak": round(flops / n_windows * wps / V5E_PEAK_FLOPS, 4),
        }

    return {
        "program_gflops_per_window": round(flops / n_windows / 1e9, 3),
        "parity": pack(best["parity"]),
        "fast": pack(best["fast"]),
    }


def bench_latency(models, sr=48000):
    """Warm single-recording latency (the CLI path: detect -> CCL -> plan ->
    infer -> post), median of 10. int16 PCM, like the CLI's 16-bit WAV
    decode fast path."""
    frames = np.clip(make_recording(60, seed=42)[0] * 32768.0, -32768, 32767).astype(
        np.int16
    )
    rng = np.random.RandomState(0)
    run_analysis(frames, sr, models, rng)  # warm
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        run_analysis(frames, sr, models, rng)
        times.append(time.perf_counter() - t0)
    return round(float(np.median(times)), 3)


def bench_breakdown(recordings, sr=48000):
    """Subsystem diagnostics for the headline number: raw-upload wire
    bandwidth (the usual bound on the tunnel-attached chip) and
    detection-only throughput (compute bound)."""
    import jax
    import jax.numpy as jnp
    from audio_analysis_tpu.detect.signal_noise import detect_batch

    stacked = np.zeros((len(recordings), max(len(r) for r in recordings)), np.int16)
    n_valid = np.zeros(len(recordings), np.int32)
    for i, r in enumerate(recordings):
        stacked[i, : len(r)] = r
        n_valid[i] = len(r)
    # wire bandwidth: best-of-3 raw uploads (tunnel swings minute-to-minute)
    up = []
    for _ in range(3):
        t0 = time.perf_counter()
        dev = jnp.asarray(stacked)
        _force(dev[:, :8])
        up.append(stacked.nbytes / (time.perf_counter() - t0) / 1e6)
    detect_batch(dev, n_valid, sr)  # warm
    t0 = time.perf_counter()
    for _ in range(3):
        out = detect_batch(dev, n_valid, sr)
    detect_s = (time.perf_counter() - t0) / 3
    # pipelined detect: dispatch batch k+1 before finishing batch k — the
    # shape every real bulk/stream consumer uses (the dispatch/finish split
    # is the public API). The speculative runs program is dispatched with
    # the batch, so the next batch's big program never jams it.
    from audio_analysis_tpu.detect.signal_noise import (
        detect_batch_dispatch,
        detect_batch_finish,
    )

    reps = 6
    t0 = time.perf_counter()
    h = detect_batch_dispatch(dev, n_valid, sr)
    for _ in range(reps - 1):
        h_next = detect_batch_dispatch(dev, n_valid, sr)
        detect_batch_finish(h)
        h = h_next
    detect_batch_finish(h)
    detect_pipe_s = (time.perf_counter() - t0) / reps
    audio_s = float(n_valid.sum()) / sr
    return {
        "upload_MB_per_s": round(max(up), 1),
        "detect_only_audio_s_per_s": round(audio_s / detect_s, 1),
        "detect_pipelined_audio_s_per_s": round(audio_s / detect_pipe_s, 1),
    }


def bench_wire_invariants(recordings, analyzer, sr=48000):
    """Tunnel-weather-invariant figures (VERDICT r3 #4): the headline
    audio-s/s swings 2x with the tunnel's minute-scale bandwidth, so
    round-over-round comparisons need fields that don't. Wire bytes per
    audio-second is a pure property of the codec; the warm-batch per-stage
    seconds isolate device+host work; and the derived 50 MB/s throughput is
    the wire-bound steady-state model (device compute fully overlaps the
    next batch's transfer — docs/PERFORMANCE.md) evaluated at a fixed
    reference bandwidth instead of whatever the tunnel gave this window."""
    import jax

    from audio_analysis_tpu.io.pcmcodec import encode_pcm, BLOCK
    from audio_analysis_tpu.utils.runtime import StageTimer

    audio_s = sum(len(r) for r in recordings) / sr
    t_bucket = max(len(r) for r in recordings)
    t_bucket = -(-t_bucket // BLOCK) * BLOCK
    stacked = np.zeros((len(recordings), t_bucket), np.int16)
    for i, r in enumerate(recordings):
        stacked[i, : len(r)] = r
    enc = encode_pcm(stacked)
    enc_bytes = sum(
        np.asarray(a).nbytes for a in jax.tree_util.tree_leaves(enc)
    )
    raw_bps = 2 * sr  # int16 PCM
    codec_bps = enc_bytes / audio_s
    # per-stage seconds: median of 3 warm batches (a single run inherits
    # one-sample noise — VERDICT r4 weak #5)
    stage_runs = []
    for _ in range(3):
        timer = StageTimer()
        analyzer.analyse_recordings(recordings, timer=timer)
        stage_runs.append(timer.as_dict())
    stages = {
        k: round(float(np.median([r.get(k, 0.0) for r in stage_runs])), 4)
        for k in stage_runs[0]
    }
    return {
        "codec_bytes_per_audio_s": round(codec_bps, 1),
        "raw_bytes_per_audio_s": raw_bps,
        "wire_ratio": round(codec_bps / raw_bps, 4),
        "stage_seconds_warm_batch_median3": stages,
        "throughput_at_50MBps_wire_bound": round(audio_s * 50e6 / enc_bytes, 1),
    }


def bench_device_resident(recordings, analyzer, sr=48000, reps=6):
    """MEASURED compute-bound ceiling (VERDICT r4 weak #4): the batch's PCM
    is uploaded ONCE, then the full warm pipeline — detect programs, host
    detect-finish (run extraction + CCL), window planning, the fused
    classify programs, and host post — loops against the device-resident
    frames with zero PCM wire transfer per iteration. This is the audio-s/s
    the chip sustains if the wire were free, and the number the derived
    throughput_at_50MBps_wire_bound must stay below to be credible."""
    from audio_analysis_tpu.detect.signal_noise import detect_batch_dispatch

    audio_s = sum(len(r) for r in recordings) / sr
    handle = analyzer._dispatch_prepared(
        analyzer._prepare(recordings, sr, None, False)
    )
    (_dh, frames_dev, n_valid, t_bucket, B, sr_, stacked, md, at) = handle

    def one():
        dh = detect_batch_dispatch(frames_dev, n_valid, sr_)
        return analyzer._finish(
            (dh, frames_dev, n_valid, t_bucket, B, sr_, stacked, md, at)
        )

    results = one()  # warm (detect + classify + post program set)
    assert len(results) == len(recordings)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            one()
        best = max(best, audio_s * reps / (time.perf_counter() - t0))
    return round(best, 1)


def bench_pallas_melspec(sr=48000):
    """A/B the Pallas DFT->mel kernel vs the XLA FFT path on a 128-window
    grid; returns times and the keep/delete verdict input."""
    import jax.numpy as jnp
    from audio_analysis_tpu.pipeline.frontend import spectrogram_grid

    grid = jnp.asarray(
        np.random.RandomState(0).randn(128, 3 * sr).astype(np.float32) * 0.1
    )
    kw = dict(
        sr=sr, hop_length=640, n_fft=4096, n_mels=160, mel_break=1750.0,
        htk=True, power=2.0, db_scale=True, normalize=True,
    )
    out = {}
    for name, use_pallas in (("xla", False), ("pallas", True)):
        try:
            _force(spectrogram_grid(grid, use_pallas=use_pallas, **kw))  # compile
            t0 = time.perf_counter()
            for _ in range(6):
                y = spectrogram_grid(grid, use_pallas=use_pallas, **kw)
            _force(y)
            out[name] = round((time.perf_counter() - t0) / 6 * 1000, 2)
        except Exception as e:  # pallas may be unsupported on a backend
            out[name] = f"error: {type(e).__name__}"
    return out


def main():
    import warnings

    warnings.filterwarnings("ignore")
    tmp = Path("/tmp/aat_bench_models")
    tmp.mkdir(exist_ok=True)
    models = build_fixture_models(tmp)
    effnet_dir = build_efficientnet_fixture(tmp)

    from audio_analysis_tpu.pipeline.serve import BatchAnalyzer

    import os

    batch_size = int(os.environ.get("AAT_BENCH_BATCH", "8"))
    # int16 PCM: what field recorders produce and what the decode path hands
    # over; uploads at half the bytes and converts on device.
    recordings = [
        np.clip(make_recording(60, seed=s)[0] * 32768.0, -32768, 32767).astype(np.int16)
        for s in range(batch_size)
    ]
    sr = 48000
    seconds = sum(len(r) for r in recordings) / sr

    # HEADLINE: the reference-default-shaped ensemble — EfficientNetB0-scale
    # main model + small pre-model (reference analyse.py:415-418). TuiNet
    # pair is the secondary scenario. Parity-strict defaults are the
    # headline number; the AAT_FAST preset (Pallas mel + bf16 compute +
    # wire codec) is measured in the SAME loop, interleaved window-by-window
    # so the tunnel's bandwidth swings hit both modes equally.
    flagship = [effnet_dir, models[1]] if effnet_dir is not None else models
    with _env(**_PARITY_ENV):
        analyzer = BatchAnalyzer(
            flagship, sr=sr, bucket_seconds=60, rng=np.random.RandomState(0)
        )
        analyzer.analyse_recordings(recordings)  # warm / compile
        analyzer.analyse_recordings(recordings)
    with _env(AAT_FAST="1"):
        analyzer_fast = BatchAnalyzer(
            flagship, sr=sr, bucket_seconds=60, rng=np.random.RandomState(0)
        )
        analyzer_fast.analyse_recordings(recordings)
        analyzer_fast.analyse_recordings(recordings)

    runs = 4
    # headline = the default serving path (async upload ON); the explicit
    # sync legs are the labelled baseline for the async A/B
    best = {"parity": 0.0, "fast": 0.0, "parity_sync": 0.0, "fast_sync": 0.0}
    results = None
    for _ in range(3):  # interleaved windows; best-of per mode (tunnel noise)
        with _env(**{**_PARITY_ENV, "AAT_ASYNC_UPLOAD": "1"}):
            t0 = time.perf_counter()
            for results in analyzer.analyse_stream([recordings] * runs):
                pass
            best["parity"] = max(best["parity"], seconds * runs / (time.perf_counter() - t0))
        with _env(AAT_FAST="1", AAT_ASYNC_UPLOAD="1"):
            t0 = time.perf_counter()
            for _res in analyzer_fast.analyse_stream([recordings] * runs):
                pass
            best["fast"] = max(best["fast"], seconds * runs / (time.perf_counter() - t0))
        # synchronous-dispatch stream (AAT_ASYNC_UPLOAD=0): same modes,
        # interleaved in the same windows so the A/B is noise-fair
        with _env(**{**_PARITY_ENV, "AAT_ASYNC_UPLOAD": "0"}):
            t0 = time.perf_counter()
            for _res in analyzer.analyse_stream([recordings] * runs):
                pass
            best["parity_sync"] = max(
                best["parity_sync"], seconds * runs / (time.perf_counter() - t0)
            )
        with _env(AAT_ASYNC_UPLOAD="0", AAT_FAST="1"):
            t0 = time.perf_counter()
            for _res in analyzer_fast.analyse_stream([recordings] * runs):
                pass
            best["fast_sync"] = max(
                best["fast_sync"], seconds * runs / (time.perf_counter() - t0)
            )
    assert results is not None and len(results) == batch_size
    value = best["parity"]

    baseline = DEFAULT_CPU_BASELINE
    bl_file = REPO / "BASELINE_CPU.json"
    if baseline is None and bl_file.exists():
        baseline = json.loads(bl_file.read_text()).get("audio_seconds_per_sec")
    vs = value / baseline if baseline else value / 100.0  # fallback: north star

    # secondary: the TuiNet pair (round-1 headline scenario), parity mode
    with _env(**_PARITY_ENV):
        tuinet_analyzer = BatchAnalyzer(
            models, sr=sr, bucket_seconds=60, rng=np.random.RandomState(0)
        )
        tuinet_analyzer.analyse_recordings(recordings)  # warm
        tuinet_tp = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            for _res in tuinet_analyzer.analyse_stream([recordings] * runs):
                pass
            tuinet_tp = max(tuinet_tp, seconds * runs / (time.perf_counter() - t0))

    effnet = None
    if effnet_dir is not None:
        effnet = bench_mfu(effnet_dir, sr=sr)

    with _env(**_PARITY_ENV):
        latency = bench_latency(models, sr=sr)
    pallas = bench_pallas_melspec(sr=sr)
    breakdown = bench_breakdown(recordings, sr=sr)
    with _env(**_PARITY_ENV):
        wire_invariants = bench_wire_invariants(recordings, analyzer, sr=sr)
    # measured compute-bound ceiling (device-resident loop, no PCM wire)
    with _env(**_PARITY_ENV):
        device_resident = {"parity": bench_device_resident(recordings, analyzer, sr=sr)}
    with _env(AAT_FAST="1"):
        device_resident["fast"] = bench_device_resident(
            recordings, analyzer_fast, sr=sr
        )

    print(
        json.dumps(
            {
                "metric": (
                    f"full-pipeline audio throughput, batch of {batch_size}x60s "
                    "recordings (detect + EfficientNetB0+pre-model ensemble + "
                    "per-track JSON), parity-strict defaults (async upload on)"
                ),
                "value": round(value, 2),
                "unit": "audio-s/s/chip",
                "vs_baseline": round(vs, 2),
                "fast_mode_audio_s_per_s": round(best["fast"], 2),
                "sync_dispatch_audio_s_per_s": {
                    "parity": round(best["parity_sync"], 2),
                    "fast": round(best["fast_sync"], 2),
                },
                "tuinet_ensemble_audio_s_per_s": round(tuinet_tp, 2),
                "efficientnet_b0": effnet,
                "latency_s_per_60s_recording": latency,
                "pallas_melspec_ms_per_128_windows": pallas,
                "breakdown": breakdown,
                "wire_invariants": wire_invariants,
                "device_resident_audio_s_per_s": device_resident,
            }
        )
    )


if __name__ == "__main__":
    main()
