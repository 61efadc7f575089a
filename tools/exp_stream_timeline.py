"""Experiment: where does the serving steady-state cycle go?

Bench shows ~0.79 s/batch at ~0.55 s of pure wire (33.5 MB at ~61 MB/s):
~0.24 s/batch is NOT bandwidth. This instruments a real analyse_stream run
(flagship ensemble, parity env, async upload ON) with wall timestamps on
both threads:

  worker thread: encode start/end, decode-dispatch end (= upload queued),
                 dispatch() return
  main thread:   finish() start, detect-wait end, plan end, infer end,
                 post/finish end

and prints the per-batch timeline + cycle decomposition.

Run: timeout 3500 python tools/exp_stream_timeline.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

EVENTS = []  # (t, name, batch_idx_or_None)


def ev(name, idx=None):
    EVENTS.append((time.perf_counter(), name, idx))


def main():
    from bench import (
        _env,
        _PARITY_ENV,
        build_efficientnet_fixture,
        build_fixture_models,
        make_recording,
    )

    tmp = Path("/tmp/aat_bench_models")
    tmp.mkdir(exist_ok=True)
    models = build_fixture_models(tmp)
    effnet_dir = build_efficientnet_fixture(tmp)
    flagship = [effnet_dir, models[1]] if effnet_dir is not None else models

    sr = 48000
    recordings = [
        np.clip(make_recording(60, seed=s)[0] * 32768.0, -32768, 32767).astype(
            np.int16
        )
        for s in range(8)
    ]
    seconds = sum(len(r) for r in recordings) / sr

    import importlib

    from audio_analysis_tpu.io import pcmcodec as pc

    # the detect package re-exports a FUNCTION named signal_noise that
    # shadows the module attribute — import the module explicitly
    sn_mod = importlib.import_module("audio_analysis_tpu.detect.signal_noise")
    serve_mod = importlib.import_module("audio_analysis_tpu.pipeline.serve")

    # --- instrument ------------------------------------------------------
    orig_encode = pc.encode_pcm
    orig_decode = pc.decode_pcm
    orig_finish = sn_mod.detect_batch_finish

    def encode_pcm(x):
        ev("encode0")
        out = orig_encode(x)
        ev("encode1")
        return out

    def decode_pcm(enc):
        ev("decode_dispatch0")
        out = orig_decode(enc)
        ev("decode_dispatch1")
        return out

    def detect_batch_finish(handle):
        ev("detectwait0")
        out = orig_finish(handle)
        ev("detectwait1")
        return out

    pc.encode_pcm = encode_pcm
    pc.decode_pcm = decode_pcm
    # serve._finish imports detect_batch_finish at module top — patch there
    for mod in (sn_mod, serve_mod):
        if hasattr(mod, "detect_batch_finish"):
            mod.detect_batch_finish = detect_batch_finish

    with _env(**{**_PARITY_ENV, "AAT_ASYNC_UPLOAD": "1"}):
        from audio_analysis_tpu.pipeline.serve import BatchAnalyzer

        analyzer = BatchAnalyzer(
            flagship, sr=sr, bucket_seconds=60, rng=np.random.RandomState(0)
        )
        # the async stream path calls _prepare / _dispatch_prepared (via
        # _dispatch_when_ready) directly — instrument THOSE, not _dispatch
        op, odp, of = (
            analyzer._prepare, analyzer._dispatch_prepared, analyzer._finish
        )

        def prepare(recs, sr=None, *a, _op=op, **kw):
            ev("dispatch0")
            return _op(recs, sr, *a, **kw)

        def dispatch_prepared(prep, _odp=odp):
            out = _odp(prep)
            ev("dispatch1")
            return out

        def finish(handle, timer=None, _of=of):
            ev("finish0")
            out = _of(handle, timer=timer)
            ev("finish1")
            return out

        analyzer._prepare = prepare
        analyzer._dispatch_prepared = dispatch_prepared
        analyzer._finish = finish

        analyzer.analyse_recordings(recordings)  # warm / compile
        analyzer.analyse_recordings(recordings)
        EVENTS.clear()

        n_batches = 12
        t0 = time.perf_counter()
        for _ in analyzer.analyse_stream([recordings] * n_batches):
            pass
        t1 = time.perf_counter()

    total = t1 - t0
    print(
        f"{n_batches} batches in {total:.2f} s = "
        f"{seconds * n_batches / total:.1f} audio-s/s, "
        f"{total / n_batches * 1e3:.0f} ms/batch",
        flush=True,
    )

    # --- timeline --------------------------------------------------------
    base = EVENTS[0][0]
    print("\ntimeline (s since first event):")
    for t, name, idx in EVENTS:
        print(f"  {t - base:8.3f}  {name}")

    # cycle decomposition over steady-state batches (drop first 2, last 1)
    def spans(a, b):
        """paired durations of consecutive (a, b) events"""
        out, start = [], None
        for t, name, _ in EVENTS:
            if name == a:
                start = t
            elif name == b and start is not None:
                out.append(t - start)
                start = None
        return out

    for a, b, label in [
        ("encode0", "encode1", "encode"),
        ("decode_dispatch0", "decode_dispatch1", "decode dispatch (tier puts)"),
        ("dispatch0", "dispatch1", "dispatch total (worker)"),
        ("detectwait0", "detectwait1", "detect wait (main)"),
        ("finish0", "finish1", "finish total (main)"),
    ]:
        s = spans(a, b)[2:]
        if s:
            print(
                f"{label:30s} med {np.median(s)*1e3:7.1f} ms  "
                f"mean {np.mean(s)*1e3:7.1f} ms  n={len(s)}"
            )


if __name__ == "__main__":
    main()
