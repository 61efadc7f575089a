"""Serving soak test: stream many batches through BatchAnalyzer and track
host RSS + throughput drift, catching leaks the short bench windows can't
(program-cache growth, async-upload thread buildup, host-side buffer
accumulation). Run on the real TPU:

    python tools/soak_stream.py [N_BATCHES]

Prints one status line per 10 batches and a final JSON verdict: RSS slope
(MB per 100 batches, least squares over the post-warmup samples) and
first/last-quartile throughput. A healthy serve shows near-zero slope —
the program caches key on content (bounded by distinct model configs) and
the async pipeline holds at most one in-flight encoded batch.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from audio_analysis_tpu.utils.runtime import rss_mb


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    import bench as B
    from audio_analysis_tpu.pipeline.serve import BatchAnalyzer

    tmp = Path("/tmp/aat_bench_models")
    tmp.mkdir(exist_ok=True)
    models = B.build_fixture_models(tmp)
    sr = 48000
    recs = [
        np.clip(B.make_recording(60, seed=s)[0] * 32768.0, -32768, 32767).astype(np.int16)
        for s in range(8)
    ]
    seconds = sum(len(r) for r in recs) / sr
    an = BatchAnalyzer(models, sr=sr, bucket_seconds=60, rng=np.random.RandomState(0))
    an.analyse_recordings(recs)  # compile

    # vary content batch-to-batch so host buffers can't be trivially shared;
    # same shapes, so no recompiles (static-shape invariant)
    variants = []
    for k in range(4):
        variants.append([
            np.clip(B.make_recording(60, seed=100 + 8 * k + s)[0] * 32768.0, -32768, 32767)
            .astype(np.int16)
            for s in range(8)
        ])

    samples = []  # (batch_idx, rss_mb, batch_wall_s)
    n_results = 0
    t_start = time.perf_counter()
    done = 0
    while done < n_batches:
        chunk = [variants[(done + i) % len(variants)] for i in range(min(10, n_batches - done))]
        t0 = time.perf_counter()
        for res in an.analyse_stream(chunk):
            n_results += len(res)
        wall = time.perf_counter() - t0
        done += len(chunk)
        samples.append((done, rss_mb(), wall / len(chunk)))
        print(
            f"batch {done}/{n_batches}: rss {samples[-1][1]:.0f} MB, "
            f"{seconds * len(chunk) / wall:.0f} audio-s/s",
            flush=True,
        )
    assert n_results == n_batches * len(recs), (n_results, n_batches)

    # RSS slope over the post-warmup half
    pts = samples[len(samples) // 2 :]
    x = np.array([p[0] for p in pts], float)
    y = np.array([p[1] for p in pts], float)
    slope = float(np.polyfit(x, y, 1)[0] * 100) if len(pts) >= 3 else 0.0
    q = max(1, len(samples) // 4)
    tp_first = seconds / np.mean([s[2] for s in samples[:q]])
    tp_last = seconds / np.mean([s[2] for s in samples[-q:]])
    print(json.dumps({
        "batches": n_batches,
        "audio_hours": round(n_batches * seconds / 3600, 2),
        "rss_start_mb": round(samples[0][1], 1),
        "rss_end_mb": round(samples[-1][1], 1),
        "rss_slope_mb_per_100_batches": round(slope, 2),
        "throughput_first_quartile": round(float(tp_first), 1),
        "throughput_last_quartile": round(float(tp_last), 1),
        "total_wall_s": round(time.perf_counter() - t_start, 1),
    }))


if __name__ == "__main__":
    main()
