"""Worker for the 2-process multi-host serving test (run as a subprocess).

Usage:
  python multihost_worker.py --model DIR --out FILE [--process-id I
      --num-processes N --coordinator localhost:PORT] [--recordings a,b,...]

Each process feeds only its own recordings (per-host IO); the output file
receives the GLOBAL result list (allgather_results), so any process's output
equals the single-process run over all recordings.
"""

import argparse
import json
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")  # axon plugin ignores env vars

SR = 48000
SECONDS = 8


def make_recording(global_idx: int) -> np.ndarray:
    """Deterministic synthetic recording keyed by its global index."""
    rng = np.random.RandomState(1000 + global_idx)
    t = np.arange(SECONDS * SR) / SR
    y = 0.01 * rng.randn(len(t)).astype(np.float32)
    # a frequency-swept chirp (survives the reference's 4x4 opening)
    t0 = 1.0 + 0.5 * (global_idx % 4)
    m = (t > t0) & (t < t0 + 1.2)
    phase = 2 * np.pi * ((2400 + 150 * global_idx) * t[m] + 220 * (t[m] - t0) ** 2)
    y[m] += (0.6 * np.sin(phase)).astype(np.float32)
    return y


def make_track_meta(global_idx: int) -> dict:
    """Deterministic sidecar-track metadata keyed by global index (for the
    --analyse-tracks leg); geometry stays inside the recording."""
    rng = np.random.RandomState(5000 + global_idx)
    tracks = []
    for j in range(1 + global_idx % 3):
        t0 = float(rng.uniform(0.0, SECONDS - 1.0))
        t1 = min(float(SECONDS), t0 + float(rng.uniform(0.3, 3.0)))
        tr = {"id": 10 * global_idx + j, "start": round(t0, 2), "end": round(t1, 2)}
        if j % 2:
            tr["minFreq"] = 500
            tr["maxFreq"] = 6000
        tracks.append(tr)
    return {"Tracks": tracks}


def main() -> int:
    ap = argparse.ArgumentParser()
    # repeatable: --model spec_dir --model emb_dir builds a multi-group
    # analyzer (embeddings dirs name their embedder in metadata.txt)
    ap.add_argument("--model", action="append", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--total-recordings", type=int, default=8)
    ap.add_argument("--analyse-tracks", action="store_true")
    args = ap.parse_args()

    from audio_analysis_tpu.parallel import distributed as dist

    if args.num_processes > 1:
        dist.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    from audio_analysis_tpu.pipeline.serve import BatchAnalyzer

    mesh = dist.global_mesh(model_parallel=1)
    per_proc = args.total_recordings // args.num_processes
    pid = args.process_id or 0
    local = [
        make_recording(pid * per_proc + i) for i in range(per_proc)
    ]
    analyzer = BatchAnalyzer(
        args.model, sr=SR, bucket_seconds=SECONDS, rng=None, mesh=mesh
    )
    metas = (
        [make_track_meta(pid * per_proc + i) for i in range(per_proc)]
        if args.analyse_tracks
        else None
    )
    results = analyzer.analyse_recordings(
        local, meta_data=metas, analyse_tracks=args.analyse_tracks
    )
    if args.num_processes > 1:
        results = results  # already the global list via allgather_results
    with open(args.out, "w") as f:
        json.dump(results, f)
    print(f"process {pid}: wrote {len(results)} results")
    return 0


if __name__ == "__main__":
    sys.exit(main())
