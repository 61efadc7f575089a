#!/usr/bin/env python3
"""Multi-hour --watch daemon soak on the real chip (VERDICT r4 next #6).

The axon tunnel client leaks host RSS by the bytes of every host->device
transfer (tools/leak_repro_axon.py), so a long-lived spool daemon grows
~33-44 MB per 8x60s batch; `--recycle-rss-mb` re-execs the daemon for a
fresh heap, losslessly (sidecar completion records). This soak demonstrates
the mitigation over hours instead of arguing it from the repro:

- starts the daemon (`cli.batch --watch --recycle-rss-mb N`) on a spool dir
- drip-feeds WAVs from a seeded pool at a steady rate
- samples the daemon's RSS (same PID across os.execv re-execs) and counts
  processed sidecars
- writes SOAK.json: RSS trajectory, batches processed, recycle events,
  failures (files whose sidecar never completed)

Usage: python tools/soak_watch.py --hours 2 [--recycle-rss-mb 6000]
"""

import argparse
import json
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SR = 48000


def _rss_mb(pid):
    try:
        for line in open(f"/proc/{pid}/status"):
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    except OSError:
        return None
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hours", type=float, default=2.0)
    ap.add_argument("--recycle-rss-mb", type=int, default=6000)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--feed-batch-every-s", type=float, default=45.0,
                    help="one batch of recordings dropped per interval; at "
                    "8x60s per ~45s the daemon stays busy but never backs "
                    "up unboundedly")
    ap.add_argument("--out", default=str(REPO / "SOAK.json"))
    ap.add_argument("--workdir", default="/tmp/aat_soak")
    args = ap.parse_args()

    import numpy as np

    from audio_analysis_tpu.io.audio import write_wav

    work = Path(args.workdir)
    if work.exists():
        shutil.rmtree(work)
    spool = work / "spool"
    pool = work / "pool"
    spool.mkdir(parents=True)
    pool.mkdir()

    # model fixtures: the bench flagship pair (EfficientNetB0-scale + pre)
    sys.path.insert(0, str(REPO))
    from bench import build_efficientnet_fixture, build_fixture_models

    models_tmp = Path("/tmp/aat_bench_models")
    models_tmp.mkdir(exist_ok=True)
    fixture_models = build_fixture_models(models_tmp)
    effnet_dir = build_efficientnet_fixture(models_tmp)
    model_dirs = [effnet_dir, fixture_models[1]]

    # seeded pool of distinct 60s recordings (tones -> real tracks)
    rng = np.random.RandomState(0)
    for i in range(16):
        t = np.arange(60 * SR) / SR
        y = 0.01 * rng.randn(len(t)).astype(np.float32)
        for _ in range(3):
            f0 = rng.uniform(1500, 6000)
            t0 = rng.uniform(1, 55)
            m = (t > t0) & (t < t0 + rng.uniform(0.5, 2.0))
            y[m] += (0.5 * np.sin(2 * np.pi * f0 * t[m])).astype(np.float32)
        write_wav(pool / f"pool{i}.wav", y, SR)
    pool_files = sorted(pool.glob("*.wav"))

    cmd = [
        sys.executable, "-m", "audio_analysis_tpu.cli.batch",
        "--watch", "--prewarm",
        "--batch-size", str(args.batch_size),
        "--recycle-rss-mb", str(args.recycle_rss_mb),
        "--seed", "0",
    ]
    for d in model_dirs:
        cmd += ["--bird-model", str(d)]
    cmd.append(str(spool))
    log_path = work / "daemon.log"
    daemon_log = open(log_path, "w")
    daemon = subprocess.Popen(
        cmd, cwd=str(REPO), stdout=daemon_log, stderr=subprocess.STDOUT
    )
    print(f"daemon pid {daemon.pid}; soaking {args.hours}h", flush=True)

    t0 = time.time()
    deadline = t0 + args.hours * 3600
    samples = []
    fed = 0
    next_feed = t0  # feed immediately
    try:
        while time.time() < deadline:
            now = time.time()
            if daemon.poll() is not None:
                print("DAEMON EXITED", daemon.returncode, flush=True)
                break
            if now >= next_feed:
                for _ in range(args.batch_size):
                    src = pool_files[fed % len(pool_files)]
                    shutil.copy(src, spool / f"rec{fed:06d}.wav")
                    fed += 1
                next_feed = now + args.feed_batch_every_s
            done = len(list(spool.glob("*.txt")))
            rss = _rss_mb(daemon.pid)
            samples.append({
                "t_s": round(now - t0, 1),
                "rss_mb": round(rss, 1) if rss else None,
                "files_fed": fed,
                "files_done": done,
            })
            time.sleep(15)
    finally:
        # drain: give in-flight work a moment, then stop feeding and kill
        time.sleep(30)
        daemon.terminate()
        try:
            daemon.wait(timeout=30)
        except subprocess.TimeoutExpired:
            daemon.kill()
        daemon_log.close()

    log_text = log_path.read_text(errors="replace")
    recycles = log_text.count("re-exec'ing for a fresh heap")
    done_files = {p.stem for p in spool.glob("*.txt")}
    incomplete = []
    for i in range(fed):
        name = f"rec{i:06d}"
        if name not in done_files:
            incomplete.append(name)
    # the tail batch may legitimately be in flight at kill time
    completed = fed - len(incomplete)
    rss_vals = [s["rss_mb"] for s in samples if s["rss_mb"]]
    record = {
        "generated": time.strftime("%Y-%m-%d %H:%M:%S"),
        "hours": round((time.time() - t0) / 3600, 2),
        "recycle_rss_mb": args.recycle_rss_mb,
        "files_fed": fed,
        "files_completed": completed,
        "files_incomplete_at_stop": len(incomplete),
        "recycle_events": recycles,
        "rss_mb": {
            "min": min(rss_vals) if rss_vals else None,
            "max": max(rss_vals) if rss_vals else None,
            "final": rss_vals[-1] if rss_vals else None,
        },
        "daemon_exit_mid_soak": daemon.returncode not in (None, 0, -15),
        "samples_every_15s": samples[:: max(1, len(samples) // 240)],
    }
    Path(args.out).write_text(json.dumps(record, indent=2))
    print(json.dumps({k: v for k, v in record.items() if k != "samples_every_15s"},
                     indent=2))


if __name__ == "__main__":
    main()
