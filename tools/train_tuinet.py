#!/usr/bin/env python3
"""Train a TuiNet classifier into a servable checkpoint dir.

The reference ships no training code (SURVEY.md §2); this closes the loop:
labelled audio in, a model dir (metadata.txt + weights.npz) out that the
analyse CLI and BatchAnalyzer load directly.

Data layout: DATA_DIR/<label>/*.wav — each file yields overlapping
3 s / 1.5 s windows at 48 kHz (the serving geometry).

Usage:
  python tools/train_tuinet.py DATA_DIR OUT_MODEL_DIR \
      [--epochs 5] [--batch 64] [--lr 1e-3] [--mesh data=4,model=2]
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def load_dataset(data_dir: Path, sr: int, segment: float, stride: float):
    from audio_analysis_tpu.io.audio import load_recording

    labels = sorted(p.name for p in data_dir.iterdir() if p.is_dir())
    windows, ys = [], []
    size = int(segment * sr)
    hop = int(stride * sr)
    for yi, label in enumerate(labels):
        for wav in sorted((data_dir / label).glob("*.wav")):
            frames, _ = load_recording(wav, resample=sr)
            for s in range(0, max(len(frames) - size + 1, 1), hop):
                w = frames[s : s + size]
                if len(w) < size:
                    w = np.pad(w, (0, size - len(w)))
                windows.append(w.astype(np.float32))
                ys.append(yi)
    return np.stack(windows), np.asarray(ys, np.int32), labels


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--sr", type=int, default=48000)
    ap.add_argument("--n-mels", type=int, default=160)
    ap.add_argument("--hop-length", type=int, default=640)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--model-parallel", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from audio_analysis_tpu.models.birdnet import TuiNetConfig
    from audio_analysis_tpu.parallel.mesh import make_mesh
    from audio_analysis_tpu.parallel.train import build_sharded_train
    from audio_analysis_tpu.io.checkpoint import save_checkpoint

    data_dir = Path(args.data_dir)
    x, y, labels = load_dataset(data_dir, args.sr, 3.0, 1.5)
    print(f"dataset: {len(x)} windows, labels {labels}")

    cfg = TuiNetConfig(num_classes=len(labels), n_mels=args.n_mels)
    mesh = make_mesh(model_parallel=args.model_parallel)
    rng = np.random.RandomState(args.seed)
    with mesh:
        params, opt_state, jit_step = build_sharded_train(
            mesh, cfg, sr=args.sr, hop_length=args.hop_length, lr=args.lr, seed=args.seed
        )
        n = len(x)
        steps = max(n // args.batch, 1)
        for epoch in range(args.epochs):
            order = rng.permutation(n)
            tot_loss = tot_acc = 0.0
            for s in range(steps):
                idx = order[s * args.batch : (s + 1) * args.batch]
                if len(idx) < args.batch:  # keep shapes static
                    idx = np.concatenate([idx, order[: args.batch - len(idx)]])
                params, opt_state, loss, acc = jit_step(
                    params, opt_state, jnp.asarray(x[idx]), jnp.asarray(y[idx])
                )
                tot_loss += float(loss)
                tot_acc += float(acc)
            print(f"epoch {epoch}: loss {tot_loss/steps:.4f} acc {tot_acc/steps:.3f}")

    meta = {
        "name": "tuinet",
        "architecture": "tuinet",
        "labels": labels,
        "segment_length": 3,
        "segment_stride": 1.5,
        "hop_length": args.hop_length,
        "n_mels": args.n_mels,
        "break_freq": 1750,
        "htk": True,
        "fmin": 50,
        "fmax": 11000,
        "power": 2,
        "db_scale": True,
        "threshold": 0.7,
        "n_fft": 4096,
        "normalize": True,
        "net_channels": list(cfg.channels),
    }
    out = save_checkpoint(args.out_dir, jax.device_get(params), meta)
    print(f"saved servable checkpoint to {out}")


if __name__ == "__main__":
    main()
