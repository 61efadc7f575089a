#!/usr/bin/env python3
"""Fine-tune a released .keras classifier on labelled audio, TPU-natively.

Takes a reference model dir (audioModel.keras + metadata.txt), a data dir
laid out DATA_DIR/<label>/*.wav, and writes OUT_DIR with the tuned
audioModel.keras (readable by both this framework and tf.keras — see
io/keras_export.py) and an updated metadata.txt. When the data dir's
labels differ from the checkpoint's, the classification head is replaced
(transfer learning) and metadata.txt carries the new label space.

Usage:
  python tools/finetune_keras.py MODEL_DIR DATA_DIR OUT_DIR \
      [--epochs 5] [--batch 64] [--lr 1e-4] [--seed 0] [--mesh data=8]
"""

import argparse
import json
import shutil
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_dir")
    ap.add_argument("data_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--mesh", default=None, help="e.g. data=8")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from train_tuinet import load_dataset

    from audio_analysis_tpu.io.keras_export import write_keras_archive
    from audio_analysis_tpu.io.modelconfig import ModelConfig
    from audio_analysis_tpu.models.keras_graph import KerasModel
    from audio_analysis_tpu.parallel.finetune import build_finetune, replace_head
    from audio_analysis_tpu.pipeline.classify import features_for_config

    model_dir = Path(args.model_dir)
    cfg = ModelConfig.load(model_dir)
    sr = 48000
    windows, ys, labels = load_dataset(
        Path(args.data_dir), sr, cfg.segment_length, cfg.segment_stride
    )
    km = KerasModel.load(model_dir)
    if labels != list(cfg.labels):
        print(f"label space changed {list(cfg.labels)} -> {labels}: replacing head")
        replace_head(km, len(labels), seed=args.seed)

    mesh = None
    if args.mesh:
        from audio_analysis_tpu.parallel.mesh import make_mesh

        n = int(args.mesh.split("=")[1])
        mesh = make_mesh(n_devices=n, model_parallel=1)

    def _feats(pcm):
        # EXACTLY the serving frontend (fmin/fmax/mean_sub/use_mfcc and the
        # EfficientNet 3-channel repeat included) — training features must
        # match what pipeline/classify.py feeds at inference
        x = features_for_config(pcm, sr, cfg)
        if cfg.is_efficientnet:
            x = jnp.repeat(x, 3, axis=-1)
        return x

    feats_fn = jax.jit(_feats)

    params, opt_state, step = build_finetune(km, mesh=mesh, lr=args.lr)
    rng = np.random.RandomState(args.seed)
    key = jax.random.PRNGKey(args.seed)
    n = len(windows)
    batch = min(args.batch, n)
    if batch < 2:
        sys.exit(f"need at least 2 training windows, found {n}")
    loss = acc = float("nan")
    i_step = 0
    for epoch in range(args.epochs):
        order = rng.permutation(n)
        for lo in range(0, n, batch):
            idx = order[lo : lo + batch]
            if len(idx) < batch:
                # keep the compiled batch shape: wrap the tail remainder
                # with the start of this epoch's shuffle so every labelled
                # window contributes each epoch (no dropped remainder)
                idx = np.concatenate([idx, order[: batch - len(idx)]])
            feats = feats_fn(jnp.asarray(windows[idx]))
            params, opt_state, loss, acc = step(
                params,
                opt_state,
                feats,
                jnp.asarray(ys[idx]),
                jax.random.fold_in(key, i_step),
            )
            i_step += 1
        print(f"epoch {epoch}: loss {float(loss):.4f} acc {float(acc):.3f}")

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    write_keras_archive(
        model_dir, params, out / "audioModel.keras", config=km.config
    )
    meta = dict(cfg.raw or {})
    meta["labels"] = labels
    if labels != list(cfg.labels):
        # stale per-label fields would misalign with the new head
        for k in ("ebird_ids", "bird_labels"):
            meta.pop(k, None)
    (out / "metadata.txt").write_text(json.dumps(meta, indent=4, sort_keys=True))
    for extra in model_dir.glob("*.json"):
        shutil.copy(extra, out / extra.name)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
