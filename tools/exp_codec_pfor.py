"""Offline study: can patched-FOR (per-block width + exception patches)
close the 0.773 -> 0.690 wire gap with a still-parallel device decode?

Evaluates, on the exact bench batch (bench.make_recording seeds 0..7):
  - current codec wire ratio (positions + padded tier words)
  - order-0 entropy of the best-order residuals (the known floor)
  - pFOR upper bounds for several exception costs: per block choose width
    w minimizing 256*w + exc_bits*#{samples needing > w bits}, plus the
    32-bit block position. Decode stays two parallel scatters (tier words
    + one exception scatter), so this is implementable without ANS.

Pure numpy — run anywhere: python tools/exp_codec_pfor.py
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from audio_analysis_tpu.io import pcmcodec as pc
from bench import make_recording


def entropy_bits(z):
    _, counts = np.unique(z, return_counts=True)
    p = counts / counts.sum()
    return float(-(p * np.log2(p)).sum())


def main():
    batch = np.stack(
        [
            np.clip(make_recording(60, seed=s)[0] * 32768.0, -32768, 32767).astype(
                np.int16
            )
            for s in range(8)
        ]
    )
    raw_bytes = batch.nbytes
    print(f"batch {batch.shape} raw {raw_bytes/1e6:.1f} MB")

    enc = pc.encode_pcm(batch)
    cur = pc.wire_bytes(enc)
    print(f"current codec: {cur/1e6:.2f} MB ratio {cur/raw_bytes:.4f} "
          f"(order {enc.order})")

    # residuals at the chosen order
    x = batch
    t = x.shape[1]
    if t % pc.BLOCK:
        x = np.pad(x, ((0, 0), (0, pc.BLOCK - t % pc.BLOCK)))
    r = pc._residual(x, enc.order)
    z = pc._zigzag(r)
    h0 = entropy_bits(z.ravel())
    print(f"order-0 entropy of residuals: {h0:.3f} bits/sample "
          f"-> ratio {h0/16:.4f}")

    zb = z.reshape(-1, pc.BLOCK).astype(np.int64)  # [n_blocks, 256]
    need = np.zeros_like(zb)
    nz = zb > 0
    need[nz] = np.floor(np.log2(zb[nz])).astype(np.int64) + 1
    n_blocks = zb.shape[0]

    # need histogram per block, cumulative from the top
    maxw = int(need.max())
    print(f"n_blocks {n_blocks}, max need {maxw}")

    # counts[b, w] = #samples in block b needing exactly w bits
    counts = np.zeros((n_blocks, maxw + 1), np.int64)
    for w in range(maxw + 1):
        counts[:, w] = (need == w).sum(axis=1)
    # exc[b, w] = #samples needing more than w bits
    exc = counts[:, ::-1].cumsum(axis=1)[:, ::-1]
    exc = np.concatenate([exc[:, 1:], np.zeros((n_blocks, 1), np.int64)], axis=1)

    ws = np.arange(maxw + 1, dtype=np.int64)
    for exc_bits in (64, 48, 40, 32, 24):
        # cost[b, w] = block bits at width w with exceptions patched out
        cost = pc.BLOCK * ws[None, :] + exc_bits * exc + 32  # +32 position
        best = cost.min(axis=1)
        wsel = cost.argmin(axis=1)
        total_bits = int(best.sum())
        n_exc = int(exc[np.arange(n_blocks), wsel].sum())
        ratio = total_bits / 8 / raw_bytes
        print(
            f"pFOR exc={exc_bits:2d}b: {total_bits/8e6:6.2f} MB ratio "
            f"{ratio:.4f}  exceptions {n_exc} "
            f"({n_exc/need.size*1e3:.2f}/1k samples)"
        )

    # sanity: plain FOR (current scheme, no padding, exact widths)
    plain = (pc.BLOCK * need.max(axis=1) + 32).sum()
    print(f"plain FOR no-padding: ratio {plain/8/raw_bytes:.4f}")

    # how much of current wire is bucket padding?
    tier_rows = {w: len(p) for w, (p, _) in enc.tiers.items()}
    used_rows = {
        w: int((p < n_blocks).sum()) for w, (p, _) in enc.tiers.items()
    }
    pad_bytes = sum(
        (tier_rows[w] - used_rows[w]) * (pc._WPB * w * 4 + 4) for w in tier_rows
    )
    print(f"bucket padding in current wire: {pad_bytes/1e6:.2f} MB "
          f"({pad_bytes/cur*100:.1f}% of wire)")

    # width histogram (chosen by current codec)
    for w in sorted(tier_rows):
        print(f"  width {w:2d}: {used_rows[w]:7d} blocks (+{tier_rows[w]-used_rows[w]} pad)")


if __name__ == "__main__":
    main()
