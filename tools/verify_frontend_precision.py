"""Frontend precision verification: every frontend level vs a float64 oracle.

Measures, on the current backend (the real TPU chip under the axon tunnel,
or CPU with --interpret), the max/mean relative error of each frontend
kernel level against a float64 host STFT->mel oracle, plus ms/256-windows
timings on TPU. This is the reproducible evidence behind the
"Split-bf16 exact mode" section of docs/PERFORMANCE.md and the TPU parity
default in pipeline/frontend.py — run it after any kernel change.

Reference scale for the shapes: the reference's get_spect
(src/identify_tracks.py:212-288) — 3 s windows, n_fft 4096, 160 mels.

Usage:
    python tools/verify_frontend_precision.py             # on the chip
    python tools/verify_frontend_precision.py --interpret  # CPU, small N
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def f64_oracle(wins, sr, n_fft, hop, n_mels, fmin, fmax, break_freq, power=2.0):
    """Centre-padded STFT -> |.|^power -> mel matmul, float64 on host."""
    from audio_analysis_tpu.ops.pallas.melspec import _fb_np
    from audio_analysis_tpu.ops.windows import get_window_np

    win = get_window_np("hann", n_fft, periodic=True).astype(np.float64)
    fb = _fb_np(sr, n_mels, fmin, fmax, n_fft, break_freq, True).astype(np.float64)
    out = []
    for row in wins:
        x = np.pad(row.astype(np.float64), (n_fft // 2, n_fft // 2))
        nf = 1 + (len(x) - n_fft) // hop
        frames = np.stack([x[i * hop : i * hop + n_fft] for i in range(nf)])
        spec = np.fft.rfft(frames * win, axis=-1)
        out.append(fb @ (np.abs(spec.T) ** power))
    return np.stack(out)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--interpret", action="store_true",
                    help="run the Pallas kernel in interpret mode (CPU)")
    ap.add_argument("--windows", type=int, default=None,
                    help="windows to measure (default 256 on TPU, 4 interpret)")
    ap.add_argument("--json", action="store_true", help="emit one JSON line")
    args = ap.parse_args(argv)

    import jax

    if args.interpret:
        # force CPU BEFORE backend init — the axon plugin ignores
        # JAX_PLATFORMS (CLAUDE.md), and touching a wedged tunnel hangs
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from audio_analysis_tpu.ops.mel import mel_spec
    from audio_analysis_tpu.ops.pallas.melspec import pallas_mel_spectrogram
    from audio_analysis_tpu.ops.stft import stft_magnitude

    sr, n_fft, hop, n_mels, fmin, fmax, brk = 48000, 4096, 640, 160, 50, 11000, 1750
    n = args.windows or (4 if args.interpret else 256)
    on_tpu = jax.default_backend() == "tpu" and not args.interpret

    rng = np.random.default_rng(1)
    w = rng.standard_normal((n, 3 * sr)).astype(np.float32)
    w = 2.0 * (w - w.min()) / (w.max() - w.min()) - 1.0
    wd = jnp.asarray(w)

    gt = f64_oracle(w[: min(n, 8)], sr, n_fft, hop, n_mels, fmin, fmax, brk)
    F = gt.shape[-1]
    den = np.maximum(np.abs(gt), 1e-3 * np.abs(gt).max())

    kw = dict(sr=sr, n_fft=n_fft, hop_length=hop, n_mels=n_mels, fmin=fmin,
              fmax=fmax, break_freq=brk, power=2.0, htk=True,
              interpret=args.interpret)

    @jax.jit
    def xla_path(x):
        mag = jax.vmap(lambda r: stft_magnitude(r, n_fft, hop))(x)
        return mel_spec(mag, sr, n_fft, n_mels, fmin, fmax, brk, power=2.0)

    paths = {
        "xla_fft": lambda x: xla_path(x),
        "pallas_exact2": lambda x: pallas_mel_spectrogram(x, exact=2, **kw),
        "pallas_exact1": lambda x: pallas_mel_spectrogram(x, exact=1, **kw),
        "pallas_fast": lambda x: pallas_mel_spectrogram(x, **kw),
    }

    def force(x):
        return float(np.asarray(jnp.sum(x.astype(jnp.float32))))

    def timeit(fn, reps=64):
        for _ in range(2):
            out = fn(wd)
        force(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(wd)
        force(out)
        return (time.perf_counter() - t0) / reps * 1e3

    report = {"backend": jax.default_backend(), "n_windows": n}
    for name, fn in paths.items():
        got = np.asarray(fn(wd[: gt.shape[0]]))[..., :F]
        r = np.abs(got - gt) / den
        row = {"max_rel": float(r.max()), "mean_rel": float(r.mean())}
        if on_tpu:
            row["ms_per_batch"] = round(timeit(fn), 2)
        report[name] = row
        if not args.json:
            t = f"  {row.get('ms_per_batch', '-'):>8} ms" if on_tpu else ""
            print(f"{name:14s} max rel {row['max_rel']:.3e}  "
                  f"mean {row['mean_rel']:.3e}{t}", flush=True)
    if args.json:
        print(json.dumps(report))
    # the parity default must be at least 100x more accurate than the XLA
    # path it replaced (docs/PERFORMANCE.md table) — fail loudly if not
    ok = report["pallas_exact2"]["max_rel"] < max(
        1e-4, 0.01 * report["xla_fft"]["max_rel"]
    )
    if not ok:
        print("FAIL: exact2 error out of band", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
