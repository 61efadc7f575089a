"""Wide config-space differential fuzz: random metadata.txt knob
combinations through BATCH serving vs the SINGLE-recording pipeline.

The CI test (tests/test_config_fuzz.py) runs an 8-seed slice; this tool
runs an arbitrary range on the virtual CPU mesh. Usage:

    python tools/config_fuzz_sweep.py [N_SEEDS] [FIRST_SEED] [--two-groups]

Each seed draws a fresh metadata.txt (segment/hop/n_fft/n_mels/break_freq/
htk/fmin/fmax/power/db_scale/normalize/mean_sub/mfcc/channels/magv2/
band-pass), builds a matching tiny Keras classifier, and asserts batch ==
single on track geometry, label order and confidences (±1 integer point).
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
import test_config_fuzz as fz  # noqa: E402
from audio_analysis_tpu.pipeline.serve import BatchAnalyzer  # noqa: E402
from audio_analysis_tpu.pipeline.classify import classify_frames  # noqa: E402


def run_seed(seed, tmp, two_groups=False):
    rng = np.random.RandomState((7000 if two_groups else 1000) + seed)
    if two_groups:
        d1, d2 = fz._two_group_dirs(rng, Path(tmp), seed)
        dirs, meta = [str(d1), str(d2)], {"two_groups": seed}
    else:
        meta = fz._random_meta(rng)
        dirs = [str(fz._model_dir_for(meta, Path(tmp), seed))]
    recs = fz._recs(rng)
    analyzer = BatchAnalyzer(dirs, sr=fz.SR, bucket_seconds=8, rng=None)
    batch = analyzer.analyse_recordings(recs)
    for rec, got in zip(recs, batch):
        tracks, *_ = classify_frames(rec, fz.SR, dirs, False, None, rng=None)
        fz._assert_equal_results(got, tracks)
    return meta


def main():
    two_groups = "--two-groups" in sys.argv
    argv = [a for a in sys.argv[1:] if a != "--two-groups"]
    n = int(argv[0]) if argv else 32
    first = int(argv[1]) if len(argv) > 1 else 0
    bad = []
    for seed in range(first, first + n):
        with tempfile.TemporaryDirectory() as tmp:
            try:
                meta = run_seed(seed, tmp, two_groups=two_groups)
                if two_groups:
                    print(f"seed {seed}: ok (two-group)")
                else:
                    print(f"seed {seed}: ok ({ {k: meta[k] for k in ('n_fft', 'n_mels', 'hop_length', 'use_mfcc', 'channels')} })")
            except AssertionError as e:
                bad.append(seed)
                print(f"seed {seed}: DIVERGED: {e}")
            except Exception as e:  # build/shape errors are findings too
                bad.append(seed)
                print(f"seed {seed}: ERROR: {type(e).__name__}: {e}")
    print(f"\n{n - len(bad)}/{n} seeds clean" + (f"; FAILURES: {bad}" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
