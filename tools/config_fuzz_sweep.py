"""Wide config-space differential fuzz: random metadata.txt knob
combinations through BATCH serving vs the SINGLE-recording pipeline.

The CI test (tests/test_config_fuzz.py) runs an 8-seed slice; this tool
runs an arbitrary range on the virtual CPU mesh. Usage:

    python tools/config_fuzz_sweep.py [N_SEEDS] [FIRST_SEED] \
        [--two-groups | --analyse-tracks]

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


def run_seed(seed, tmp, mode="single"):
    base = {"single": 1000, "two-groups": 7000, "tracks": 3000}[mode]
    rng = np.random.RandomState(base + seed)
    if mode == "two-groups":
        d1, d2 = fz._two_group_dirs(rng, Path(tmp), seed)
        dirs, meta = [str(d1), str(d2)], {"two_groups": seed}
    else:
        meta = fz._random_meta(rng)
        dirs = [str(fz._model_dir_for(meta, Path(tmp), seed))]
    recs = fz._recs(rng)
    analyzer = BatchAnalyzer(dirs, sr=fz.SR, bucket_seconds=8, rng=None)
    if mode == "tracks":
        metas = [fz._random_track_meta(rng) for _ in recs]
        batch = analyzer.analyse_recordings(recs, meta_data=metas, analyse_tracks=True)
        for rec, md, got in zip(recs, metas, batch):
            res = classify_frames(rec, fz.SR, dirs, True, md, rng=None)
            fz._assert_equal_results(got, res[0])
        return meta
    batch = analyzer.analyse_recordings(recs)
    for rec, got in zip(recs, batch):
        tracks, *_ = classify_frames(rec, fz.SR, dirs, False, None, rng=None)
        fz._assert_equal_results(got, tracks)
    return meta


def main():
    mode = "single"
    if "--two-groups" in sys.argv:
        mode = "two-groups"
    elif "--analyse-tracks" in sys.argv:
        mode = "tracks"
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(argv[0]) if argv else 32
    first = int(argv[1]) if len(argv) > 1 else 0
    bad = []
    for seed in range(first, first + n):
        with tempfile.TemporaryDirectory() as tmp:
            try:
                meta = run_seed(seed, tmp, mode=mode)
                if mode != "single":
                    print(f"seed {seed}: ok ({mode})")
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
