"""Wide-seed differential fuzz sweep over the parity-critical host logic.

The CI fuzz tests (tests/test_fuzz_parity.py, tests/test_merge_invariants.py)
run 25-30 seeds per oracle — enough to gate regressions, cheap enough for
every push. This one-off sweep runs the SAME seed-parametrized test bodies
over thousands of seeds (pure numpy host logic, ~1 ms/seed) to shake out
rare-branch transcription drift the CI range can't reach: the merge rules
alone have ~20 interacting branches (reference src/identify_tracks.py:725-842)
and several fire only on unusual geometry.

Usage: python tools/fuzz_sweep.py [N_SEEDS] [--start S]
Exit 0 = every oracle agreed on every seed; failures print the repro
(test function + seed) and exit 1.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_sweep(n_seeds, start=0, log=lambda s: None):
    """Run every seed-parametrized differential oracle over seeds
    [start, start+n_seeds). Returns a list of (test_name, seed, message)
    failures (at most 5 repros per oracle)."""
    from tests import test_fuzz_parity as fp
    from tests import test_merge_invariants as mi
    from tests import test_master_tag as mt
    from tests import test_morepork as mk
    from tests import test_pipeline as tp
    from tests import test_ebird as eb

    cases = [
        ("test_fuzz_parity.test_fuzz_cacophony_index", fp.test_fuzz_cacophony_index),
        ("test_fuzz_parity.test_fuzz_chirps", fp.test_fuzz_chirps),
        ("test_fuzz_parity.test_fuzz_track_merging", fp.test_fuzz_track_merging),
        (
            "test_merge_invariants.test_differential_vs_second_transcription",
            mi.test_differential_vs_second_transcription,
        ),
        ("test_merge_invariants.test_permutation_invariance", mi.test_permutation_invariance),
        ("test_merge_invariants.test_merge_fixpoint_is_stable", mi.test_merge_fixpoint_is_stable),
        ("test_master_tag.fuzz_master_tag_one_seed", mt.fuzz_master_tag_one_seed),
        ("test_morepork.fuzz_label_loop_one_seed", mk.fuzz_label_loop_one_seed),
        ("test_pipeline.fuzz_old_index_table_one_seed", tp.fuzz_old_index_table_one_seed),
        ("test_ebird.fuzz_find_square_one_seed", eb.fuzz_find_square_one_seed),
        ("test_ebird.fuzz_merge_neighbours_one_seed", eb.fuzz_merge_neighbours_one_seed),
    ]
    import logging

    failures = []
    # find_square misses log ERROR by design (reference behaviour); a wide
    # sweep would emit thousands — disable for the sweep only (the CI slow
    # test calls this in-process, so restore in finally)
    logging.disable(logging.ERROR)
    try:
        for name, fn in cases:
            t1 = time.time()
            for seed in range(start, start + n_seeds):
                try:
                    fn(seed)
                except AssertionError as e:
                    failures.append((name, seed, str(e)[:200]))
                    if len([f for f in failures if f[0] == name]) >= 5:
                        break  # enough repros for one oracle
            log(f"{name}: {n_seeds} seeds in {time.time() - t1:.1f}s")
    finally:
        logging.disable(logging.NOTSET)
    return failures


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n_seeds", nargs="?", type=int, default=2000)
    ap.add_argument("--start", type=int, default=0)
    args = ap.parse_args()

    t0 = time.time()
    failures = run_sweep(args.n_seeds, args.start, log=lambda s: print(s, flush=True))
    print(f"total {time.time() - t0:.1f}s; {len(failures)} failures")
    for name, seed, msg in failures:
        print(f"FAIL {name} seed={seed}: {msg}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
