#!/usr/bin/env python3
"""Run the wide differential-fuzz sweeps and record the evidence.

VERDICT r4 weak #6: the "N seeds ran clean" claims lived in docstrings with
no committed artifact. This driver runs each sweep tool at evidence scale
and writes FUZZ_SWEEPS.json at the repo root: seeds run, failures, wall
time, and library versions — a record, not a claim.

Usage: python tools/fuzz_evidence.py [--quick]
(--quick cuts every sweep ~10x for a smoke run; the committed artifact
should come from a full run.)
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_platforms", "cpu")  # axon plugin ignores env vars


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default=str(REPO / "FUZZ_SWEEPS.json"))
    args = ap.parse_args()
    q = 10 if args.quick else 1

    import numpy as np

    record = {
        "generated": time.strftime("%Y-%m-%d %H:%M:%S"),
        "versions": {
            "python": sys.version.split()[0],
            "numpy": np.__version__,
            "jax": jax.__version__,
        },
        "sweeps": [],
    }
    try:
        import tensorflow as tf

        record["versions"]["tensorflow"] = tf.__version__
        import keras

        record["versions"]["keras"] = keras.__version__
    except ImportError:
        pass

    def run(name, fn, **meta):
        t0 = time.time()
        failures = fn()
        entry = {
            "sweep": name,
            **meta,
            "failures": failures,
            "n_failures": len(failures),
            "elapsed_s": round(time.time() - t0, 1),
        }
        record["sweeps"].append(entry)
        print(f"[{name}] {meta} -> {len(failures)} failures "
              f"({entry['elapsed_s']}s)", flush=True)

    # 1) host-logic differential oracles (pure numpy transcription parity):
    #    every seed runs all eleven oracle bodies
    from tools.fuzz_sweep import run_sweep as host_sweep

    n = 5000 // q
    run(
        "host_logic", lambda: [list(f) for f in host_sweep(n, log=print)],
        seeds=n, oracles="all (see tools/fuzz_sweep.py cases)",
    )

    # 2) Keras importer architecture-space fuzz, both generations
    from tools.keras_arch_fuzz import run_sweep as arch_sweep

    n = 300 // q
    for flavor in ("k3", "k2"):
        run(
            f"keras_arch_{flavor}",
            lambda flavor=flavor: [
                [s, str(m)] for s, m in arch_sweep(n, log=print, flavor=flavor)
            ],
            seeds=n, flavor=flavor,
        )

    # 3) config-space differential fuzz (batch serving vs single path)
    import tempfile

    from tools.config_fuzz_sweep import run_seed as config_seed

    for mode, n in (("single", 50 // q), ("two-groups", 24 // q),
                    ("tracks", 24 // q)):
        def sweep(mode=mode, n=n):
            bad = []
            for seed in range(n):
                with tempfile.TemporaryDirectory() as tmp:
                    try:
                        config_seed(seed, tmp, mode=mode)
                    except Exception as e:
                        bad.append([seed, f"{type(e).__name__}: {e}"])
                print(f"  config {mode} seed {seed} done", flush=True)
            return bad

        run(f"config_{mode}", sweep, seeds=n, mode=mode)

    total_fail = sum(s["n_failures"] for s in record["sweeps"])
    record["total_failures"] = total_fail
    Path(args.out).write_text(json.dumps(record, indent=2))
    print(f"\nwrote {args.out}: {total_fail} total failures")
    return 1 if total_fail else 0


if __name__ == "__main__":
    sys.exit(main())
