"""Architecture-space differential fuzz of the Keras importer (CI slices).

The released Cacophony checkpoints can't be fetched offline (reference
src/identify_tracks.py:302-327), so random tf.keras architecture draws are
the only offline evidence that the TF-free importer handles whatever layer
graph those checkpoints contain. The generator lives in
tools/keras_arch_fuzz.py; a 580-seed sweep ran clean offline (round 4).
The fast tier gates regressions cheaply; the slow tier re-runs a wide slice.
"""

import sys
from pathlib import Path

import pytest

tf = pytest.importorskip("tensorflow")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _run(n, start, tmp_path, flavor="k3"):
    from tools.keras_arch_fuzz import run_sweep

    failures = run_sweep(n, start=start, tmpdir=str(tmp_path), flavor=flavor)
    assert not failures, "\n".join(f"seed {s}: {m}" for s, m in failures)


def test_arch_fuzz_fast(tmp_path):
    _run(10, 0, tmp_path)


def test_arch_fuzz_keras2_fast(tmp_path):
    """tf_keras (Keras 2) archives — the released-checkpoint generation.
    This flavor found 4 real importer bugs on its first 25 seeds (hard_
    sigmoid semantics, nested-model node offset, per-node topological walk,
    TFOpLambda scalar kwargs)."""
    _run(10, 0, tmp_path, flavor="k2")


@pytest.mark.slow
def test_arch_fuzz_wide(tmp_path):
    _run(150, 10, tmp_path)


@pytest.mark.slow
def test_arch_fuzz_keras2_wide(tmp_path):
    _run(100, 10, tmp_path, flavor="k2")
