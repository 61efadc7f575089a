"""Mesh-scale serving robustness beyond the 8-device CI mesh (VERDICT r3 #8).

Weak scaling with recordings-per-device fixed at one: 16 devices as
2 processes x 8 virtual CPU devices (the multi-host collective-agreement
paths — band-pass and analyse-tracks route collectively, a divergent
process would hang), and 32 devices as a single-process 32-device mesh
(window-bucket padding and the data-axis sharding at a mesh shape no other
test reaches). Parity vs the meshless single run at the multihost suite's
1e-5 contract.

Device counts are baked into XLA_FLAGS before backend init, so every leg
runs in a subprocess (tests/multihost_worker.py) rather than this process's
8-device runtime.
"""

import json
import subprocess
import sys
from pathlib import Path

import pytest

tf = pytest.importorskip("tensorflow")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.test_multihost import (  # noqa: E402
    WORKER,
    _approx_equal,
    _env,
    _free_port,
    _save_model,
)


def _single(tmp_path, model, total, n_devices, tag, extra_args=()):
    out = tmp_path / f"single{tag}.json"
    r = subprocess.run(
        [
            sys.executable, str(WORKER),
            "--model", str(model),
            "--out", str(out),
            "--total-recordings", str(total),
            *extra_args,
        ],
        env=_env(n_devices), capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    results = json.loads(out.read_text())
    assert len(results) == total
    return results


def _multi(tmp_path, model, total, n_processes, devs_per_proc, tag, extra_args=()):
    port = _free_port()
    procs, outs = [], []
    for pid in range(n_processes):
        out = tmp_path / f"ms{tag}{pid}.json"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, str(WORKER),
                    "--model", str(model),
                    "--out", str(out),
                    "--process-id", str(pid),
                    "--num-processes", str(n_processes),
                    "--coordinator", f"localhost:{port}",
                    "--total-recordings", str(total),
                    *extra_args,
                ],
                env=_env(devs_per_proc),
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    errs = []
    for p in procs:
        try:
            _, err = p.communicate(timeout=1800)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        errs.append(err)
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(errs)[-4000:]
    return [json.loads(out.read_text()) for out in outs]


@pytest.mark.slow
def test_16dev_two_process_weak_scaling(tmp_path):
    """16 recordings over 2x8 devices: plain serving parity at scale."""
    model = _save_model(tmp_path / "model")
    single = _single(tmp_path, model, 16, 8, "p16")
    assert any(rec["species_identify"] for rec in single)
    for got in _multi(tmp_path, model, 16, 2, 8, "p16"):
        _approx_equal(got, single)


@pytest.mark.slow
def test_16dev_bandpass_and_tracks_collective_agreement(tmp_path):
    """The two collectively-routed configs at a 16-device mesh: band-pass
    (per-process local inference, path agreed via allgather) and
    analyse-tracks (detection skipped on every process together). A hang
    here is the classic collective-divergence failure."""
    fmodel = _save_model(tmp_path / "fmodel", extra_meta={"filter_below": 20000})
    single_f = _single(tmp_path, fmodel, 16, 8, "f16")
    assert any(rec["species_identify"] for rec in single_f)
    for got in _multi(tmp_path, fmodel, 16, 2, 8, "f16"):
        _approx_equal(got, single_f)

    tmodel = _save_model(tmp_path / "tmodel")
    single_t = _single(
        tmp_path, tmodel, 16, 8, "t16", extra_args=("--analyse-tracks",)
    )
    assert any(rec["species_identify"] for rec in single_t)
    for got in _multi(
        tmp_path, tmodel, 16, 2, 8, "t16", extra_args=("--analyse-tracks",)
    ):
        _approx_equal(got, single_t)


@pytest.mark.slow
def test_32dev_single_process_mesh(tmp_path):
    """32 recordings on a single-process 32-device mesh vs the same batch on
    the 8-device mesh (the worker always serves on a global mesh): exercises
    data-axis sharding + window-bucket padding at a mesh shape far past the
    CI default."""
    model = _save_model(tmp_path / "model32")
    on8 = _single(tmp_path, model, 32, 8, "mesh8x32")
    assert any(rec["species_identify"] for rec in on8)
    on32 = _single(tmp_path, model, 32, 32, "mesh32")
    _approx_equal(on32, on8)
