"""Per-leg profile of the fused detect program + the detect stage.

Times (steady-state, dependent-scalar barriers — block_until_ready does
not block on axon):
  - each leg of the fused program in isolation: end-scan flatness, Pallas
    |STFT| magnitude, batch a_max normalisation, medians, threshold+
    morphology+pack;
  - the whole fused program;
  - the full detect STAGE (dispatch + runs + transfers + CCL) via
    detect_batch_dispatch/finish.

Legs are dispatched on the same [8, 60 s] int16 batch the bench uses.
Writes PROFILE_DETECT.json at the repo root.

Run: timeout 3500 python tools/profile_detect.py
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np


_RED = None  # jitted scalar reducer (set in main; needs jax imported)


def _bar(fn, *args):
    """Dispatch + dependent-SCALAR barrier; returns seconds. The barrier
    must fetch a scalar reduced on device — np.asarray of a leg's full
    output would time its (huge) device->host transfer, not the leg
    (axon: block_until_ready does not block)."""
    t0 = time.perf_counter()
    out = fn(*args)
    leaf = out
    while isinstance(leaf, (tuple, list)):
        leaf = leaf[0]
    float(np.asarray(_RED(leaf)))
    return time.perf_counter() - t0


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_recording
    import importlib

    sn = importlib.import_module("audio_analysis_tpu.detect.signal_noise")
    from audio_analysis_tpu.ops.pallas.medians import pallas_masked_medians_rowcol
    from audio_analysis_tpu.ops.pallas.melspec import pallas_stft_magnitude

    global _RED
    _RED = jax.jit(
        lambda x: x.reshape(-1)[::4097].astype(jnp.float32).sum()
    )

    sr, hop, n_fft = 48000, 281, 4096
    recs = [
        np.clip(make_recording(60, seed=s)[0] * 32768.0, -32768, 32767).astype(
            np.int16
        )
        for s in range(8)
    ]
    t_bucket = max(len(r) for r in recs)
    stacked = np.zeros((8, t_bucket), np.int16)
    n_valid = np.zeros(8, np.int32)
    for i, r in enumerate(recs):
        stacked[i, : len(r)] = r
        n_valid[i] = len(r)
    frames = jnp.asarray(stacked)
    nv = jnp.asarray(n_valid)
    audio_s = float(n_valid.sum()) / sr

    level = sn._flatness_level(sr, hop)
    mag = sn._mag_level(level, n_fft, hop)
    print(f"pallas level {level}, mag exact {mag}", flush=True)

    framesf = sn._to_float(frames)

    # --- leg programs (jitted standalone) --------------------------------
    @jax.jit
    def leg_endscan(f):
        return sn._batch_chunk_flatness(f, sr=sr, hop_length=hop, level=level)

    @jax.jit
    def leg_mag(f, mv):
        idx = jnp.arange(f.shape[1])
        fz = jnp.where(idx[None, :] < mv[:, None], f, 0.0)
        return pallas_stft_magnitude(fz, n_fft=n_fft, hop_length=hop, exact=mag)

    @jax.jit
    def leg_norm(spec, nvf):
        col_valid = jnp.arange(spec.shape[-1])[None, :] < nvf[:, None]
        a_max = jnp.max(
            jnp.where(col_valid[:, None, :], spec, 0.0), axis=(1, 2), keepdims=True
        )
        return spec / a_max

    @jax.jit
    def leg_medians(spec_n, nvf):
        return pallas_masked_medians_rowcol(spec_n, nvf)

    @jax.jit
    def leg_morph(spec_n, row_m, col_m, nvf):
        col_valid = jnp.arange(spec_n.shape[-1])[None, :] < nvf[:, None]
        return jax.vmap(
            lambda s, r, c, v: sn._mask_threshold_morph(
                s, r, c, v, sr=sr, hop_length=hop, n_fft=n_fft
            )
        )(spec_n, row_m, col_m, col_valid)

    @jax.jit
    def leg_fused(f, n):
        return sn._fused_detect_batch_program(
            f, n, sr=sr, hop_length=hop, n_fft=n_fft, pallas_level=level
        )

    # intermediate inputs for the isolated legs
    mask_valid = nv  # full-length masks (no flat tails in the fixture)
    spec = leg_mag(framesf, mask_valid)
    nvf = 1 + mask_valid // hop
    spec_n = leg_norm(spec, nvf)
    row_m, col_m = leg_medians(spec_n, nvf)

    tiny = jnp.zeros(8, jnp.float32)

    @jax.jit
    def leg_null(x):
        return x + 1.0

    legs = {
        # dispatch + scalar-fetch floor (tunnel round trip): subtract from
        # every other leg to read its device time
        "null_floor": lambda: _bar(leg_null, tiny),
        "endscan": lambda: _bar(leg_endscan, framesf),
        "mag": lambda: _bar(leg_mag, framesf, mask_valid),
        "norm": lambda: _bar(leg_norm, spec, nvf),
        "medians": lambda: _bar(leg_medians, spec_n, nvf),
        "morph_pack": lambda: _bar(leg_morph, spec_n, row_m, col_m, nvf),
        "fused_program": lambda: _bar(leg_fused, framesf, nv),
    }

    def leg_stage():
        t0 = time.perf_counter()
        h = sn.detect_batch_dispatch(frames, nv, sr)
        sn.detect_batch_finish(h)
        return time.perf_counter() - t0

    legs["stage_total"] = leg_stage

    for name, fn in legs.items():  # warm / compile
        fn()
    print("warmed", flush=True)

    out = {}
    for _ in range(6):
        for name, fn in legs.items():
            out.setdefault(name, []).append(fn())
    report = {
        "batch": "8x60s int16",
        "pallas_level": int(level),
        "ms": {k: round(float(np.median(v)) * 1e3, 1) for k, v in out.items()},
    }
    report["detect_only_audio_s_per_s"] = round(
        audio_s / float(np.median(out["stage_total"])), 1
    )
    print(json.dumps(report, indent=1))
    (REPO / "PROFILE_DETECT.json").write_text(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
