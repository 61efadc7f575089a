"""Experiment: does the codec's per-tier Python dispatch leave wire idle?

decode_pcm uploads ~2 arrays per width tier (up to ~40 `jnp.asarray` calls
per batch), each a separate Python-level dispatch. Hypothesis: the gaps
between those calls (Python overhead, GIL contention with the main thread
in pipelined serving) cost real wire time, and a single `jax.device_put`
of the whole tier pytree — one call, the runtime streams every leaf —
closes them.

Interleaved settings per window (CLAUDE.md rule — tunnel swings 2x):
  codec     current upload_pcm (encode excluded; pre-encoded once)
  pytree    same decode, but all tier arrays device_put as ONE pytree first
  raw       full int16 batch device_put (the no-codec baseline, 46 MB)
  flat      one uint8 buffer of exactly the codec's wire bytes (pure wire
            ceiling for the compressed size — no decode, no structure)

Timing rule for axon: block_until_ready does not block — every leg ends
with a dependent-scalar fetch.

Run: timeout 3600 python tools/exp_upload_pytree.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from bench import make_recording
    from audio_analysis_tpu.io import pcmcodec as pc

    sr = 48000
    recs = [
        np.clip(make_recording(60, seed=s)[0] * 32768.0, -32768, 32767).astype(
            np.int16
        )
        for s in range(8)
    ]
    t_bucket = -(-max(len(r) for r in recs) // pc.BLOCK) * pc.BLOCK
    stacked = np.zeros((len(recs), t_bucket), np.int16)
    for i, r in enumerate(recs):
        stacked[i, : len(r)] = r

    enc = pc.encode_pcm(stacked)
    wire = pc.wire_bytes(enc)
    print(
        f"batch {stacked.nbytes/1e6:.1f} MB raw, {wire/1e6:.1f} MB wire "
        f"({wire/stacked.nbytes:.3f}), {len(enc.tiers)} tiers",
        flush=True,
    )

    dev = jax.devices()[0]

    @jax.jit
    def chk16(x):
        return x[:, :: 65537].astype(jnp.int32).sum()

    @jax.jit
    def chk8(x):
        return x[:: 65537].astype(jnp.int32).sum()

    def fetch(s):
        return int(np.asarray(s))

    def leg_codec():
        t0 = time.perf_counter()
        out = pc.decode_pcm(enc)
        fetch(chk16(out))
        return time.perf_counter() - t0

    def leg_pytree():
        t0 = time.perf_counter()
        tiers_dev = jax.device_put(enc.tiers, dev)
        exc_dev = (
            jax.device_put(enc.exceptions, dev)
            if enc.exceptions is not None
            else None
        )
        scatter, scatter_exc, integrate = pc._decode_fns(jax.default_backend())
        b, t = enc.shape
        n_blocks = (b * t) // pc.BLOCK
        z = jnp.zeros((n_blocks + 1, pc.BLOCK), jnp.uint32)
        for w in sorted(tiers_dev):
            p, wd = tiers_dev[w]
            z = scatter(z, p, wd, w=int(w))
        if exc_dev is not None:
            z = scatter_exc(z, exc_dev[0], exc_dev[1])
        out = integrate(z, enc.shape, enc.order)
        fetch(chk16(out))
        return time.perf_counter() - t0

    def leg_raw():
        t0 = time.perf_counter()
        out = jax.device_put(stacked, dev)
        fetch(chk16(out))
        return time.perf_counter() - t0

    streams = [
        np.ascontiguousarray(a)
        for w in sorted(enc.tiers)
        for a in enc.tiers[w]
    ]
    if enc.exceptions is not None:  # ship ALL wire bytes, incl. exceptions
        streams += [np.ascontiguousarray(a) for a in enc.exceptions]
    flat = np.frombuffer(b"".join(a.tobytes() for a in streams), np.uint8).copy()
    print(f"flat buffer {flat.nbytes/1e6:.1f} MB", flush=True)

    def leg_flat():
        t0 = time.perf_counter()
        out = jax.device_put(flat, dev)
        fetch(chk8(out))
        return time.perf_counter() - t0

    legs = {
        "codec": leg_codec,
        "pytree": leg_pytree,
        "raw": leg_raw,
        "flat": leg_flat,
    }
    # warm every program + transfer path
    for name, fn in legs.items():
        fn()
    print("warmed", flush=True)

    times = {k: [] for k in legs}
    for round_i in range(8):
        for name, fn in legs.items():
            times[name].append(fn())
        line = " | ".join(
            f"{k} {times[k][-1]*1e3:7.1f} ms" for k in legs
        )
        print(f"round {round_i}: {line}", flush=True)

    print("\nmedians (effective MB/s over the bytes each leg ships):")
    ref_bytes = {"codec": wire, "pytree": wire, "raw": stacked.nbytes, "flat": wire}
    for k in legs:
        med = float(np.median(times[k]))
        print(
            f"  {k:7s} {med*1e3:7.1f} ms  {ref_bytes[k]/med/1e6:6.1f} MB/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
