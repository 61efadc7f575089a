"""Experiment: is the tunnel upload bandwidth per-transfer limited?

Uploads ~36 MB (the bench batch's wire size) as 1 / 2 / 4 / 8 concurrent
device_put shards and times each, interleaving settings window-by-window
(the tunnel's bandwidth swings ~2x on minute timescales — CLAUDE.md rule).
Timing rule for axon: block_until_ready does not block — fetch a dependent
scalar instead.

Run: timeout 3600 python tools/exp_upload_concurrency.py
"""

import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    total_bytes = 36 << 20
    nwords = total_bytes // 4
    rng = np.random.RandomState(0)
    base = rng.randint(-(2**31), 2**31 - 1, size=nwords, dtype=np.int64).astype(
        np.int32
    )

    dev = jax.devices()[0]
    print("backend:", jax.default_backend(), dev, flush=True)

    @jax.jit
    def chk(*xs):
        return sum(x[::65537].astype(jnp.int64).sum() for x in xs)

    pool = ThreadPoolExecutor(max_workers=8)

    def run(nshards, salt):
        # fresh bytes each time so no caching layer can cheat
        arrs = np.split(base + np.int32(salt), nshards)
        t0 = time.perf_counter()
        if nshards == 1:
            devs = [jax.device_put(arrs[0], dev)]
        else:
            devs = list(pool.map(lambda a: jax.device_put(a, dev), arrs))
        s = chk(*devs)
        _ = int(np.asarray(s))  # dependent scalar fetch = real barrier
        t1 = time.perf_counter()
        return total_bytes / (t1 - t0) / 1e6  # MB/s

    # warm: compile chk for each arity and open the transfer path
    for n in (1, 2, 4, 8):
        run(n, salt=999 + n)
    print("warmed", flush=True)

    settings = [1, 2, 4, 8]
    rates = {n: [] for n in settings}
    for round_i in range(6):
        for n in settings:
            r = run(n, salt=round_i * 10 + n)
            rates[n].append(r)
            print(f"round {round_i} shards={n}: {r:7.1f} MB/s", flush=True)

    print("\n=== summary (MB/s) ===")
    for n in settings:
        v = np.asarray(rates[n])
        print(
            f"shards={n}: best {v.max():7.1f}  median {np.median(v):7.1f}  "
            f"mean {v.mean():7.1f}"
        )


if __name__ == "__main__":
    main()
