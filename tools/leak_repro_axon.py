"""Minimal repro: the remote-tunnel (axon) PJRT client leaks host RSS by
exactly the bytes of every host->device transfer.

No framework code involved — a bare jnp.asarray + jit + delete loop:

    $ python tools/leak_repro_axon.py
    pure device_put loop: rss 265 -> 1144 MB (44.0 MB/iter), live_buffers 0 -> 0
    explicit .delete():   -> 2023 MB (44.0 MB/iter)

44.0 MiB/iter == the uploaded array's size (8 x 2,880,000 int16). Python
sees nothing: gc.collect() run, jax.live_arrays() flat, the client's
live_buffers() empty, tracemalloc shows no growth site, and
malloc_trim(0) reclaims nothing — the memory is genuinely referenced
inside the client (its IFRT-proxy frontend serves host reads from
host-held buffers; the transfer staging apparently joins them and is
never dropped). Measured 2026-08-19, libtpu 0.0.34 image.

Consequences for serving (measured in tools/soak_stream.py): a
long-running stream leaks ~33 MB/batch with the wire codec (0.728x raw),
~44 MB/batch without — a daemon OOMs a 64 GB host in ~2k batches.
Framework mitigation: `cli/batch --watch --recycle-rss-mb N` re-execs the
daemon over the threshold (lossless: sidecars are the completion record).
PCIe-attached deployments (the Dockerfile target) use the standard libtpu
client and do not have this issue.
"""

import gc
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


# deliberately NOT utils.runtime.rss_mb: this repro must not import the
# framework package (whose import-time jax config could confound "no
# framework code involved")
def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def main():
    import jax
    import jax.numpy as jnp

    x = np.random.RandomState(0).randint(
        -1000, 1000, size=(8, 2880000), dtype=np.int16
    )  # 46 MB: the bench batch's PCM shape
    f = jax.jit(lambda a: a.astype(jnp.float32).sum())
    float(f(jnp.asarray(x)))  # warm / compile
    gc.collect()
    client = jax.devices()[0].client

    def live():
        try:
            return len(client.live_buffers())
        except Exception:
            return "n/a"

    r0, lb0 = rss_mb(), live()
    n = 20
    for _ in range(n):
        z = jnp.asarray(x)  # host->device transfer
        float(f(z))  # force it to really happen
        del z
    gc.collect()
    r1 = rss_mb()
    print(
        f"pure device_put loop: rss {r0:.0f} -> {r1:.0f} MB "
        f"({(r1 - r0) / n:.1f} MB/iter), live_buffers {lb0} -> {live()}"
    )
    r0 = rss_mb()
    for _ in range(n):
        z = jnp.asarray(x)
        float(f(z))
        z.delete()
    gc.collect()
    print(f"explicit .delete():   -> {rss_mb():.0f} MB ({(rss_mb() - r0) / n:.1f} MB/iter)")


if __name__ == "__main__":
    main()
