"""Runtime setup: persistent XLA compilation cache and stage timing.

TPU compiles of the big FFT/detection programs take seconds-to-minutes on a
cold process (measured: 6-25 s per program over the axon tunnel); the CLI is
a fresh process per recording, so a persistent on-disk compilation cache is
load-bearing for serving latency. Controlled by AAT_COMPILATION_CACHE
(default on; set to 0/off to disable) and AAT_CACHE_DIR.
"""

import logging
import os
import time
from contextlib import contextmanager
from pathlib import Path

_CACHE_ENABLED = False


def env_flag(name):
    """Tri-state env flag: True/False when set, None when absent."""
    v = os.environ.get(name)
    if v is None or v == "":
        return None
    return v.lower() in ("1", "true", "on", "yes")


def fast_mode() -> bool:
    """AAT_FAST=1 — the single evidence-backed throughput preset: Pallas
    DFT->mel frontend + bfloat16 Keras compute (+ the wire codec, which is
    already default-on). Parity-strict float32/FFT stays the default;
    individual knobs (AAT_PALLAS / AAT_KERAS_BF16) override the preset in
    either direction. Read at call/load time so a warm process can A/B."""
    return bool(env_flag("AAT_FAST"))


def rss_mb() -> float:
    """This process's resident set in MB (0.0 where /proc is unreadable).
    One reader for the daemon's --recycle-rss-mb check and the soak/leak
    tools — the axon tunnel client leaks host RSS by the bytes of every
    host->device transfer (tools/leak_repro_axon.py), so RSS monitoring is
    part of the serving story."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0


def _cpu_primary(val):
    """True iff `val` names cpu as the PRIMARY jax platform. Must check the
    FIRST entry, not a substring: the resolved config is a priority list
    like "axon,cpu", and a substring test silently disabled the persistent
    compile cache in every TPU process (round-5 finding: a 199 s tunnel
    compile dropped to 2.2 s cross-process once the cache actually
    engaged)."""
    return bool(val) and val.split(",")[0].strip().lower() == "cpu"


def enable_compilation_cache():
    """Idempotently point JAX at a persistent compilation cache dir."""
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    flag = os.environ.get("AAT_COMPILATION_CACHE", "1").lower()
    if flag in ("0", "off", "false"):
        return
    # The cache exists for slow TPU compiles; on CPU it stores
    # machine-feature-specific AOT results that can SIGILL when loaded on a
    # different host profile — skip it when CPU is the PRIMARY platform
    # (via the env var OR the config knob, which is how the axon plugin
    # must be overridden).
    if _cpu_primary(os.environ.get("JAX_PLATFORMS", "")):
        return
    try:
        import jax

        if _cpu_primary(jax.config.jax_platforms or ""):
            return
    except Exception:
        pass
    cache_dir = os.environ.get(
        "AAT_CACHE_DIR", str(Path.home() / ".cache" / "audio_analysis_tpu" / "xla")
    )
    try:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _CACHE_ENABLED = True
    except Exception:  # cache is an optimisation, never fatal
        logging.debug("could not enable persistent compilation cache", exc_info=True)


class StageTimer:
    """Per-stage wall-clock timing (decode/frontend/detect/infer/post),
    surfaced alongside the reference's processing_time_seconds."""

    def __init__(self):
        self.stages = {}

    @contextmanager
    def stage(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + time.perf_counter() - t0

    def as_dict(self, decimals=3):
        return {k: round(v, decimals) for k, v in self.stages.items()}
