"""Tracing/profiling hooks (SURVEY.md §5: the reference only records
wall-clock processing_time_seconds, src/analyse.py:451-453; the framework
adds jax.profiler traces and per-stage timing)."""

import contextlib
import logging
import os


@contextlib.contextmanager
def maybe_trace(label="analysis"):
    """Capture a jax.profiler trace when AAT_TRACE_DIR is set; otherwise a
    no-op. View the output with TensorBoard or xprof."""
    trace_dir = os.environ.get("AAT_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    path = os.path.join(trace_dir, label)
    os.makedirs(path, exist_ok=True)
    logging.info("capturing jax.profiler trace to %s", path)
    with jax.profiler.trace(path):
        yield


def annotate(name):
    """Decorator: wrap a function in a named profiler region."""

    def deco(fn):
        def wrapped(*a, **k):
            import jax

            with jax.profiler.TraceAnnotation(name):
                return fn(*a, **k)

        wrapped.__name__ = getattr(fn, "__name__", name)
        return wrapped

    return deco
