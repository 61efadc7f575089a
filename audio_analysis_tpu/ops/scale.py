"""Magnitude scaling ops: dB conversion and min-max normalisation.

dB semantics replicate librosa's ``power_to_db(ref=np.max)`` /
``amplitude_to_db(ref=np.max)`` as used by the reference
(src/identify_tracks.py:266, src/identify_morepork.py:152), but reductions are
taken per-example over given axes so a whole window grid can be scaled in one
fused device op instead of one host call per window.
"""

import jax.numpy as jnp


def power_to_db(
    S: jnp.ndarray,
    ref_axes=None,
    amin: float = 1e-10,
    top_db: float = 80.0,
) -> jnp.ndarray:
    """10*log10(S) referenced to the max of S (librosa power_to_db(ref=np.max)).

    ``ref_axes=None`` reduces over the whole array (exact librosa call
    semantics); pass e.g. ``(-2, -1)`` to scale each window of a batched grid
    independently, which is what the reference effectively does by calling
    librosa once per window.
    """
    S = jnp.asarray(S)
    ref = jnp.max(S, axis=ref_axes, keepdims=ref_axes is not None)
    log_spec = 10.0 * jnp.log10(jnp.maximum(amin, S))
    log_spec = log_spec - 10.0 * jnp.log10(jnp.maximum(amin, ref))
    if top_db is not None:
        peak = jnp.max(log_spec, axis=ref_axes, keepdims=ref_axes is not None)
        log_spec = jnp.maximum(log_spec, peak - top_db)
    return log_spec


def amplitude_to_db(
    S: jnp.ndarray,
    ref_axes=None,
    amin: float = 1e-5,
    top_db: float = 80.0,
) -> jnp.ndarray:
    """librosa amplitude_to_db(ref=np.max): power_to_db on S**2."""
    return power_to_db(S * S, ref_axes=ref_axes, amin=amin * amin, top_db=top_db)


def normalize_minmax(x: jnp.ndarray) -> jnp.ndarray:
    """Min-max normalise along the last axis to (approximately) [-1, 1].

    Exact port of the reference's ``normalize_data``
    (src/identify_tracks.py:202-209) including its quirk of adding the 1e-6
    epsilon *after* the division (so all-zero windows produce NaN there and
    here alike — behaviour parity).
    """
    min_v = jnp.min(x, axis=-1, keepdims=True)
    x = x - min_v
    max_v = jnp.max(x, axis=-1, keepdims=True)
    x = x / max_v + 0.000001
    x = x - 0.5
    return x * 2.0
