"""MagTransform: learnable magnitude compression ``y = x ** sigmoid(a)``.

The reference ships this as a custom Keras layer in two variants
(src/magtransform.py:9-19: scalar ``a`` init 0.0; src/magtransformv2.py:8-21:
shape-[1] ``a`` init -1.0 with a MinMaxNorm [-2, 1] constraint). In JAX it is
one fused VPU expression; the constraint only matters during training.
"""

import jax.numpy as jnp
import jax


def mag_transform(x: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """x ** sigmoid(a); `a` is a scalar (v1) or shape-[1] (v2) parameter."""
    return jnp.power(x, jax.nn.sigmoid(a))


def mag_transform_init(v2: bool = True):
    """Initial parameter value per variant (v1: 0.0 scalar, v2: [-1.0])."""
    if v2:
        return jnp.array([-1.0], dtype=jnp.float32)
    return jnp.array(0.0, dtype=jnp.float32)


def mag_transform_apply_constraint(a: jnp.ndarray, min_value=-2.0, max_value=1.0) -> jnp.ndarray:
    """Keras MinMaxNorm: w * (clip(norm) / (eps + norm)) along last axis."""
    norms = jnp.sqrt(jnp.sum(jnp.square(a), axis=-1, keepdims=True))
    desired = jnp.clip(norms, min_value, max_value)
    return a * (desired / (1e-7 + norms))
