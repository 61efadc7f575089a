"""Native model (TuiNet) shape/grad sanity and MagTransform math."""

import numpy as np
import jax
import jax.numpy as jnp

from audio_analysis_tpu.models.birdnet import TuiNet, TuiNetConfig, init_params, apply
from audio_analysis_tpu.models.magtransform import (
    mag_transform,
    mag_transform_init,
    mag_transform_apply_constraint,
)


def test_mag_transform_matches_reference_math(rng):
    x = np.abs(rng.randn(4, 8)).astype(np.float32)
    a = np.float32(-1.0)
    got = np.asarray(mag_transform(jnp.asarray(x), jnp.asarray(a)))
    sig = 1.0 / (1.0 + np.exp(1.0))
    np.testing.assert_allclose(got, x**sig, rtol=1e-5)


def test_mag_transform_inits():
    assert mag_transform_init(v2=True).shape == (1,)
    assert float(mag_transform_init(v2=True)[0]) == -1.0
    assert mag_transform_init(v2=False).shape == ()
    assert float(mag_transform_init(v2=False)) == 0.0


def test_mag_transform_constraint_clips():
    a = jnp.array([3.0])
    out = np.asarray(mag_transform_apply_constraint(a))
    assert abs(out[0] - 1.0) < 1e-5  # norm clipped to max 1
    # MinMaxNorm(min=-2, max=1): desired = clip(norm, -2, 1); norm 0.5 stays
    a = jnp.array([0.5])
    out = np.asarray(mag_transform_apply_constraint(a))
    np.testing.assert_allclose(out[0], 0.5, atol=1e-5)


def test_tuinet_forward_shapes():
    cfg = TuiNetConfig(num_classes=5, n_mels=64, time_steps=48, channels=(16, 32))
    net = TuiNet(cfg, seed=1)
    x = jnp.ones((3, 64, 48, 1))
    logits = net(x)
    assert logits.shape == (3, 5)
    assert logits.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(logits)))


def test_tuinet_gradients_flow():
    cfg = TuiNetConfig(num_classes=3, n_mels=32, time_steps=32, channels=(8,))
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.ones((2, 32, 32, 1)) * 0.5
    y = jnp.array([0, 2])

    def loss(p):
        logits = apply(p, x, cfg, training=True)
        return -jnp.mean(
            jnp.take_along_axis(jax.nn.log_softmax(logits), y[:, None], axis=1)
        )

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)
