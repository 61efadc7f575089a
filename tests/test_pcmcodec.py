"""PCM wire codec (io/pcmcodec.py + native/pcmcodec.cpp) and compact mask
runs (detect/signal_noise._runs_from_packed_program + native ccl_stats_runs).

The codec must be bit-exact (it feeds the detection STFT directly); the
native encoder must produce byte-identical layouts to the numpy fallback
(the fallback is the layout oracle)."""

import numpy as np
import pytest
import jax.numpy as jnp

import audio_analysis_tpu.io.pcmcodec as pc
import audio_analysis_tpu.native as nat


def _cases(rng):
    t = 48000
    return {
        "white_quiet": np.clip(rng.randn(3, 2 * t) * 328, -32768, 32767).astype(np.int16),
        "tone": (np.sin(2 * np.pi * 2800 * np.arange(2 * t) / t) * 20000).astype(np.int16)[None],
        "silence": np.zeros((2, t), np.int16),
        "extreme_alternation": np.asarray([[-32768, 32767] * (t // 2)], np.int16),
        "mixed": np.concatenate(
            [
                np.zeros((1, t // 2), np.int16),
                np.clip(rng.randn(1, t // 2) * 9000, -32768, 32767).astype(np.int16),
            ],
            axis=1,
        ),
        "odd_length": np.clip(rng.randn(1, t + 13) * 1000, -32768, 32767).astype(np.int16),
        "single_row_1d": np.clip(rng.randn(t) * 100, -32768, 32767).astype(np.int16),
    }


@pytest.mark.parametrize("order", [None, 0, 1, 2, 3])
def test_roundtrip_exact(rng, order):
    for name, x in _cases(rng).items():
        enc = pc.encode_pcm(x, order=order)
        xb = x if x.ndim == 2 else x[None]
        dec = pc.decode_pcm_np(enc)[:, : enc.n_valid]
        assert np.array_equal(dec, xb), (name, order, "numpy")
        dev = np.asarray(pc.decode_pcm(enc))[:, : enc.n_valid]
        assert np.array_equal(dev, xb), (name, order, "device")


def test_native_matches_numpy_fallback_layout(rng):
    if nat.load_pcmcodec_library() is None:
        pytest.skip("no native toolchain")
    for name, x in _cases(rng).items():
        if x.ndim == 1:
            x = x[None]
        for order in (0, 1, 2, 3):
            en = pc.encode_pcm(np.ascontiguousarray(x), order=order)
            saved = nat._LIBS.get("pcmcodec")
            nat._LIBS["pcmcodec"] = None
            try:
                ef = pc.encode_pcm(np.ascontiguousarray(x), order=order)
            finally:
                nat._LIBS["pcmcodec"] = saved
            assert en.shape == ef.shape and en.order == ef.order, name
            assert sorted(en.tiers) == sorted(ef.tiers), name
            for w in en.tiers:
                assert np.array_equal(en.tiers[w][0], ef.tiers[w][0]), (name, w)
                assert np.array_equal(en.tiers[w][1], ef.tiers[w][1]), (name, w)
            assert (en.exceptions is None) == (ef.exceptions is None), name
            if en.exceptions is not None:
                assert np.array_equal(en.exceptions[0], ef.exceptions[0]), name
                assert np.array_equal(en.exceptions[1], ef.exceptions[1]), name


def test_pfor_outliers_lower_width(rng):
    # sparse spikes on near-silence: without patched-FOR each spike inflates
    # its whole 256-sample block to 16+ bits; with it the block stays narrow
    # and the spike rides the exception stream. Bit-exactness + wire win.
    x = np.clip(rng.randn(2, 48000) * 40, -32768, 32767).astype(np.int16)
    spikes = rng.choice(x.shape[1], size=60, replace=False)
    x[0, spikes] = 32000
    x[1, spikes[:30]] = -32000
    enc = pc.encode_pcm(x, order=0)
    assert enc.exceptions is not None
    pos, _ = enc.exceptions
    n_blocks = (x.shape[0] * enc.shape[1]) // pc.BLOCK
    real = pos[pos < n_blocks * pc.BLOCK]
    assert len(real) >= 60  # every spike is an exception
    # no tier got dragged to spike width
    assert max(enc.tiers) < 15
    assert np.array_equal(pc.decode_pcm_np(enc)[:, : enc.n_valid], x)
    dev = np.asarray(pc.decode_pcm(enc))[:, : enc.n_valid]
    assert np.array_equal(dev, x)


def test_pfor_exception_in_silence_block(rng):
    # a single spike inside otherwise digital silence: pFOR lowers the block
    # to width 0 (cheaper as one exception than 8 words of width), and the
    # w==0-with-exceptions path must still emit the spike
    x = np.zeros((1, 4 * pc.BLOCK), np.int16)
    x[0, pc.BLOCK + 7] = 12345
    enc = pc.encode_pcm(x, order=0)
    assert enc.exceptions is not None
    assert not enc.tiers  # every block is width 0
    assert np.array_equal(pc.decode_pcm_np(enc), x)
    assert np.array_equal(np.asarray(pc.decode_pcm(enc)), x)


def test_band_limited_audio_compresses(rng):
    # band-limited content (every real recording) must beat raw int16
    t = np.arange(4 * 48000) / 48000
    x = np.zeros_like(t)
    for f, a in ((400, 0.05), (900, 0.03), (2500, 0.01)):
        x += a * np.sin(2 * np.pi * f * t)
    x = (x * 32767).astype(np.int16)[None]
    enc = pc.encode_pcm(x)
    assert x.nbytes / pc.wire_bytes(enc) > 1.8
    assert np.array_equal(pc.decode_pcm_np(enc)[:, : enc.n_valid], x)


def _device_runs(m, max_runs):
    from audio_analysis_tpu.detect.signal_noise import (
        _pack_bits,
        _runs_from_packed_program,
    )

    packed = _pack_bits(jnp.asarray(m, jnp.float32))
    return _runs_from_packed_program(
        packed, width=m.shape[1], max_runs=max_runs
    )


def test_mask_runs_match_numpy(rng):
    from audio_analysis_tpu.ops.components import (
        connected_components_with_stats_runs,
        connected_components_with_stats,
    )

    for _ in range(5):
        m = (rng.rand(64, 200) < 0.15).astype(np.float32)
        starts, lasts, n = _device_runs(m, 4096)
        n = int(n)
        assert n <= 4096
        got = connected_components_with_stats_runs(
            np.asarray(starts), np.asarray(lasts), n, 64, 200
        )
        want = connected_components_with_stats(m)
        got = sorted(map(tuple, got.tolist()))
        want = sorted(map(tuple, want.tolist()))
        assert got == want


def test_mask_runs_overflow_reports_count():
    # alternating columns: one run per (row, on-column) pair
    m = np.zeros((8, 64), np.float32)
    m[:, ::2] = 1.0
    starts, lasts, n = _device_runs(m, 16)
    assert int(n) == 8 * 32  # true count, beyond the budget
    assert starts.shape == (16,)


def test_ccl_runs_native_matches_numpy(rng):
    from audio_analysis_tpu.ops.components import (
        connected_components_with_stats_runs,
        _ccl_from_runs,
        _runs_of_rows,
    )

    lib = nat.load_ccl_library()
    if lib is None or getattr(lib, "_fn_runs", None) is None:
        pytest.skip("no native toolchain")
    m = (rng.rand(50, 120) < 0.2)
    rows, s, e = _runs_of_rows(m)
    flat_s = (rows * 120 + s).astype(np.int32)
    flat_last = (rows * 120 + e - 1).astype(np.int32)
    got = connected_components_with_stats_runs(flat_s, flat_last, len(rows), 50, 120)
    want = _ccl_from_runs(rows, s, e)
    assert sorted(map(tuple, got.tolist())) == sorted(map(tuple, want.tolist()))


def test_classify_codec_path_matches_raw(rng, monkeypatch, tmp_path):
    """classify_frames' int16 wire-codec upload (default on) must give the
    identical result to the raw upload path."""
    import json

    # tiny self-contained model fixture (no TF): reuse bench's builder
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import bench as B

    models = B.build_fixture_models(tmp_path)
    from audio_analysis_tpu.pipeline.classify import classify_frames

    y = np.clip(B.make_recording(6, seed=3)[0] * 32768, -32768, 32767).astype(np.int16)
    monkeypatch.setenv("AAT_WIRE_CODEC", "1")
    a = classify_frames(y, 48000, models, False, None, rng=np.random.RandomState(0))
    monkeypatch.setenv("AAT_WIRE_CODEC", "0")
    b = classify_frames(y, 48000, models, False, None, rng=np.random.RandomState(0))
    sa = json.dumps([t.get_meta() for t in a[0]]) + json.dumps(a[1:3], default=str)
    sb = json.dumps([t.get_meta() for t in b[0]]) + json.dumps(b[1:3], default=str)
    assert sa == sb


def test_order0_wins_on_white_noise(rng):
    """Differencing near-white noise doubles its variance (one whole bit
    per sample), so the auto-selector must pick the verbatim order-0
    predictor there — and it must put strictly fewer bytes on the wire."""
    x = np.clip(rng.randn(2, 96000) * 328, -32768, 32767).astype(np.int16)
    enc = pc.encode_pcm(x)
    assert enc.order == 0
    assert pc.wire_bytes(enc) < pc.wire_bytes(pc.encode_pcm(x, order=1))
    dec = pc.decode_pcm_np(enc)[:, : enc.n_valid]
    assert np.array_equal(dec, x)


def test_upload_pcm_raw_fallback(rng):
    """upload_pcm must ship raw (still exact) when the encoding would cost
    more wire bytes than the samples, and keep the codec when it wins."""
    loud = np.clip(rng.randn(2, 48000) * 9000, -32768, 32767).astype(np.int16)
    enc = pc.encode_pcm(loud)
    assert pc.wire_bytes(enc) >= loud.nbytes  # fixture really is incompressible
    up = np.asarray(pc.upload_pcm(loud))
    assert np.array_equal(up[:, : loud.shape[1]], loud)

    tonal = (np.sin(np.arange(2 * 48000).reshape(2, -1) / 9.0) * 8000).astype(
        np.int16
    )
    assert pc.wire_bytes(pc.encode_pcm(tonal)) < tonal.nbytes
    up = np.asarray(pc.upload_pcm(tonal))
    assert np.array_equal(up[:, : tonal.shape[1]], tonal)
