"""Parity tests: XLA morphology + native CCL vs OpenCV (SURVEY.md §4.2)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp

from audio_analysis_tpu.ops.morphology import dilate, erode, opening
from audio_analysis_tpu.ops.components import (
    connected_components_with_stats,
    _connected_components_numpy,
)
from audio_analysis_tpu.native import load_ccl_library


def _rand_mask(rng, h, w, p=0.3):
    return (rng.rand(h, w) < p).astype(np.uint8)


@pytest.mark.parametrize("kh,kw", [(4, 4), (10, 42), (1, 42), (3, 3), (2, 5)])
def test_dilate_matches_cv2(rng, kh, kw):
    m = _rand_mask(rng, 64, 128)
    ref = cv2.dilate(m, np.ones((kh, kw), np.uint8))
    got = np.asarray(dilate(jnp.asarray(m), kh, kw)) > 0.5
    np.testing.assert_array_equal(got.astype(np.uint8), ref)


@pytest.mark.parametrize("kh,kw", [(4, 4), (10, 42), (1, 42), (3, 3), (2, 5)])
def test_erode_matches_cv2(rng, kh, kw):
    m = _rand_mask(rng, 64, 128, p=0.8)
    ref = cv2.erode(m, np.ones((kh, kw), np.uint8))
    got = np.asarray(erode(jnp.asarray(m), kh, kw)) > 0.5
    np.testing.assert_array_equal(got.astype(np.uint8), ref)


def test_open_matches_cv2(rng):
    m = _rand_mask(rng, 100, 200, p=0.45)
    ref = cv2.morphologyEx(m, cv2.MORPH_OPEN, np.ones((4, 4), np.uint8))
    got = np.asarray(opening(jnp.asarray(m), 4, 4)) > 0.5
    np.testing.assert_array_equal(got.astype(np.uint8), ref)


def _cv2_stats_sorted(mask):
    _, _, stats, _ = cv2.connectedComponentsWithStats(mask)
    stats = stats[1:]  # drop background
    return np.array(sorted(stats.tolist()))


def _ours_sorted(stats):
    return np.array(sorted(np.asarray(stats).tolist()))


@pytest.mark.parametrize("p", [0.05, 0.3, 0.6])
def test_ccl_matches_cv2(rng, p):
    m = _rand_mask(rng, 80, 150, p=p)
    ref = _cv2_stats_sorted(m)
    got = _ours_sorted(connected_components_with_stats(m))
    np.testing.assert_array_equal(got, ref)


def test_ccl_numpy_fallback_matches_cv2(rng):
    m = _rand_mask(rng, 60, 90, p=0.4)
    ref = _cv2_stats_sorted(m)
    got = _ours_sorted(_connected_components_numpy(m))
    np.testing.assert_array_equal(got, ref)


def test_ccl_native_available():
    assert load_ccl_library() is not None, "native CCL should build with g++"


def test_ccl_packed_nonzero_pad_bits(rng):
    """Runs living entirely in pad bits must not emit components.

    _pack_bits zero-pads, but the C ABI must be safe for any producer:
    set every pad bit to 1 and check parity with cv2 on the logical mask.
    """
    lib = load_ccl_library()
    assert lib is not None
    h, w = 37, 45  # w % 8 != 0 so the last byte has 3 pad bits
    m = _rand_mask(rng, h, w, p=0.35)
    packed = np.packbits(m, axis=1)  # zero pad bits...
    packed[:, -1] |= (1 << (8 * packed.shape[1] - w)) - 1  # ...now force to 1
    out = np.zeros((h * w // 2 + 2, 5), np.int64)
    n = lib.ccl_stats_packed(
        np.ascontiguousarray(packed), h, w, packed.shape[1], out
    )
    np.testing.assert_array_equal(
        _ours_sorted(out[:n]), _cv2_stats_sorted(m)
    )


def test_ccl_shapes():
    m = np.zeros((10, 10), np.uint8)
    assert connected_components_with_stats(m).shape == (0, 5)
    m[2:5, 3:7] = 1
    s = connected_components_with_stats(m)
    np.testing.assert_array_equal(s, [[3, 2, 4, 3, 12]])


# -- packed-word binary morphology (the detect program's fast path) ----------


def _pack_u32(m):
    from audio_analysis_tpu.detect.signal_noise import _pack_bits
    import jax

    return jax.lax.bitcast_convert_type(
        _pack_bits(jnp.asarray(m.astype(np.float32))), jnp.uint32
    )


def _unpack_u32(u, width):
    words = np.asarray(u).view(np.uint32)
    bits = np.unpackbits(words.byteswap().view(np.uint8).reshape(words.shape[0], -1), axis=1)
    return bits[:, :width]


@pytest.mark.parametrize("kh,kw", [(4, 4), (10, 42), (1, 42), (3, 3), (2, 5), (1, 97), (20, 50)])
@pytest.mark.parametrize("w", [128, 150, 33])
def test_packed_dilate_matches_cv2(rng, kh, kw, w):
    from audio_analysis_tpu.ops.morphology import packed_dilate

    m = _rand_mask(rng, 8 if kh == 20 else 64, w)  # kh=20 > 8 rows: kernel taller than the mask
    ref = cv2.dilate(m, np.ones((kh, kw), np.uint8))
    got = _unpack_u32(packed_dilate(_pack_u32(m), kh, kw), w)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("kh,kw", [(4, 4), (10, 42), (1, 42), (3, 3), (2, 5), (1, 97), (20, 50)])
@pytest.mark.parametrize("w", [128, 150, 33])
def test_packed_erode_matches_cv2(rng, kh, kw, w):
    from audio_analysis_tpu.ops.morphology import packed_erode

    m = _rand_mask(rng, 8 if kh == 20 else 64, w, p=0.85)
    ref = cv2.erode(m, np.ones((kh, kw), np.uint8))
    u = _pack_u32(m)
    # pad bits past the logical width must be pre-set (erode contract)
    ones = _pack_u32(np.ones((1, w), np.uint8))
    got = _unpack_u32(packed_erode(u | ~ones, kh, kw), w)
    np.testing.assert_array_equal(got, ref)
