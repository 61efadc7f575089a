"""Packed-mask CCL parity: bit-packed path == unpacked path == cv2."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from audio_analysis_tpu.ops.components import (
    connected_components_with_stats,
    connected_components_with_stats_packed,
)


def _pack(mask):
    return np.packbits(mask.astype(np.uint8), axis=1)


@pytest.mark.parametrize("w", [10250, 64, 61, 8, 3])
@pytest.mark.parametrize("p", [0.02, 0.4, 0.9])
def test_packed_matches_unpacked(rng, w, p):
    m = (rng.rand(37, w) < p).astype(np.uint8)
    a = sorted(connected_components_with_stats(m).tolist())
    b = sorted(connected_components_with_stats_packed(_pack(m), w).tolist())
    assert a == b


def test_packed_matches_cv2(rng):
    m = (rng.rand(100, 333) < 0.35).astype(np.uint8)
    _, _, stats, _ = cv2.connectedComponentsWithStats(m)
    ref = sorted(stats[1:].tolist())
    got = sorted(connected_components_with_stats_packed(_pack(m), 333).tolist())
    np.testing.assert_array_equal(np.array(got), np.array(ref))


def test_packed_all_ones_row_boundary():
    m = np.ones((3, 24), np.uint8)  # whole rows of 0xFF bytes
    got = connected_components_with_stats_packed(_pack(m), 24)
    np.testing.assert_array_equal(got, [[0, 0, 24, 3, 72]])


def test_packed_int32_words_match_uint8(rng):
    """int32-word packing (device layout) decodes identically."""
    import jax.numpy as jnp
    from audio_analysis_tpu.detect.signal_noise import _pack_bits

    m = (rng.rand(50, 100) < 0.4).astype(np.uint8)
    words = np.asarray(_pack_bits(jnp.asarray(m.astype(np.float32))))
    assert words.dtype == np.int32
    got = sorted(connected_components_with_stats_packed(words, 100).tolist())
    ref = sorted(connected_components_with_stats(m).tolist())
    assert got == ref


def test_packed_pad_bits_ignored():
    # width 61: last 3 bits of each row are padding; a run touching the edge
    # must clamp to the logical width
    m = np.zeros((2, 61), np.uint8)
    m[0, 55:] = 1
    got = connected_components_with_stats_packed(_pack(m), 61)
    np.testing.assert_array_equal(got, [[55, 0, 6, 1, 6]])
