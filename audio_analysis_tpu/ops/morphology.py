"""Binary morphology on device via ``lax.reduce_window``.

Replaces the reference's OpenCV calls (src/identify_tracks.py:669-684:
MORPH_OPEN 4x4, dilate (h, 42), erode (h//10, 42)) with XLA reduce_window
max/min ops that run on the TPU VPU, with OpenCV's exact anchor semantics:

- anchor at (k//2) per axis, i.e. window offsets [-(k//2), k-1-k//2]
  (empirically verified against cv2 for even and odd kernels);
- borders behave as identity (erode pads +inf, dilate pads -inf).
"""

import jax
import jax.numpy as jnp


def _reduce1axis(x: jnp.ndarray, k: int, axis: int, is_max: bool) -> jnp.ndarray:
    pad = [(0, 0)] * x.ndim
    pad[axis] = (k // 2, k - 1 - k // 2)
    window = [1] * x.ndim
    window[axis] = k
    strides = (1,) * x.ndim
    if is_max:
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, tuple(window), strides, pad
        )
    return jax.lax.reduce_window(x, jnp.inf, jax.lax.min, tuple(window), strides, pad)


def _reduce2d(x: jnp.ndarray, kh: int, kw: int, is_max: bool) -> jnp.ndarray:
    """Separable rectangular morphology: max/min over a (kh, kw) all-ones
    kernel == rows pass then cols pass (exact; kh+kw instead of kh*kw work —
    the reference's (10, 42) dilate drops from 420 to 52 ops/pixel)."""
    if kh > 1:
        x = _reduce1axis(x, kh, x.ndim - 2, is_max)
    if kw > 1:
        x = _reduce1axis(x, kw, x.ndim - 1, is_max)
    if kh == 1 and kw == 1:
        return x
    return x


def dilate(x: jnp.ndarray, kh: int, kw: int) -> jnp.ndarray:
    """cv2.dilate with an all-ones (kh, kw) kernel over the last two axes."""
    return _reduce2d(x.astype(jnp.float32), kh, kw, is_max=True)


def erode(x: jnp.ndarray, kh: int, kw: int) -> jnp.ndarray:
    """cv2.erode with an all-ones (kh, kw) kernel over the last two axes."""
    return _reduce2d(x.astype(jnp.float32), kh, kw, is_max=False)


def opening(x: jnp.ndarray, kh: int, kw: int) -> jnp.ndarray:
    """cv2.morphologyEx(MORPH_OPEN) == erode then dilate with one kernel."""
    return dilate(erode(x, kh, kw), kh, kw)


# -- packed-word binary morphology -------------------------------------------
#
# The detection mask is binary and ends up bit-packed ([R, W] int32 words,
# MSB-first) for the wire anyway, so morphology runs on the packed words
# directly: a k-wide max/min window is a log2(k)-step shift+OR/AND doubling
# over words — identical output to the float reduce_window path (binary
# morphology is exact) at 1/32 the HBM traffic and ~k/log2(k) fewer ops.
# cv2 anchor semantics match dilate()/erode() above: window offsets
# [-(k//2), k-1-k//2]; shifted-in bits are the op identity (0 for dilate,
# 1 for erode — cv2's border-identity padding).


def _shift_cols(u: jnp.ndarray, d: int, fill_ones: bool) -> jnp.ndarray:
    """S_d over bit columns of [..., R, W] uint32 MSB-first words:
    out[col] = in[col - d] (d static, either sign); shifted-in bits are
    `fill_ones`. Bits have no physical edge at W*32 — callers mask pads."""
    if d == 0:
        return u
    w = u.shape[-1]
    q, b = divmod(abs(d), 32)
    fill = jnp.full(u.shape[:-1] + (1,), 0xFFFFFFFF if fill_ones else 0, jnp.uint32)

    def words_at(offset):  # word index j -> in word j - offset (fill outside)
        if offset <= 0:
            o = -offset
            return jnp.concatenate([u[..., o:], jnp.repeat(fill, min(o, w), -1)], -1) if o else u
        o = min(offset, w)
        return jnp.concatenate([jnp.repeat(fill, o, -1), u[..., : w - o]], -1)

    if d > 0:
        base, prev = words_at(q), words_at(q + 1)
        if b == 0:
            return base
        return (base >> jnp.uint32(b)) | (prev << jnp.uint32(32 - b))
    base, nxt = words_at(-q), words_at(-q - 1)
    if b == 0:
        return base
    return (base << jnp.uint32(b)) | (nxt >> jnp.uint32(32 - b))


def _shift_rows(u: jnp.ndarray, d: int, fill_ones: bool) -> jnp.ndarray:
    """S_d over the row axis (-2): out[r] = in[r - d], fill at the edges."""
    if d == 0:
        return u
    r = u.shape[-2]
    pad = jnp.full(
        u.shape[:-2] + (min(abs(d), r), u.shape[-1]),
        0xFFFFFFFF if fill_ones else 0,
        jnp.uint32,
    )
    if d > 0:
        return jnp.concatenate([pad, u[..., : r - pad.shape[-2], :]], -2)
    return jnp.concatenate([u[..., pad.shape[-2] :, :], pad], -2)


def _accumulate(u, k, shift, combine, fill_ones):
    """Suffix-window accumulation by doubling: y[i] = op(in[i-k+1 .. i]).
    Shifted-in values at the low edge are the op identity — correct, because
    the true accumulation over all-border indices IS the identity. The high
    edge is the caller's problem (it must pad before anchoring)."""
    y, cover = u, 1
    while cover < k:
        step = min(cover, k - cover)
        y = combine(y, shift(y, step, fill_ones))
        cover += step
    return y


def _windowed_rows(u, k, combine, fill_ones):
    """op over the cv2-anchored row window [i-k//2, i+k-1-k//2]. The row
    axis is physically padded by r = k-1-k//2 identity rows at the high end
    first — anchoring a clamped-shift accumulation without the pad would
    read accumulated values past the end that were never computed."""
    if k <= 1:
        return u
    r = k - 1 - k // 2
    if r:
        pad = jnp.full(
            u.shape[:-2] + (r, u.shape[-1]), 0xFFFFFFFF if fill_ones else 0, jnp.uint32
        )
        u = jnp.concatenate([u, pad], -2)
    y = _accumulate(u, k, _shift_rows, combine, fill_ones)
    return y[..., r:, :] if r else y


def _windowed_cols(u, k, combine, fill_ones):
    """Same over bit columns; the high end is padded by ceil(r/32) identity
    words, and the final anchor shift by -r happens on the padded array."""
    if k <= 1:
        return u
    r = k - 1 - k // 2
    w = u.shape[-1]
    p = -(-r // 32)
    if p:
        pad = jnp.full(u.shape[:-1] + (p,), 0xFFFFFFFF if fill_ones else 0, jnp.uint32)
        u = jnp.concatenate([u, pad], -1)
    y = _accumulate(u, k, _shift_cols, combine, fill_ones)
    if r:
        y = _shift_cols(y, -r, fill_ones)
    return y[..., :w]


def packed_dilate(u: jnp.ndarray, kh: int, kw: int) -> jnp.ndarray:
    """cv2.dilate on [..., R, W] packed uint32 words (all-ones kh x kw).
    Pad bits beyond the logical width must be 0 (the dilate identity)."""
    u = _windowed_rows(u, kh, jnp.bitwise_or, False)
    return _windowed_cols(u, kw, jnp.bitwise_or, False)


def packed_erode(u: jnp.ndarray, kh: int, kw: int) -> jnp.ndarray:
    """cv2.erode on packed words. Pad bits beyond the logical width must be
    pre-set to 1 by the caller (they are inside the window of valid edge
    columns); the result's pad bits are unspecified — mask after."""
    u = _windowed_rows(u, kh, jnp.bitwise_and, True)
    return _windowed_cols(u, kw, jnp.bitwise_and, True)
