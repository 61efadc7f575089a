"""Spectral signal detection + end-of-data scan as static-shape TPU programs.

Reference behaviour (src/identify_tracks.py:650-706, 387-413): STFT the
recording, median-threshold, morphology, connected components. The reference
truncates the PCM to the detected data end and re-runs numpy/OpenCV per
recording; here the device programs take the *padded* recording plus a valid
length scalar, so one compiled program serves any recording in a length
bucket:

- samples >= n_valid are zeroed before the STFT (provably identical frames to
  truncating, given centre padding);
- medians/max reduce over valid frames only (masked sort-median);
- each morphology stage sets the invalid region to that op's identity value,
  reproducing OpenCV's border-identity semantics at the true data boundary.

Connected-component labelling runs on the host C++ op over the returned mask.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from audio_analysis_tpu.ops.stft import stft_magnitude, num_frames
from audio_analysis_tpu.ops.mel import fft_frequencies, mel_spec
from audio_analysis_tpu.ops.morphology import packed_dilate, packed_erode
from audio_analysis_tpu.ops.components import connected_components_with_stats_packed
from audio_analysis_tpu.detect.signal import Signal, SIGNAL_WIDTH


def _to_float(frames: jnp.ndarray) -> jnp.ndarray:
    """int16 PCM -> float32 in [-1, 1) (exactly the 16-bit decode scaling,
    reference src/common.py:92 semantics); float input passes through."""
    if frames.dtype == jnp.int16:
        return frames.astype(jnp.float32) / 32768.0
    return frames


def _masked_median_fast(x: jnp.ndarray, n_valid, axis: int, keepdims=True) -> jnp.ndarray:
    """np.median semantics over the first n_valid entries of `axis` (others
    +inf), exact, via rank selection instead of sort. x must be >= 0.

    Only the LOWER middle rank is binary-searched (one array read per
    iteration); the upper middle element is either the same value (when its
    count covers rank k2) or the array's successor of it — both derived in
    one extra fused pass. Halves the HBM traffic of searching both ranks."""
    n_valid = jnp.asarray(n_valid, jnp.int32)
    red_shape = x.shape[:axis] + x.shape[axis + 1 :]
    k1 = jnp.broadcast_to((n_valid - 1) // 2, red_shape)
    k2 = jnp.broadcast_to(n_valid // 2, red_shape)

    xi = jax.lax.bitcast_convert_type(x, jnp.int32)
    z = jnp.zeros(red_shape, jnp.int32)
    top = jnp.full(red_shape, jnp.int32(2**31 - 1))

    def body(_, state):
        lo, hi = state
        m = lo + (hi - lo) // 2
        c = jnp.sum(xi <= jnp.expand_dims(m, axis), axis=axis).astype(jnp.int32)
        t = c >= k1 + 1
        return (jnp.where(t, lo, m + 1), jnp.where(t, m, hi))

    lo1, _ = jax.lax.fori_loop(0, 31, body, (z, top))
    m1 = jnp.expand_dims(lo1, axis)
    cnt = jnp.sum(xi <= m1, axis=axis).astype(jnp.int32)
    succ = jnp.min(jnp.where(xi > m1, xi, jnp.int32(2**31 - 1)), axis=axis)
    lo2 = jnp.where(cnt >= k2 + 1, lo1, succ)
    a = jax.lax.bitcast_convert_type(lo1, jnp.float32)
    b = jax.lax.bitcast_convert_type(lo2, jnp.float32)
    med = (a + b) * 0.5
    if keepdims:
        med = jnp.expand_dims(med, axis)
    return med


def _masked_medians_rowcol(spec, col_valid, nvf, n_rows):
    """Row medians (over the first `nvf` columns) AND column medians (over
    all `n_rows` rows) of a non-negative [bins, T] float32 spectrogram, in
    ONE fused rank search — exactly np.median on both axes.

    The two searches in `_masked_median_fast` form read the array 2x31
    times (binary search, one bit per pass); this walks both searches
    together, 2 bits per iteration (3 midpoints each, sibling reductions
    XLA fuses into a single pass over the input), so the spectrogram
    streams from HBM 16+2 times instead of 64 — the medians were pure
    HBM-bandwidth cost in the detect program (measured ~61 ms of a 419 ms
    8x60s batch)."""
    bins, t = spec.shape
    xi = jax.lax.bitcast_convert_type(spec, jnp.int32)  # monotone for x >= 0
    inf_bits = jnp.int32(0x7F800000)  # +inf: invalid cols sort above
    xi_r = jnp.where(col_valid[None, :], xi, inf_bits)

    nvf = jnp.asarray(nvf, jnp.int32)
    k1_r = jnp.broadcast_to((nvf - 1) // 2, (bins,))
    k2_r = jnp.broadcast_to(nvf // 2, (bins,))
    k1_c = jnp.full((t,), (n_rows - 1) // 2, jnp.int32)
    k2_c = jnp.full((t,), n_rows // 2, jnp.int32)

    def quarter(lo, hi, i):
        # (hi-lo)*i would overflow int32 near the initial 2^31 span;
        # (span//4)*i keeps the midpoints monotone and in (lo, hi]
        return lo + ((hi - lo) // 4) * i

    def body(_, st):
        lo_r, hi_r, lo_c, hi_c = st
        mr = [jnp.expand_dims(quarter(lo_r, hi_r, i), 1) for i in (1, 2, 3)]
        mc = [jnp.expand_dims(quarter(lo_c, hi_c, i), 0) for i in (1, 2, 3)]
        # six sibling reductions over one read of the array
        cr = [jnp.sum(xi_r <= m, axis=1, dtype=jnp.int32) for m in mr]
        cc = [jnp.sum(xi <= m, axis=0, dtype=jnp.int32) for m in mc]

        def narrow(lo, hi, counts, k1):
            # t = number of midpoints whose count is still below the target
            # rank -> subinterval index; degenerate midpoints stay correct
            tq = sum((c < k1 + 1).astype(jnp.int32) for c in counts)
            lo2 = jnp.where(tq == 0, lo, quarter(lo, hi, tq) + 1)
            hi2 = jnp.where(tq == 3, hi, quarter(lo, hi, tq + 1))
            return lo2, hi2

        lo_r, hi_r = narrow(lo_r, hi_r, cr, k1_r)
        lo_c, hi_c = narrow(lo_c, hi_c, cc, k1_c)
        return lo_r, hi_r, lo_c, hi_c

    z_r, top_r = jnp.zeros(bins, jnp.int32), jnp.full(bins, jnp.int32(2**31 - 1))
    z_c, top_c = jnp.zeros(t, jnp.int32), jnp.full(t, jnp.int32(2**31 - 1))
    # span shrinks to <= span//4 + 3 per iteration (floor midpoints): 16
    # passes bring 2^31 down to <= 4 and spans <= 4 collapse within 3 more
    # (degenerate midpoints force t into {0, 3}); 20 leaves a margin
    lo_r, _, lo_c, _ = jax.lax.fori_loop(
        0, 20, body, (z_r, top_r, z_c, top_c)
    )

    # upper-median resolution, both axes in one fused pass (same scheme as
    # _masked_median_fast: the upper middle is the found value when its
    # count covers rank k2, else the array's successor of it)
    m_r = jnp.expand_dims(lo_r, 1)
    m_c = jnp.expand_dims(lo_c, 0)
    cnt_r = jnp.sum(xi_r <= m_r, axis=1, dtype=jnp.int32)
    succ_r = jnp.min(jnp.where(xi_r > m_r, xi_r, jnp.int32(2**31 - 1)), axis=1)
    cnt_c = jnp.sum(xi <= m_c, axis=0, dtype=jnp.int32)
    succ_c = jnp.min(jnp.where(xi > m_c, xi, jnp.int32(2**31 - 1)), axis=0)
    up_r = jnp.where(cnt_r >= k2_r + 1, lo_r, succ_r)
    up_c = jnp.where(cnt_c >= k2_c + 1, lo_c, succ_c)

    f = lambda v: jax.lax.bitcast_convert_type(v, jnp.float32)
    row = ((f(lo_r) + f(up_r)) * 0.5)[:, None]
    col = ((f(lo_c) + f(up_c)) * 0.5)[None, :]
    return row, col


def _signal_mask(frames, n_valid, *, sr, hop_length, n_fft):
    """Device computation: padded PCM + valid-sample count -> packed mask.

    Mirrors reference src/identify_tracks.py:650-684 on the valid region.
    """
    t = frames.shape[0]
    idx = jnp.arange(t)
    frames = jnp.where(idx < n_valid, frames, 0.0)

    spec = stft_magnitude(frames, n_fft, hop_length)  # [bins, T]
    return _signal_mask_from_spec(
        spec, n_valid, sr=sr, hop_length=hop_length, n_fft=n_fft
    )


def _signal_mask_from_spec(spec, n_valid, *, sr, hop_length, n_fft):
    """The mask pipeline downstream of the |STFT|: callers supply the
    [bins, T] magnitude spectrogram of the (invalid-region-zeroed) PCM —
    either the XLA FFT's or the Pallas split-bf16 kernel's."""
    bins, total_frames = spec.shape
    nvf = 1 + n_valid // hop_length  # valid frame count
    col_idx = jnp.arange(total_frames)
    col_valid = col_idx < nvf

    a_max = jnp.max(jnp.where(col_valid[None, :], spec, 0.0))
    spec = spec / a_max

    # row medians over valid columns only; column medians over all rows
    # (fused rank selection, not sort: exactly np.median on both axes —
    # see _masked_medians_rowcol)
    row_medians, column_medians = _masked_medians_rowcol(
        spec, col_valid, nvf, bins
    )
    return _mask_threshold_morph(
        spec, row_medians, column_medians, col_valid,
        sr=sr, hop_length=hop_length, n_fft=n_fft,
    )


def _mask_threshold_morph(
    spec, row_medians, column_medians, col_valid, *, sr, hop_length, n_fft
):
    """Median thresholds -> bit-packed morphology, shared by the XLA and
    Pallas-medians paths. `spec` is the a_max-normalised magnitude."""
    mask = (spec > 3 * column_medians) & (spec > 3 * row_medians)
    mask = mask & col_valid[None, :]

    # structuring element sizes (host-static)
    width = int(SIGNAL_WIDTH * sr / hop_length)
    freqs = fft_frequencies(sr, n_fft)
    height = 0
    for i, f in enumerate(freqs):
        if f > 100:  # freq_range=100 (reference :656,675-681)
            height = i + 1
            break

    # Morphology on the bit-packed mask (ops/morphology.py packed_*):
    # binary, so shift+OR/AND doubling over int32 words is EXACTLY the
    # float reduce_window path (pinned by test_ops_cv) at 1/32 the HBM
    # traffic — the six float passes over the [bins, T] mask were ~30% of
    # the whole detect program. The invalid region (cols >= nvf, plus the
    # pad bits past T) is set to each op's identity between stages, exactly
    # like the float path's set_invalid, via one packed col_valid row.
    u = jax.lax.bitcast_convert_type(_pack_bits(mask), jnp.uint32)
    cv = jax.lax.bitcast_convert_type(
        _pack_bits(col_valid[None, :]), jnp.uint32
    )  # [1, W]; pad bits 0
    inv = ~cv  # invalid columns and pad bits

    # MORPH_OPEN 4x4 == erode then dilate
    u = packed_erode(u | inv, 4, 4)
    u = packed_dilate(u & cv, 4, 4)
    u = packed_dilate(u & cv, height, width)
    u = packed_erode(u | inv, height // 10, width)
    u = u & cv
    return jax.lax.bitcast_convert_type(u, jnp.int32)


_signal_mask_program = partial(jax.jit, static_argnames=("sr", "hop_length", "n_fft"))(
    _signal_mask
)

# per-recording run budget for the compact mask transfer; overflowing
# recordings (adversarially dense masks) fall back to the packed mask.
# Read from AAT_MAX_RUNS at call time so the knob works however late it is
# set (each distinct budget compiles its own tiny run-extraction program).
def max_runs() -> int:
    return int(__import__("os").environ.get("AAT_MAX_RUNS", "16384"))


# run-extraction program sizes: the kth-set-bits cost is ~linear in the
# static query budget (measured 30.3/12.2/7.4 ms per kth call for
# k=16384/4096/1024 on an 8x60s batch), so the actual run count — known
# from the cheap counting reduction — picks the smallest compiled size
# that fits. At most len(_RUN_BUCKETS) tiny programs ever compile.
_RUN_BUCKETS = (256, 1024, 4096, 16384)


def _runs_bucket(n_max: int) -> int:
    cap = max_runs()
    for b in _RUN_BUCKETS:
        if b >= cap:
            break
        if n_max <= b:
            return b
    return cap


def _run_start_bits(u: jnp.ndarray) -> jnp.ndarray:
    """Bits set where a horizontal run begins: on-bits whose left neighbour
    (previous column in the MSB-first packing) is off. Single source of
    truth shared by the count program and the extraction program — the
    bucket sizing must count exactly the bits the extraction emits."""
    pad_cfg = [(0, 0)] * (u.ndim - 1) + [(1, 0)]
    left = jnp.pad(u[..., :-1], pad_cfg)
    prev_bit = (u >> jnp.uint32(1)) | (left << jnp.uint32(31))
    return u & ~prev_bit


@jax.jit
def _run_count_program(packed: jnp.ndarray):
    """Per-recording horizontal-run counts of [..., R, W]-word packed masks,
    plus the batch-global maximum (a replicated scalar: under multi-host
    sharding every process reads the same value, so the bucket choice that
    sizes the runs program stays collective)."""
    starts = _run_start_bits(jax.lax.bitcast_convert_type(packed, jnp.uint32))
    counts = jnp.sum(
        _popcount32(starts).astype(jnp.int32), axis=(-2, -1), dtype=jnp.int32
    )
    return counts, jnp.max(counts, initial=0)


def _popcount32(w: jnp.ndarray) -> jnp.ndarray:
    """Per-word population count, uint32 in/out (SWAR)."""
    w = w - ((w >> jnp.uint32(1)) & jnp.uint32(0x55555555))
    w = (w & jnp.uint32(0x33333333)) + ((w >> jnp.uint32(2)) & jnp.uint32(0x33333333))
    w = (w + (w >> jnp.uint32(4))) & jnp.uint32(0x0F0F0F0F)
    return (w * jnp.uint32(0x01010101)) >> jnp.uint32(24)


def _kth_set_bits_packed(words_u: jnp.ndarray, k: int, width: int, fill: int):
    """Flat [R*width] column indices of the first k set bits of a packed
    [R, W]-word MSB-first bit matrix (pad bits must be zero), plus the total
    count. Word-level cumsum + searchsorted finds each query's word; a
    5-step binary select finds its column inside the word — never touching
    the unpacked 21M-element mask (extracting runs at pixel granularity
    fused into the detect program measured a 289 s XLA compile and +1.2 s
    runtime; this packed form compiles in seconds and runs in ms)."""
    r, w_words = words_u.shape
    pc = _popcount32(words_u).reshape(-1).astype(jnp.int32)  # [R*W]
    cum = jnp.cumsum(pc)
    n = cum[-1]
    q = jnp.arange(1, k + 1, dtype=jnp.int32)
    wi = jnp.searchsorted(cum, q).astype(jnp.int32)  # word holding each query
    wi_c = jnp.minimum(wi, r * w_words - 1)
    prev = jnp.take(cum, wi_c) - jnp.take(pc, wi_c)
    rank = q - 1 - prev  # 0-based set-bit rank inside the word
    wv = jnp.take(words_u.reshape(-1), wi_c)
    # binary select: largest m with popcount(top m bits) <= rank -> column m
    m = jnp.zeros_like(rank)
    for step in (16, 8, 4, 2, 1):
        mid = m + step
        cnt = (_popcount32(wv >> (jnp.uint32(32) - mid.astype(jnp.uint32)))).astype(
            jnp.int32
        )
        m = jnp.where(cnt <= rank, mid, m)
    row = wi_c // w_words
    col = (wi_c % w_words) * 32 + m
    idx = row * width + col
    return jnp.where(q <= n, idx, jnp.int32(fill)), n


@partial(jax.jit, static_argnames=("width", "max_runs"))
def _runs_from_packed_program(packed: jnp.ndarray, *, width: int, max_runs: int):
    """[..., R, W]-word packed masks -> horizontal runs as flat row-major
    indices of each run's first and LAST on-pixel (the layout
    ccl_stats_runs / connected_components_with_stats_runs consume), plus
    run counts. Runs beyond `max_runs` are truncated — callers fall back to
    transferring the packed mask for those recordings.

    A separate program from the detect mask on purpose: fusing bit-level
    run extraction into the STFT/morphology program sent the XLA compile
    from ~30 s to 289 s (measured)."""

    def one(words):
        u = jax.lax.bitcast_convert_type(words, jnp.uint32)
        r, w_words = u.shape
        right = jnp.pad(u[:, 1:], ((0, 0), (0, 1)))
        next_bit = (u << jnp.uint32(1)) | (right >> jnp.uint32(31))
        fill = r * width
        starts, n = _kth_set_bits_packed(_run_start_bits(u), max_runs, width, fill)
        lasts, _ = _kth_set_bits_packed(u & ~next_bit, max_runs, width, fill)
        return starts, lasts, n

    for _ in range(packed.ndim - 2):
        one = jax.vmap(one)
    return one(packed)


def _pack_bits(m: jnp.ndarray) -> jnp.ndarray:
    """Pack a binary [R, C] mask into int32 words [R, ceil(C/32)], MSB-first.

    Shipping the raw float mask (~84 MB per 60 s recording) over the tunnel
    costs seconds; packed it is ~2.6 MB — and int32 transfers measure ~2x
    faster than the same bytes as uint8 on this backend. Disjoint-bit sums
    equal OR, so integer shifts+sum assemble the words exactly (the sign bit
    included: jnp's int32 left-shift wraps to the right bit pattern)."""
    r, c = m.shape
    c32 = -(-c // 32) * 32
    mp = jnp.pad(m, ((0, 0), (0, c32 - c))).astype(jnp.int32)
    mp = mp.reshape(r, c32 // 32, 32)
    shifts = jnp.asarray(31 - np.arange(32), jnp.int32)
    return jnp.sum(jnp.left_shift(mp, shifts), axis=-1, dtype=jnp.int32)


def signal_noise(frames, sr, hop_length=281, n_valid_samples=None, n_fft=4096):
    """Detect signal boxes (reference: src/identify_tracks.py:650-706).

    `frames` may be zero-padded beyond `n_valid_samples` to hit a compile
    bucket; results match running the reference on frames[:n_valid_samples].
    Returns a list of Signal.
    """
    frames = jnp.asarray(frames, dtype=jnp.float32)
    if n_valid_samples is None:
        n_valid_samples = frames.shape[0]
    packed = _signal_mask_program(
        frames, jnp.int32(n_valid_samples), sr=sr, hop_length=hop_length, n_fft=n_fft
    )
    n_frames_total = num_frames(frames.shape[0], hop_length, n_fft)
    stats = _stats_adaptive(packed, n_frames_total)
    return _signals_from_stats(stats, sr, hop_length, n_fft)


def _stats_adaptive(packed, width):
    """Component stats for a single [R, W] packed mask: count the runs
    first (cheap reduction), then run the smallest compiled run-extraction
    program that fits; empty masks and over-budget masks skip it."""
    n = int(np.asarray(_run_count_program(packed)[0]))
    if n == 0:
        return np.zeros((0, 5), np.int64)
    if n > max_runs():
        return connected_components_with_stats_packed(np.asarray(packed), width)
    runs_s, runs_e, _ = _runs_from_packed_program(
        packed, width=width, max_runs=_runs_bucket(n)
    )
    from audio_analysis_tpu.ops.components import (
        connected_components_with_stats_runs,
    )

    return connected_components_with_stats_runs(
        np.asarray(runs_s), np.asarray(runs_e), n, packed.shape[-2], width
    )


def _endscan_decision(n_valid, mx, mn, *, sr, hop_length):
    """End-scan decision from per-chunk flatness (max, min): (found int32,
    flat_sec int32, mask_valid samples). mask_valid is the end-scan's
    detected data end, exactly like the host two-step (classify truncates
    to get_end's length, reference src/identify_tracks.py:419-420)."""
    chunk = sr // hop_length
    n_frames_valid = 1 + n_valid // hop_length
    k = jnp.arange(mx.shape[0])
    checkable = (k + 1) * chunk < n_frames_valid
    flat = (mx == mn) & checkable
    found = jnp.any(flat)
    first = jnp.argmax(flat)  # first True (0 if none, guarded by `found`)
    flat_sec = (first * chunk * hop_length) // sr
    mask_valid = jnp.where(found, jnp.int32(sr) * flat_sec, n_valid)
    return found.astype(jnp.int32), flat_sec.astype(jnp.int32), mask_valid


def _mag_level(pallas_level, n_fft, hop_length) -> int:
    """Exact level for the in-program Pallas magnitude STFT (0 = XLA FFT).

    The mask's median thresholds consume raw bin magnitudes, so only the
    split-bf16 exact contract is eligible: at ANY enabled pallas level the
    mag kernel runs exact2 (3-way split; max rel 1.7e-5 in interpret,
    f32-grade on chip), never the bf16 fast contract — an AAT_FAST user
    still gets reference-stable detection boxes."""
    if not pallas_level:
        return 0
    from audio_analysis_tpu.ops.pallas.melspec import mag_geometry

    return 2 if mag_geometry(int(n_fft), int(hop_length)) else 0


@partial(
    jax.jit,
    static_argnames=("sr", "hop_length", "n_fft", "pallas_level", "interpret"),
)
def _fused_detect_batch_program(
    frames, n_valid, *, sr, hop_length, n_fft, pallas_level=0, interpret=False
):
    """Batch-of-recordings detection: batch-wide end-scan flatness (the
    Pallas kernel at `pallas_level` > 0, XLA FFT at 0), the end-scan
    decision, then the signal-mask pipeline over [B, T] recordings; one
    dispatch for the whole batch. At pallas_level > 0 the mask's |STFT|
    also runs batch-wide through the split-bf16 Pallas kernel (the XLA
    FFT path materialises the 6.4x-amplified frame matrix in HBM — the
    largest leg of this program at ~78 ms of 170 ms on an 8x60s batch).
    `frames` may be int16 PCM (uploads at half the bytes over the tunnel);
    conversion to float32/32768 on device is bit-identical to the
    reference's 16-bit decode path."""
    framesf = _to_float(frames)
    mx, mn = _batch_chunk_flatness(
        framesf, sr=sr, hop_length=hop_length, level=pallas_level,
        interpret=interpret,
    )
    found, flat_sec, mask_valid = jax.vmap(
        lambda v, x, n: _endscan_decision(v, x, n, sr=sr, hop_length=hop_length)
    )(n_valid, mx, mn)

    mag = _mag_level(pallas_level, n_fft, hop_length)
    if mag:
        from audio_analysis_tpu.ops.pallas.medians import (
            pallas_masked_medians_rowcol,
        )
        from audio_analysis_tpu.ops.pallas.melspec import pallas_stft_magnitude

        idx = jnp.arange(framesf.shape[1])
        fz = jnp.where(idx[None, :] < mask_valid[:, None], framesf, 0.0)
        kw = {"interpret": True} if interpret else {}
        spec = pallas_stft_magnitude(
            fz, n_fft=n_fft, hop_length=hop_length, exact=mag, **kw
        )
        # batch-level a_max normalisation + the fused-rank-search medians
        # kernel (bit-identical to _masked_medians_rowcol), then the shared
        # threshold+morphology tail per recording
        nvf = 1 + mask_valid // hop_length  # [B]
        col_valid = jnp.arange(spec.shape[-1])[None, :] < nvf[:, None]
        a_max = jnp.max(
            jnp.where(col_valid[:, None, :], spec, 0.0),
            axis=(1, 2), keepdims=True,
        )
        spec_n = spec / a_max
        row_m, col_m = pallas_masked_medians_rowcol(spec_n, nvf, **kw)
        packed = jax.vmap(
            lambda s, r, c, v: _mask_threshold_morph(
                s, r, c, v, sr=sr, hop_length=hop_length, n_fft=n_fft
            )
        )(spec_n, row_m, col_m, col_valid)
    else:
        packed = jax.vmap(
            lambda f, v: _signal_mask(
                f, v, sr=sr, hop_length=hop_length, n_fft=n_fft
            )
        )(framesf, mask_valid)
    return found, flat_sec, packed


def detect_batch_dispatch(frames_batch, n_valid, sr, hop_length=281, n_fft=4096):
    """Queue the batched detection program; returns a handle of device
    arrays without forcing a transfer (dispatch is async — the device works
    while the host does something else)."""
    import os

    frames_batch = jnp.asarray(frames_batch)
    if frames_batch.dtype != jnp.int16:
        frames_batch = frames_batch.astype(jnp.float32)
    n_valid = jnp.asarray(n_valid, dtype=jnp.int32)
    found, flat_sec, packed = _fused_detect_batch_program(
        frames_batch, n_valid, sr=sr, hop_length=hop_length, n_fft=n_fft,
        pallas_level=_flatness_level(sr, hop_length),
    )
    # second (tiny) dispatch: count each mask's runs on device; async, so
    # it pipelines behind the big program. Sizing the run extraction to the
    # observed counts instead would cost a blocking scalar read here
    # (k=16384 unconditionally measured 61 ms/batch; counting + a
    # right-sized program is ~4x cheaper on typical masks).
    counts, n_max = _run_count_program(packed)
    # SPECULATIVE run extraction, dispatched HERE — not at finish time —
    # so in pipelined use (dispatch k+1 before finish k, the serving loop's
    # shape) it queues directly behind this batch's programs instead of
    # behind the NEXT batch's detect program. The guess is a deterministic
    # constant, so multi-host processes still dispatch identical programs
    # collectively; finish() re-dispatches at the right bucket if a mask
    # overflows the guess (rare — typical 60 s recordings count ~2-3k runs).
    budget = max_runs()
    guess = _runs_bucket(
        min(int(os.environ.get("AAT_RUNS_GUESS", "4096")), budget)
    )
    width = num_frames(frames_batch.shape[-1], hop_length, n_fft)
    runs_s, runs_e, _ = _runs_from_packed_program(
        packed, width=width, max_runs=guess
    )
    return (
        found, flat_sec, packed, counts, n_max, runs_s, runs_e, guess,
        n_valid, frames_batch.shape, sr, hop_length, n_fft,
    )


def detect_batch_finish(handle):
    """Transfer + per-recording CCL (host threads; the C++ op releases the
    GIL via ctypes). Returns [(length_seconds, signals), ...].

    Only the compact run lists cross the wire (~128 KB/recording budget);
    the packed mask is fetched per recording only if its runs overflowed."""
    from concurrent.futures import ThreadPoolExecutor

    from audio_analysis_tpu.ops.components import (
        connected_components_with_stats_runs,
    )
    from audio_analysis_tpu.parallel.distributed import local_slice

    (found, flat_sec, packed, counts, n_max, runs_s, runs_e, guess,
     n_valid, shape, sr, hop_length, n_fft) = handle
    budget = max_runs()
    width = num_frames(shape[-1], hop_length, n_fft)
    # The speculative run extraction was already dispatched (at `guess`)
    # by detect_batch_dispatch — waiting for n_max before dispatching it
    # serialised the whole finish path (measured: that sync plus
    # one-at-a-time transfers were ~140 ms of the 250 ms detect stage on
    # the tunnel-attached chip), and dispatching it here queued it behind
    # the NEXT batch's detect program under pipelined use.
    # overlap the device->host copies: start every transfer before blocking
    # on any (np.asarray alone serialises the round trips); multi-host
    # arrays go through local_slice's shard path instead
    if getattr(found, "is_fully_addressable", True):
        for a in (found, flat_sec, counts, n_max, runs_s, runs_e):
            try:
                a.copy_to_host_async()
            except (AttributeError, RuntimeError):
                pass
    # n_max is a replicated scalar: every process reads the same value, so
    # any re-dispatch below runs the SAME program collectively under
    # multi-host (a per-process local max would hang the mesh)
    n_max = int(np.asarray(n_max))
    need = _runs_bucket(min(n_max, budget))
    if n_max > 0 and need > guess:
        runs_s, runs_e, _ = _runs_from_packed_program(
            packed, width=width, max_runs=need
        )
    # local_slice == np.asarray for single-process arrays; under multi-host
    # each process transfers and post-processes ONLY its own recordings
    found = local_slice(found)
    flat_sec = local_slice(flat_sec)
    n_runs = local_slice(counts)
    if 0 < n_max:
        runs_s = local_slice(runs_s)
        runs_e = local_slice(runs_e)
    n_valid_np = local_slice(n_valid)
    n_frames_total = width
    n_bins = packed.shape[-2]
    B = found.shape[0]
    if B == 0:
        return []
    # rare path: any recording whose runs overflowed needs its packed mask
    packed_np = local_slice(packed) if n_max > budget else None

    def one(b):
        nb = int(n_runs[b])
        if nb == 0:
            stats = np.zeros((0, 5), np.int64)
        elif nb <= budget:
            stats = connected_components_with_stats_runs(
                runs_s[b], runs_e[b], nb, n_bins, n_frames_total
            )
        else:
            stats = connected_components_with_stats_packed(
                packed_np[b], n_frames_total
            )
        return _signals_from_stats(stats, sr, hop_length, n_fft)

    with ThreadPoolExecutor(max_workers=min(8, B)) as ex:
        all_signals = list(ex.map(one, range(B)))
    out = []
    for b in range(B):
        length = int(flat_sec[b]) if found[b] else float(n_valid_np[b]) / sr
        out.append((length, all_signals[b]))
    return out


def detect_batch(frames_batch, n_valid, sr, hop_length=281, n_fft=4096):
    """[(length_seconds, signals), ...] for a [B, T] stack of recordings in
    one device round trip. Accepts int16 PCM (half the upload bytes;
    converted on device)."""
    return detect_batch_finish(
        detect_batch_dispatch(frames_batch, n_valid, sr, hop_length, n_fft)
    )


def _chunk_flatness(frames, *, sr, hop_length):
    """Per-chunk (max, min) of the 120-mel power-1 spectrogram
    (reference: src/identify_tracks.py:387-413)."""
    n_fft = sr // 10
    spec = stft_magnitude(frames, n_fft, hop_length)
    mel = mel_spec(spec, sr, n_fft, 120, 50, 11000, 1750, power=1)
    chunk = sr // hop_length
    n_chunks = mel.shape[1] // chunk
    if n_chunks == 0:
        # recording shorter than one chunk: the reference's walk never runs
        # (while end < n_frames); emit one never-"checkable" sentinel chunk
        # (mx != mn so it can't read as flat either)
        return jnp.zeros(1, mel.dtype), jnp.ones(1, mel.dtype)
    usable = mel[:, : n_chunks * chunk].reshape(mel.shape[0], n_chunks, chunk)
    return jnp.max(usable, axis=(0, 2)), jnp.min(usable, axis=(0, 2))


_chunk_flatness_program = partial(jax.jit, static_argnames=("sr", "hop_length"))(
    _chunk_flatness
)


def _flatness_geom(sr: int, hop_length: int) -> dict:
    """Static geometry of the Pallas end-scan path: windows of S samples,
    one per 1-s chunk, hop-aligned so kernel frame m+i of window w IS global
    STFT frame w*chunk+i (same centre-pad/constant conventions)."""
    n_fft = sr // 10
    chunk = sr // hop_length  # frames per ~1 s chunk (reference :403)
    m = -(-(n_fft // 2) // hop_length)  # hop-aligned left margin, frames
    s = (m + chunk - 1) * hop_length + n_fft // 2
    return dict(n_fft=n_fft, chunk=chunk, m=m, s=s, f_kernel=1 + s // hop_length)


def _flatness_level(sr: int, hop_length: int) -> int:
    """Frontend kernel level for the end-scan mel (0 = XLA FFT).

    Follows the classify frontend's AAT_PALLAS/AAT_FAST resolution (so an
    explicit AAT_PALLAS=0 pins the XLA program everywhere), additionally
    requiring the framed-DIF-eligible end-scan geometry. The end-scan only
    consumes max==min per chunk, a decision every faithful implementation
    agrees on (digital silence is exactly zero through any of these paths,
    real content is never chunk-constant), so kernel numerics never change
    the detected length — while skipping the Bluestein FFT that the
    non-power-of-two n_fft=sr//10 forces on XLA (measured ~270 ms of the
    419 ms fused detect batch)."""
    from audio_analysis_tpu.pipeline.frontend import _use_pallas_default

    level = _use_pallas_default()
    if not level:
        return 0
    from audio_analysis_tpu.ops.pallas.melspec import MAX_FRAMES_PER_WINDOW, _use_dif

    g = _flatness_geom(sr, hop_length)
    if not _use_dif(g["n_fft"]) or g["f_kernel"] > MAX_FRAMES_PER_WINDOW:
        return 0
    return int(level)


def _batch_chunk_flatness(framesf, *, sr, hop_length, level, interpret=False):
    """[B, T] float PCM -> per-chunk (max, min) [B, C] of the 120-mel
    power-1 end-scan spectrogram (reference src/identify_tracks.py:387-413).

    level 0 is the XLA reference path (vmapped `_chunk_flatness`). level>0
    computes the same frames with the Pallas DFT->mel kernel over
    hop-aligned overlapping windows — window w supplies kernel frames
    [m, m+chunk) which cover exactly the PCM spans of global frames
    [w*chunk, (w+1)*chunk), including the global centre pad (the lead zeros)
    — so the chunk (max, min) ranges over the same (bin, frame) set, modulo
    kernel rounding, which the max==min decision is insensitive to."""
    if level == 0:
        return jax.vmap(
            lambda f: _chunk_flatness(f, sr=sr, hop_length=hop_length)
        )(framesf)
    g = _flatness_geom(sr, hop_length)
    b, t = framesf.shape
    n_chunks = (1 + t // hop_length) // g["chunk"]
    if n_chunks == 0:
        # shorter than one chunk: never-"checkable" sentinel (mx != mn), as
        # in _chunk_flatness
        return (
            jnp.zeros((b, 1), framesf.dtype),
            jnp.ones((b, 1), framesf.dtype),
        )
    from audio_analysis_tpu.ops.pallas.melspec import (
        gather_slabs,
        pallas_mel_spectrogram,
    )

    win = gather_slabs(
        framesf, hop_length=hop_length, n_windows=n_chunks,
        c=g["chunk"], m=g["m"], s=g["s"],
    )

    # interpret is only FORCED when true: tests monkeypatch the kernel entry
    # with partial(..., interpret=True), which an explicit False would
    # override (partial keywords lose to call-site keywords)
    kw = {"interpret": True} if interpret else {}
    # exact follows the frontend level, capped at 1 (2-way split): the
    # end-scan only consumes the DECISION flat = (max==min over every
    # (mel bin, frame) cell of the chunk), and that decision is
    # representation-independent. A flat chunk requires ALL cells equal,
    # which for real signals means an all-zero chunk — nonzero input puts
    # unequal energy in different mel bins, so even bf16 z storage
    # collapsing 1-LSB-distinct frames (0.500031/0.499969 both round to
    # bf16 0.5) leaves bin-to-bin variation and the chunk still reads
    # non-flat; and bf16 never flushes an int16 LSB (3.05e-5 vs min
    # normal ~1e-38), so all-zero stays all-zero and zero-dither stays
    # nonzero. Decision parity at exact=0 is pinned by
    # tests/test_detect.py::test_fast_endscan_keeps_lsb_dither_nonflat and
    # the adversarial fixture sweep in the r3 review (silence, +-1-LSB
    # dither around 0 and DC, loud constant, hop-periodic tone — all
    # decisions identical to the f32 XLA path). Unlike _mag_level, which
    # pins exact because magnitudes feed thresholds, only equality matters
    # here — so the fast frontend keeps the cheap bf16 z (half the HBM
    # traffic). exact=2's third split is pure cost either way (measured:
    # the end-scan is ~42 ms of the fused detect batch at exact=2).
    # in-kernel margin slice: keep = chunk rounded to a sublane multiple
    # (the kernel's output block), so the margin frames never touch the MXU;
    # falls back to the full frame range when the rounding wouldn't fit
    from audio_analysis_tpu.ops.pallas.melspec import z_layout_shapes

    fp = z_layout_shapes(g["n_fft"], hop_length, g["s"])[1]
    keep = -(-g["chunk"] // 8) * 8
    if g["m"] + keep > fp:
        keep = None
    mel = pallas_mel_spectrogram(
        win,
        sr=sr, n_fft=g["n_fft"], hop_length=hop_length, n_mels=120,
        fmin=50.0, fmax=11000.0, break_freq=1750.0, power=1.0, htk=True,
        exact=min(1, max(0, int(level) - 1)),
        frame0=0 if keep is None else g["m"], frames=keep, **kw,
    )  # [B*C, 120, keep or f_kernel]
    used = (
        mel[:, :, : g["chunk"]]
        if keep is not None
        else mel[:, :, g["m"] : g["m"] + g["chunk"]]
    )
    mx = jnp.max(used, axis=(1, 2)).reshape(b, n_chunks)
    mn = jnp.min(used, axis=(1, 2)).reshape(b, n_chunks)
    return mx, mn


_flatness_batch_program = partial(
    jax.jit, static_argnames=("sr", "hop_length", "level")
)(_batch_chunk_flatness)


def detect(frames, sr, n_valid_samples=None, hop_length=281, n_fft=4096):
    """(length_seconds, signals) with one device round trip.

    Equivalent to the reference sequence length = get_end(...);
    signals = signal_noise(frames[:int(sr*length)]).
    """
    frames = jnp.asarray(frames)
    if frames.dtype != jnp.int16:  # int16 uploads half the bytes;
        frames = frames.astype(jnp.float32)  # program converts on device
    if n_valid_samples is None:
        n_valid_samples = frames.shape[0]
    found, flat_sec, packed = (
        a[0]
        for a in _fused_detect_batch_program(
            frames[None],
            jnp.asarray([n_valid_samples], jnp.int32),
            sr=sr, hop_length=hop_length, n_fft=n_fft,
            pallas_level=_flatness_level(sr, hop_length),
        )
    )
    n_frames_total = num_frames(frames.shape[0], hop_length, n_fft)
    found = bool(np.asarray(found))
    length = int(np.asarray(flat_sec)) if found else n_valid_samples / sr
    stats = _stats_adaptive(packed, n_frames_total)
    return length, _signals_from_stats(stats, sr, hop_length, n_fft)


def _signals_from_stats(stats, sr, hop_length, n_fft):
    stats = sorted(stats.tolist(), key=lambda stat: stat[0])
    width = int(SIGNAL_WIDTH * sr / hop_length)
    freqs = fft_frequencies(sr, n_fft)
    height = 0
    for i, f in enumerate(freqs):
        if f > 100:
            height = i + 1
            break
    min_width = 0.65 * width
    min_height = height - height // 10
    stats = [s for s in stats if s[2] > min_width and s[3] > min_height]
    signals = []
    for s in stats:
        max_freq = min(len(freqs) - 1, s[1] + s[3])
        freq_range = (freqs[s[1]], freqs[max_freq])
        start = s[0] * hop_length / sr
        end = (s[0] + s[2]) * hop_length / sr
        signals.append(Signal(start, end, freq_range[0], freq_range[1]))
    return signals


def get_end(frames, sr, n_valid_samples=None, hop_length=281):
    """Scan ~1 s mel chunks until a flat (max==min) chunk marks end of data;
    returns seconds (int via floor-div like the reference, or the float file
    length when no flat chunk is found)."""
    frames = jnp.asarray(frames, dtype=jnp.float32)
    if n_valid_samples is None:
        n_valid_samples = frames.shape[0]
    mx, mn = _flatness_batch_program(
        frames[None], sr=sr, hop_length=hop_length,
        level=_flatness_level(sr, hop_length),
    )
    mx, mn = np.asarray(mx[0]), np.asarray(mn[0])

    chunk = sr // hop_length
    n_frames_valid = num_frames(int(n_valid_samples), hop_length, sr // 10)
    file_length = n_valid_samples / sr
    start = 0
    k = 0
    # reference loop: while end < mel.shape[1], i.e. chunk fully inside
    while (k + 1) * chunk < n_frames_valid and k < len(mx):
        if mx[k] == mn[k]:
            return start * hop_length // sr
        k += 1
        start = k * chunk
    return file_length
