"""Detection parity: device signal_noise vs a numpy/cv2 oracle transcribed
from the reference (src/identify_tracks.py:650-706), merge-rule unit cases,
and the padded-bucket invariance property of the static-shape programs."""

import numpy as np
import pytest
import scipy.signal

cv2 = pytest.importorskip("cv2")

from audio_analysis_tpu.detect import (
    Signal,
    signal_noise,
    get_end,
    merge_signals,
    get_tracks_from_signals,
    segment_overlap,
    mel_freq,
)


SR = 48000


def _ref_stft_mag(y, n_fft, hop):
    w = scipy.signal.get_window("hann", n_fft, fftbins=True)
    ypad = np.pad(y, n_fft // 2)
    n_frames = 1 + (len(ypad) - n_fft) // hop
    frames = np.stack([ypad[i * hop : i * hop + n_fft] for i in range(n_frames)])
    return np.abs(np.fft.rfft(frames * w, axis=-1)).T.astype(np.float32)


def _oracle_signal_noise(frames, sr, hop_length=281):
    """Transcription of reference signal_noise (numpy + cv2)."""
    n_fft = 4096
    spectogram = _ref_stft_mag(frames, n_fft, hop_length)
    a_max = np.amax(spectogram)
    spectogram = spectogram / a_max
    row_medians = np.median(spectogram, axis=1)[:, None]
    column_medians = np.median(spectogram, axis=0)[None, :]
    signal = (spectogram > 3 * column_medians) & (spectogram > 3 * row_medians)
    signal = signal.astype(np.uint8)
    signal = cv2.morphologyEx(signal, cv2.MORPH_OPEN, np.ones((4, 4), np.uint8))
    width = int(0.25 * sr / hop_length)
    freqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    height = 0
    for i, f in enumerate(freqs):
        if f > 100:
            height = i + 1
            break
    signal = cv2.dilate(signal, np.ones((height, width), np.uint8))
    signal = cv2.erode(signal, np.ones((height // 10, width), np.uint8))
    _, _, stats, _ = cv2.connectedComponentsWithStats(signal)
    stats = stats[1:]
    stats = sorted(stats, key=lambda s: s[0])
    min_width = 0.65 * width
    min_height = height - height // 10
    stats = [s for s in stats if s[2] > min_width and s[3] > min_height]
    out = []
    for s in stats:
        max_freq = min(len(freqs) - 1, s[1] + s[3])
        out.append(
            (
                s[0] * 281 / sr,
                (s[0] + s[2]) * 281 / sr,
                freqs[s[1]],
                freqs[max_freq],
            )
        )
    return out


def _chirpy_recording(seconds=6, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(int(seconds * SR)) / SR
    y = 0.005 * rng.randn(len(t)).astype(np.float32)
    # a few tone bursts ("chirps") at different freqs/times
    for f0, t0, dur in [(3000, 0.5, 0.4), (2500, 2.0, 0.6), (6000, 4.0, 0.5)]:
        m = (t >= t0) & (t < t0 + dur)
        y[m] += (0.4 * np.sin(2 * np.pi * f0 * t[m])).astype(np.float32)
    return y


def test_signal_noise_matches_oracle():
    y = _chirpy_recording()
    got = signal_noise(y, SR)
    ref = _oracle_signal_noise(y, SR)
    assert len(got) == len(ref) and len(ref) > 0
    for g, r in zip(got, ref):
        np.testing.assert_allclose(
            [g.start, g.end, g.freq_start, g.freq_end], r, rtol=1e-6
        )


def test_signal_noise_padded_bucket_invariance():
    """Zero-padding to a bucket + n_valid must not change detections."""
    y = _chirpy_recording(seconds=5.3, seed=1)
    base = signal_noise(y, SR)
    ypad = np.pad(y, (0, int(1.7 * SR)))
    padded = signal_noise(ypad, SR, n_valid_samples=len(y))
    assert len(base) == len(padded)
    for a, b in zip(base, padded):
        np.testing.assert_allclose(
            [a.start, a.end, a.freq_start, a.freq_end],
            [b.start, b.end, b.freq_start, b.freq_end],
            rtol=1e-5,
        )
    # and parity with the truncating oracle
    ref = _oracle_signal_noise(y, SR)
    assert len(padded) == len(ref)


def test_masked_median_fast_exact(rng):
    """Rank-selection median equals np.median exactly (odd/even valid counts,
    +inf padding, both axes)."""
    import jax.numpy as jnp
    from audio_analysis_tpu.detect.signal_noise import _masked_median_fast

    for n_valid, total in [(101, 128), (100, 128), (7, 7), (2049, 2049)]:
        x = np.abs(rng.randn(19, total)).astype(np.float32)
        x[:, n_valid:] = np.inf
        got = np.asarray(_masked_median_fast(jnp.asarray(x), n_valid, axis=1))
        ref = np.median(x[:, :n_valid], axis=1, keepdims=True)
        np.testing.assert_array_equal(got, ref)
    x = np.abs(rng.randn(257, 57)).astype(np.float32)
    got = np.asarray(_masked_median_fast(jnp.asarray(x), 257, axis=0))
    np.testing.assert_array_equal(got, np.median(x, axis=0, keepdims=True))


def test_masked_medians_rowcol_exact(rng):
    """The fused row+col rank search equals np.median exactly on both axes
    (odd/even valid column counts, invalid columns excluded from rows but
    included in column positions, zeros and ties present)."""
    import jax.numpy as jnp

    from audio_analysis_tpu.detect.signal_noise import _masked_medians_rowcol

    for nvf, total, bins in [(101, 128, 19), (100, 128, 20), (7, 7, 5), (1, 9, 3)]:
        x = np.abs(rng.randn(bins, total)).astype(np.float32)
        x[:, : max(1, nvf // 3)] = 0.0  # ties and zeros
        col_valid = jnp.arange(total) < nvf
        row, col = _masked_medians_rowcol(jnp.asarray(x), col_valid, nvf, bins)
        ref_row = np.median(x[:, :nvf], axis=1, keepdims=True)
        np.testing.assert_array_equal(np.asarray(row), ref_row)
        ref_col = np.median(x, axis=0, keepdims=True)
        np.testing.assert_array_equal(np.asarray(col), ref_col)


def test_get_end_detects_flat_tail():
    y = _chirpy_recording(seconds=4)
    full = np.concatenate([y, np.zeros(4 * SR, np.float32)])
    end = get_end(full, SR)
    # flat region begins at 4 s (plus window spill); reference returns
    # int seconds via floor division
    assert end in (4, 5)


def test_get_end_no_flat():
    rng = np.random.RandomState(3)
    y = 0.1 * rng.randn(3 * SR).astype(np.float32)
    assert get_end(y, SR) == pytest.approx(3.0)


@pytest.mark.parametrize("level", [1, 3])
def test_batch_chunk_flatness_pallas_matches_xla(level):
    """The Pallas end-scan path (interpret mode on CPU) gives the XLA
    path's flat/nonflat decisions exactly — silence chunks are exactly zero
    through the kernel too — and close per-chunk values."""
    import jax.numpy as jnp

    from audio_analysis_tpu.detect.signal_noise import _batch_chunk_flatness

    hop = 281
    rng = np.random.RandomState(0)
    y = np.zeros((2, 5 * SR), np.float32)
    t = np.arange(3 * SR) / SR
    y[0, : 3 * SR] = (
        0.05 * rng.randn(3 * SR) + 0.3 * np.sin(2 * np.pi * 3000 * t)
    ).astype(np.float32)
    y[1] = 0.05 * rng.randn(5 * SR).astype(np.float32)  # no silence tail
    fx = jnp.asarray(y)
    mx0, mn0 = _batch_chunk_flatness(fx, sr=SR, hop_length=hop, level=0)
    mx, mn = _batch_chunk_flatness(
        fx, sr=SR, hop_length=hop, level=level, interpret=True
    )
    assert mx.shape == mx0.shape
    flat0 = np.asarray(mx0 == mn0)
    flat = np.asarray(mx == mn)
    np.testing.assert_array_equal(flat, flat0)
    assert flat0[0].any() and not flat0[1].any()
    # non-flat chunk values agree to kernel tolerance (bf16 level 1 is the
    # loosest); flat chunks are exactly zero on both paths
    rtol = 0.05 if level == 1 else 1e-4
    np.testing.assert_allclose(
        np.asarray(mx)[~flat], np.asarray(mx0)[~flat0], rtol=rtol
    )
    assert np.all(np.asarray(mx)[flat] == 0.0)


def test_fast_endscan_keeps_lsb_dither_nonflat():
    """Level-1 (AAT_FAST bf16 frontend, exact=0 bf16 z storage) end-scan
    must give the f32 path's flat decisions on near-constant PCM: a DC
    offset at int16 16384 with random ±1-LSB dither maps to
    0.500031/0.499969, which BOTH round to bf16 0.5 — the frames collapse
    to one constant in the z layout. The decision still matches because
    flatness spans every (mel bin, frame) cell: nonzero input puts unequal
    energy in different bins, so a collapsed-but-nonzero chunk can never
    read max==min (only all-zero chunks are flat, and bf16 never flushes
    an int16 LSB to zero). Adversarial fixture for the bf16 z numerics
    contract in _batch_chunk_flatness."""
    import jax.numpy as jnp

    from audio_analysis_tpu.detect.signal_noise import _batch_chunk_flatness

    hop = 281
    rng = np.random.RandomState(7)
    pcm = 16384 + rng.randint(-1, 2, size=(1, 3 * SR))
    fx = jnp.asarray(pcm.astype(np.float32) / 32768.0)
    mx0, mn0 = _batch_chunk_flatness(fx, sr=SR, hop_length=hop, level=0)
    mx1, mn1 = _batch_chunk_flatness(
        fx, sr=SR, hop_length=hop, level=1, interpret=True
    )
    flat0 = np.asarray(mx0 == mn0)
    assert not flat0.any()  # f32 reference: dither keeps every chunk distinct
    np.testing.assert_array_equal(np.asarray(mx1 == mn1), flat0)


# ---------------------------------------------------------------------------
# merge rules (hand-crafted cases, expectations derived from the rules)
# ---------------------------------------------------------------------------


def test_segment_overlap():
    assert segment_overlap((0, 2), (1, 3)) == 1
    assert segment_overlap((0, 1), (2, 3)) == -1  # gap -> negative


def test_mel_freq_uses_break_700():
    assert mel_freq(700.0) == pytest.approx(2595.0 * np.log10(2.0))


def test_merge_contained_signal():
    # u fully inside s's time with similar freq -> merged
    s = Signal(0.0, 2.0, 2000, 4000)
    u = Signal(0.5, 1.0, 2100, 3900)
    merged, did = merge_signals([s, u])
    assert did and len(merged) == 1
    m = merged[0]
    assert m.start == 0.0 and m.end == 2.0
    assert m.freq_start == 2000 and m.freq_end == 4000


def test_no_merge_across_1500mel_split():
    # one below 1500 mel-end, one above -> in_freq fails -> no merge
    lo = Signal(0.0, 1.0, 100, 300)  # mel_freq_end(300) ~ 434
    hi = Signal(0.2, 0.8, 3000, 5000)
    merged, did = merge_signals([lo, hi])
    assert not did and len(merged) == 2


def test_merge_nearby_same_band():
    # close in time (gap < 2s) with near-identical freq ranges
    a = Signal(0.0, 1.0, 3000, 4000)
    b = Signal(1.5, 2.5, 3050, 3950)
    merged, did = merge_signals([a, b])
    assert did and len(merged) == 1
    assert merged[0].start == 0.0 and merged[0].end == 2.5


def test_get_tracks_filters_short_and_enlarges():
    s1 = Signal(1.0, 1.2, 3000, 4000)  # 0.2s < 0.35 -> dropped
    s2 = Signal(5.0, 5.5, 6000, 7000)  # kept, enlarged to >= 0.7s
    tracks = get_tracks_from_signals([s1, s2], end=60.0)
    assert len(tracks) == 1
    t = tracks[0]
    assert t.length == pytest.approx(0.7)
    assert t.start == pytest.approx(5.25 - 0.35 + 0.35) or t.start < 5.0 + 1e-6
    # freq enlarged by 1.4 with int truncation
    assert t.freq_start == 5800 and t.freq_end == 7200


def test_get_tracks_min_mel_range_filter():
    s = Signal(0.0, 1.0, 5000, 5010)  # tiny freq range -> mel range < 50
    assert get_tracks_from_signals([s], end=10.0) == []


def test_pallas_stft_magnitude_matches_xla(rng):
    """The split-bf16 magnitude kernel (slab gather + leaf-permuted DIF +
    natural-order reassembly) matches the XLA STFT to f32 grade across slab
    boundaries — the integer-bit split keeps the residual parts real under
    interpret (XLA's simplifier cancels plain convert-pair residuals)."""
    import jax.numpy as jnp

    from audio_analysis_tpu.ops.pallas.melspec import (
        mag_geometry,
        pallas_stft_magnitude,
    )
    from audio_analysis_tpu.ops.stft import stft_magnitude

    n_fft, hop = 512, 160
    assert mag_geometry(n_fft, hop) is not None
    y = (rng.randn(2, 52000) * 0.3).astype(np.float32)  # several slabs
    ref = np.asarray(stft_magnitude(jnp.asarray(y), n_fft, hop))
    got = np.asarray(
        pallas_stft_magnitude(
            jnp.asarray(y), n_fft=n_fft, hop_length=hop, exact=2, interpret=True
        )
    )
    assert got.shape == ref.shape
    den = np.maximum(np.abs(ref), 1e-3 * np.abs(ref).max())
    assert (np.abs(got - ref) / den).max() < 5e-5


def test_pallas_stft_magnitude_nyquist_layout(rng):
    """At n_fft=4096 the mag kernel drops the Nyquist bin from the leaf
    matrices (bl 384 -> 256, a 33% matmul cut) and reconstitutes it with an
    in-kernel pairwise-folded alternating sum; the margin frames are sliced
    in-kernel (row0/keep). Both must stay f32-grade vs the XLA STFT across
    slab boundaries, Nyquist row included."""
    import jax.numpy as jnp

    from audio_analysis_tpu.ops.pallas.melspec import (
        _nyq_special,
        mag_geometry,
        pallas_stft_magnitude,
    )
    from audio_analysis_tpu.ops.stft import stft_magnitude

    n_fft, hop = 4096, 281
    assert _nyq_special(n_fft) and mag_geometry(n_fft, hop) is not None
    y = (rng.randn(1, 50000) * 0.3).astype(np.float32)
    ref = np.asarray(stft_magnitude(jnp.asarray(y), n_fft, hop))
    got = np.asarray(
        pallas_stft_magnitude(
            jnp.asarray(y), n_fft=n_fft, hop_length=hop, exact=2, interpret=True
        )
    )
    assert got.shape == ref.shape
    den = np.maximum(np.abs(ref), 1e-3 * np.abs(ref).max())
    rel = np.abs(got - ref) / den
    assert rel.max() < 2e-4
    assert rel[:, -1, :].max() < 2e-4  # the reconstituted Nyquist row


def test_dif_level_policy():
    """The level-adaptive tree deepens ONLY while another level shrinks the
    128-lane-padded leaf width — these choices are performance-load-bearing
    (measured on chip), so pin them."""
    from audio_analysis_tpu.ops.pallas.melspec import (
        _dif_levels,
        _leaf_off,
        _mag_layout,
    )

    assert _mag_layout(4096) == (2048, 4, True)  # mag kernel: 16x[256,128]
    assert _mag_layout(512) == (257, 3, False)  # small shapes keep the base
    assert _dif_levels(4800, 1101) == 4  # end-scan support: bl 256 -> 128
    assert _dif_levels(4096, 939) == 3  # classify support already fits L=3
    assert _leaf_off(3) == (0, 4, 2, 6, 1, 5, 3, 7)
    assert _leaf_off(4) == (0, 8, 4, 12, 2, 10, 6, 14, 1, 9, 5, 13, 3, 11, 7, 15)


def test_pallas_medians_kernel_matches_numpy_and_xla(rng):
    """The single-program rank-search medians kernel is exactly np.median on
    both axes (rows over the valid prefix, columns over all rows) and
    bit-identical to the XLA _masked_medians_rowcol — including odd/even
    valid counts, ragged tile edges, and duplicate values."""
    import importlib

    import jax.numpy as jnp

    sn = importlib.import_module("audio_analysis_tpu.detect.signal_noise")
    from audio_analysis_tpu.ops.pallas.medians import (
        pallas_masked_medians_rowcol,
    )

    bins, t = 37, 700  # odd rows, ragged last column tile
    spec = np.abs(rng.randn(3, bins, t)).astype(np.float32)
    spec[0, :, :50] = spec[0, :, 50:100]  # duplicates: tie handling
    nvfs = np.array([t, 257, 1], np.int32)

    row, col = pallas_masked_medians_rowcol(
        jnp.asarray(spec), jnp.asarray(nvfs), interpret=True
    )
    row, col = np.asarray(row), np.asarray(col)
    assert row.shape == (3, bins, 1) and col.shape == (3, 1, t)

    for b, nvf in enumerate(nvfs):
        np.testing.assert_array_equal(
            row[b, :, 0], np.median(spec[b, :, :nvf], axis=1)
        )
        # column medians are over all rows, every column (invalid columns
        # included — both implementations compute them from raw values)
        np.testing.assert_array_equal(col[b, 0], np.median(spec[b], axis=0))

        cv = jnp.arange(t) < int(nvf)
        s_inf = jnp.where(cv[None, :], jnp.asarray(spec[b]), jnp.inf)
        r_x, c_x = sn._masked_medians_rowcol(s_inf, cv, int(nvf), bins)
        np.testing.assert_array_equal(row[b], np.asarray(r_x))
        # XLA takes spec_inf, so ITS invalid-column medians are inf; the
        # kernel's are raw-valued — both unspecified, compare valid only
        np.testing.assert_array_equal(col[b, :, :nvf], np.asarray(c_x)[:, :nvf])


@pytest.mark.slow
def test_detect_program_mag_kernel_mask_parity():
    """The fused detect program with the Pallas magnitude STFT (exact2)
    produces the identical packed mask + end-scan outputs to the XLA FFT
    path on a chirpy fixture (production n_fft=4096 geometry, interpret
    mode)."""
    import importlib

    import jax.numpy as jnp

    sn = importlib.import_module("audio_analysis_tpu.detect.signal_noise")

    y = np.stack([
        _chirpy_recording(seconds=2.5, seed=4),
        np.concatenate([
            _chirpy_recording(seconds=1.5, seed=5),
            np.zeros(SR, np.float32),  # flat tail: end-scan truncates
        ]),
    ])
    nv = jnp.asarray(np.full(2, y.shape[1], np.int32))
    f0, s0, p0 = sn._fused_detect_batch_program(
        jnp.asarray(y), nv, sr=SR, hop_length=281, n_fft=4096, pallas_level=0
    )
    assert sn._mag_level(3, 4096, 281) == 2
    f1, s1, p1 = sn._fused_detect_batch_program(
        jnp.asarray(y), nv, sr=SR, hop_length=281, n_fft=4096,
        pallas_level=3, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))


def test_detect_batch_empty():
    import numpy as np
    from audio_analysis_tpu.detect.signal_noise import detect_batch

    out = detect_batch(np.zeros((0, 48000), np.int16), np.zeros(0, np.int32), 48000)
    assert out == []


def test_runs_bucket_tiers(monkeypatch):
    import importlib

    sn = importlib.import_module("audio_analysis_tpu.detect.signal_noise")

    assert sn._runs_bucket(1) == 256
    assert sn._runs_bucket(256) == 256
    assert sn._runs_bucket(257) == 1024
    assert sn._runs_bucket(5000) == 16384
    monkeypatch.setenv("AAT_MAX_RUNS", "600")
    assert sn._runs_bucket(5) == 256
    assert sn._runs_bucket(500) == 600  # capped to the budget, no 1024 tier


def test_run_count_program_counts_runs():
    import jax.numpy as jnp
    import importlib

    sn = importlib.import_module("audio_analysis_tpu.detect.signal_noise")

    m = np.zeros((2, 3, 70), bool)
    m[0, 0, 0:5] = True          # one run
    m[0, 1, 31:34] = True        # crosses the word boundary: still one run
    m[0, 2, [10, 12, 14]] = True  # three runs
    m[1, 0, 69] = True           # last column
    packed = jnp.stack([sn._pack_bits(jnp.asarray(r)) for r in m])
    counts, n_max = sn._run_count_program(packed)
    np.testing.assert_array_equal(np.asarray(counts), [5, 1])
    assert int(n_max) == 5


def test_detect_batch_zero_and_overflow(monkeypatch):
    """Silent recordings skip the run program entirely; adversarially dense
    masks overflow the budget and fall back to the packed-mask transfer,
    with identical signals either way."""
    from audio_analysis_tpu.detect.signal_noise import detect_batch

    y = np.stack([
        np.zeros(4 * SR, np.float32),
        _chirpy_recording(seconds=4, seed=2),
    ])
    nv = np.full(2, y.shape[1], np.int32)
    base = detect_batch(y, nv, SR)
    assert base[0][1] == []  # digital silence: no signals
    assert len(base[1][1]) > 0
    monkeypatch.setenv("AAT_MAX_RUNS", "1")  # force the overflow fallback
    over = detect_batch(y, nv, SR)
    assert over[0][1] == []
    assert [tuple(map(float, (s.start, s.end, s.freq_start, s.freq_end)))
            for s in over[1][1]] == [
        tuple(map(float, (s.start, s.end, s.freq_start, s.freq_end)))
        for s in base[1][1]
    ]


def test_detect_batch_speculative_guess_redispatch(monkeypatch):
    """The finish path dispatches run extraction at a speculative bucket
    before n_max is known; a mask that overflows the guess must re-dispatch
    at the right bucket and produce identical signals."""
    from audio_analysis_tpu.detect.signal_noise import detect_batch

    y = np.stack([
        _chirpy_recording(seconds=4, seed=2),
        _chirpy_recording(seconds=4, seed=3),
    ])
    nv = np.full(2, y.shape[1], np.int32)
    base = detect_batch(y, nv, SR)
    monkeypatch.setenv("AAT_RUNS_GUESS", "1")  # guess bucket 256, too small
    redo = detect_batch(y, nv, SR)
    for (lb, sb), (lr, sr_) in zip(base, redo):
        assert lb == lr
        assert [tuple(map(float, (s.start, s.end, s.freq_start, s.freq_end)))
                for s in sr_] == [
            tuple(map(float, (s.start, s.end, s.freq_start, s.freq_end)))
            for s in sb
        ]


def test_detect_batch_pipelined_two_in_flight():
    """dispatch k+1 before finish k (the serving loop's shape): the
    speculative runs program is dispatched with its own batch, so a second
    in-flight batch must not perturb results."""
    from audio_analysis_tpu.detect.signal_noise import (
        detect_batch,
        detect_batch_dispatch,
        detect_batch_finish,
    )

    y = np.stack([
        _chirpy_recording(seconds=4, seed=2),
        _chirpy_recording(seconds=4, seed=3),
    ])
    nv = np.full(2, y.shape[1], np.int32)
    base = detect_batch(y, nv, SR)
    h1 = detect_batch_dispatch(y, nv, SR)
    h2 = detect_batch_dispatch(y, nv, SR)
    for res in (detect_batch_finish(h1), detect_batch_finish(h2)):
        for (lb, sb), (lr, sr_) in zip(base, res):
            assert lb == lr
            assert [(s.start, s.end, s.freq_start, s.freq_end) for s in sr_] \
                == [(s.start, s.end, s.freq_start, s.freq_end) for s in sb]
