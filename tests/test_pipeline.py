"""Pipeline parity tests: window planning vs a transcribed load_samples
oracle (identical RNG draws), frontend vs numpy get_spect, legacy cacophony
index vs a numpy/scipy oracle, cacophony v2/chirps unit cases."""

import numpy as np
import pytest
import scipy.signal
import scipy.fftpack

import jax.numpy as jnp

from audio_analysis_tpu.detect.signal import Signal
from audio_analysis_tpu.pipeline.samples import plan_windows, gather_windows
from audio_analysis_tpu.pipeline.frontend import spectrogram_grid
from audio_analysis_tpu.pipeline.cacophony import (
    calc_cacophony_index,
    get_chirps,
    get_max_chirps,
)
from audio_analysis_tpu.pipeline.old_index import calculate_from_frames

SR = 48000


# ---------------------------------------------------------------------------
# oracle: reference load_samples windowing (src/identify_tracks.py:109-198)
# ---------------------------------------------------------------------------


def _oracle_windows(frames, sr, tracks, segment_length, stride, rng):
    sample_size = int(sr * segment_length)
    out = []
    for t in tracks:
        track_wins = []
        if t.freq_start > 11000 or t.freq_end < 50:
            out.append(track_wins)
            continue
        sr_end = int(t.end * sr)
        sr_start = int(sr * t.start)
        missing = sample_size - (sr_end - sr_start)
        if missing > 0:
            offset = rng.randint(0, missing)
            sr_start = sr_start - offset
            if sr_start <= 0:
                sr_start = 0
                sr_end = min(sr_start + sample_size, len(frames))
            else:
                end_offset = sr_end + missing - offset
                if end_offset > len(frames):
                    end_offset = len(frames)
                    sr_start = max(end_offset - sample_size, 0)
                sr_end = end_offset
        track_frames = frames[sr_start:sr_end]
        ls = 0
        le = min(sr_end, sample_size)
        start = 0.0
        while True:
            data = track_frames[ls:le]
            if len(data) != sample_size:
                extra = sample_size - len(data)
                offset = rng.randint(0, extra)
                data = np.pad(data, (offset, extra - offset))
            track_wins.append(data)
            start = start + stride
            end = start + segment_length
            ls = int(start * sr)
            le = min(int(end * sr), ls + sample_size)
            if end > (t.end - t.start):
                break
        out.append(track_wins)
    return out


def test_window_plan_matches_oracle(rng):
    frames = rng.randn(20 * SR).astype(np.float32)
    tracks = [
        Signal(0.5, 4.2, 2000, 5000),  # long track, multiple windows
        Signal(6.0, 6.4, 1000, 2000),  # short track -> random offset path
        Signal(18.5, 19.9, 3000, 4000),  # track near the end
        Signal(2.0, 3.0, 12000, 15000),  # out of band -> skipped
    ]
    r1 = np.random.RandomState(7)
    r2 = np.random.RandomState(7)
    oracle = _oracle_windows(frames, SR, tracks, 3.0, 1.5, r1)
    plan = plan_windows(len(frames), SR, tracks, 3.0, 1.5, rng=r2)
    grid = np.asarray(gather_windows(jnp.asarray(frames), plan))

    flat_oracle = [w for tw in oracle for w in tw]
    assert len(flat_oracle) == grid.shape[0]
    for got, ref in zip(grid, flat_oracle):
        np.testing.assert_allclose(got, ref, atol=1e-7)
    # track mapping: window counts per track
    counts = np.bincount(plan.track_index, minlength=len(tracks))
    np.testing.assert_array_equal(counts, [len(tw) for tw in oracle])
    assert plan.skipped_tracks == [3]


def test_window_plan_short_recording(rng):
    frames = rng.randn(2 * SR).astype(np.float32)  # recording < one window
    tracks = [Signal(0.2, 1.0, 2000, 5000)]
    r1, r2 = np.random.RandomState(3), np.random.RandomState(3)
    oracle = _oracle_windows(frames, SR, tracks, 3.0, 1.5, r1)
    plan = plan_windows(len(frames), SR, tracks, 3.0, 1.5, rng=r2)
    grid = np.asarray(gather_windows(jnp.asarray(frames), plan))
    for got, ref in zip(grid, [w for tw in oracle for w in tw]):
        np.testing.assert_allclose(got, ref, atol=1e-7)


def test_window_plan_pad_short_tracks(rng):
    frames = rng.randn(10 * SR).astype(np.float32)
    tracks = [Signal(4.0, 4.8, 2000, 5000)]
    r2 = np.random.RandomState(1)
    plan = plan_windows(
        len(frames), SR, tracks, 3.0, 1.5, pad_short_tracks=True, rng=r2
    )
    grid = np.asarray(gather_windows(jnp.asarray(frames), plan))
    assert grid.shape == (1, 3 * SR)
    # real content is the 0.8 s of track audio placed at the drawn offset
    r1 = np.random.RandomState(1)
    offset = r1.randint(0, 3 * SR - int(0.8 * SR))
    seg = frames[4 * SR : int(4.8 * SR)]
    np.testing.assert_allclose(grid[0][offset : offset + len(seg)], seg, atol=1e-7)
    assert np.all(grid[0][: offset] == 0)


# ---------------------------------------------------------------------------
# frontend vs numpy get_spect oracle (src/identify_tracks.py:212-288)
# ---------------------------------------------------------------------------


def _ref_stft_mag(y, n_fft, hop):
    w = scipy.signal.get_window("hann", n_fft, fftbins=True)
    ypad = np.pad(y, n_fft // 2)
    n_frames = 1 + (len(ypad) - n_fft) // hop
    frames = np.stack([ypad[i * hop : i * hop + n_fft] for i in range(n_frames)])
    return np.abs(np.fft.rfft(frames * w, axis=-1)).T


def _ref_mel_fb(sr, n_mels, fmin, fmax, n_fft, break_freq):
    def h2m(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=float) / break_freq)

    def m2h(m):
        return break_freq * (10.0 ** (np.asarray(m, dtype=float) / 2595.0) - 1.0)

    fftfreqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    mel_pts = m2h(np.linspace(h2m(fmin), h2m(fmax), n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = np.subtract.outer(mel_pts, fftfreqs)
    weights = np.zeros((n_mels, 1 + n_fft // 2), np.float32)
    for i in range(n_mels):
        weights[i] = np.maximum(
            0, np.minimum(-ramps[i] / fdiff[i], ramps[i + 2] / fdiff[i + 1])
        )
    weights *= (2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels]))[:, None]
    return weights


def _oracle_get_spect(data, sr, hop, n_mels, mel_break, n_fft, power, db_scale, mean_sub, channels):
    mag = _ref_stft_mag(data, n_fft, hop)
    fb = _ref_mel_fb(sr, n_mels, 50, 11000, n_fft, mel_break)
    mel = fb.dot(mag**power)
    if db_scale:
        ref_value = np.max(mel)
        log_spec = 10.0 * np.log10(np.maximum(1e-10, mel))
        log_spec -= 10.0 * np.log10(np.maximum(1e-10, ref_value))
        mel = np.maximum(log_spec, log_spec.max() - 80.0)
    mel = mel[:, :, None]
    if mean_sub:
        mel = mel - mel.mean(axis=1, keepdims=True)
    if channels > 1:
        mel = np.repeat(mel, channels, axis=2)
    return mel


def _oracle_normalize(x):
    min_v = np.min(x, -1, keepdims=True)
    x = x - min_v
    max_v = np.max(x, -1, keepdims=True)
    x = x / max_v + 0.000001
    return (x - 0.5) * 2


@pytest.mark.parametrize("db_scale,mean_sub,channels", [(True, False, 1), (False, True, 3), (True, True, 1)])
def test_frontend_matches_get_spect(rng, db_scale, mean_sub, channels):
    wins = rng.randn(3, SR).astype(np.float32)  # 1 s windows for speed
    got = np.asarray(
        spectrogram_grid(
            jnp.asarray(wins),
            sr=SR,
            hop_length=640,
            n_fft=4096,
            n_mels=64,
            mel_break=1750.0,
            htk=True,
            fmin=50.0,
            fmax=11000.0,
            power=2.0,
            db_scale=db_scale,
            normalize=True,
            mean_sub=mean_sub,
            channels=channels,
        )
    )
    for i in range(wins.shape[0]):
        data = _oracle_normalize(wins[i].copy())
        ref = _oracle_get_spect(
            data, SR, 640, 64, 1750, 4096, 2, db_scale, mean_sub, channels
        )
        np.testing.assert_allclose(got[i], ref, rtol=5e-3, atol=2e-2)


# ---------------------------------------------------------------------------
# legacy cacophony index vs numpy/scipy oracle (src/cacophony_index.py)
# ---------------------------------------------------------------------------


def _oracle_old_index_points(source_data, sample_rate=16000):
    window_size = 2048
    half = window_size // 2
    previous_bins = None
    points = []
    import math

    for offset in range(half, source_data.shape[0] - half * 3, half):
        trim = source_data[offset : offset + window_size]
        sig = np.hanning(window_size) * trim
        dct = scipy.fftpack.dct(sig)
        bass_cut = 100 * 2 * window_size // sample_rate
        edges = np.logspace(
            math.log10(bass_cut), math.log10(window_size), num=11, dtype=int
        )
        bins_raw = np.split(dct, edges)[1:-1]
        bins = np.array([sum(x * x) for x in bins_raw])
        if previous_bins is not None:
            points.append(sum(bins * 2 < previous_bins) + sum(bins > previous_bins * 2))
        previous_bins = bins
    return points


def test_old_index_matches_oracle(rng):
    y = (0.1 * rng.randn(25 * 16000)).astype(np.float32)
    # add some structure so points vary
    t = np.arange(len(y)) / 16000
    y += 0.3 * np.sin(2 * np.pi * 800 * t) * (np.sin(2 * np.pi * 2 * t) > 0.3)
    res = calculate_from_frames(y, 16000)
    pts_ref = _oracle_old_index_points(y.astype(np.float64))
    from audio_analysis_tpu.pipeline.old_index import (
        score_from_points,
        apply_correction_curve_202001C,
    )

    assert len(res["cacophony_index_old"]) == (len(pts_ref) + 31) // 312
    score = apply_correction_curve_202001C(score_from_points(pts_ref[0:312]))
    got = res["cacophony_index_old"][0]["index_percent"]
    assert abs(got - round(score, 1)) <= 0.2  # float32 DCT vs float64 oracle


def _oracle_old_index_table(points):
    """Independent second transcription of the reference table assembly
    (src/cacophony_index.py:99-114), written fresh as a mutation oracle."""
    import math

    out = []
    n_entries = (len(points) + 31) // 312
    for e in range(n_entries):
        q = e * (len(points) - 312) // (n_entries - 1) if e else 0
        sl = sorted(points[q : q + 312])
        raw = 10 * np.mean(sl[int(len(sl) * 0.75) : int(len(sl) * 0.95)])
        s = raw - 10
        score = max(100 * s / (s + 18), 0)
        out.append(
            {
                "begin_s": round(q * 1024 / 16000),
                "end_s": round((q + 312) * 1024 / 16000),
                "index_percent": round(score, 1),
            }
        )
    return out


def fuzz_old_index_table_one_seed(seed):
    """One seed of the table-assembly differential fuzz: entry-count
    boundaries (281, 312, 313, 593, 624, ...), the q interpolation, and
    begin/end rounding."""
    from audio_analysis_tpu.pipeline.old_index import table_from_points

    lengths = [0, 1, 280, 281, 312, 313, 592, 593, 624, 1000, 1871, 1872, 5000]
    r = np.random.RandomState(seed)
    n = lengths[seed % len(lengths)] + int(r.randint(0, 37))
    points = r.randint(0, 21, size=n).tolist()
    assert table_from_points(points) == _oracle_old_index_table(points), (seed, n)


def test_old_index_table_fuzz_vs_oracle():
    for seed in range(60):
        fuzz_old_index_table_one_seed(seed)


def test_old_index_points_fuzz_vs_float64_oracle():
    """Multi-seed device-points check: varied lengths and signal structures
    vs the float64 numpy/scipy oracle. Points are integer band-change counts;
    allow a tiny borderline-flip budget for f32-vs-f64 near-ties."""
    from audio_analysis_tpu.pipeline.old_index import _points_program

    total = flipped = 0
    for seed in range(6):
        r = np.random.RandomState(100 + seed)
        secs = float(r.uniform(4.5, 30))
        n = int(secs * 16000)
        y = (0.1 * r.randn(n)).astype(np.float32)
        t = np.arange(n) / 16000
        f0 = float(r.uniform(150, 3000))
        gate = np.sin(2 * np.pi * r.uniform(0.5, 4) * t) > r.uniform(-0.5, 0.8)
        y += (0.4 * np.sin(2 * np.pi * f0 * t) * gate).astype(np.float32)
        ref = np.asarray(_oracle_old_index_points(y.astype(np.float64)))
        if len(ref) < 1:
            got = []
        else:
            got = np.asarray(
                _points_program(
                    jnp.asarray(y), window_size=2048, half_window=1024, sample_rate=16000
                )
            )
        assert len(got) == len(ref), seed
        total += len(ref)
        flipped += int(np.sum(np.asarray(got) != ref)) if len(ref) else 0
    assert total > 1000
    assert flipped <= max(2, total // 200), (flipped, total)


def test_old_index_short_warning():
    res = calculate_from_frames(np.zeros(16000 * 5, np.float32), 16000)
    assert res["cacophony_index_old"] == []
    assert "ci_warning" in res


# ---------------------------------------------------------------------------
# cacophony v2 + chirps
# ---------------------------------------------------------------------------


def _tagged(start, end, what="bird"):
    s = Signal(start, end, 1000, 4000)

    class _Tag:
        pass

    tag = _Tag()
    tag.what = what
    s.master_tag = tag
    return s


def test_calc_cacophony_index_full_coverage():
    tracks = [_tagged(0, 20), _tagged(20, 40), _tagged(40, 60)]
    percents, version = calc_cacophony_index(tracks, 60)
    # reference quirk: the first bin's coverage is flushed into bin 1 when a
    # track ends exactly on a period boundary (trace of src/analyse.py:46-78),
    # so full coverage reads [0, 100, 100]
    assert [p["index_percent"] for p in percents] == [0, 100.0, 100.0]


def test_calc_cacophony_index_61s_last_bin_merge():
    percents, _ = calc_cacophony_index([], 61)
    assert len(percents) == 3
    assert percents[-1]["end_s"] == 61


def test_calc_cacophony_index_partial():
    tracks = [_tagged(0, 5), _tagged(10, 15)]
    percents, _ = calc_cacophony_index(tracks, 20)
    assert percents[0]["index_percent"] == 50.0


def test_get_chirps_counts_overlapping_signals():
    tracks = [_tagged(1.0, 3.0)]
    signals = [Signal(1.2, 1.5, 1500, 3000), Signal(2.0, 2.2, 1500, 3000), Signal(5.0, 5.2, 1500, 3000)]
    chirps = get_chirps(tracks, ["bird"], signals)
    assert chirps == 2
    assert len(signals) == 1  # counted ones are deleted


def test_get_max_chirps():
    assert get_max_chirps(60) == int(60 / 0.26)
