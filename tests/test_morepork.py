"""Morepork pipeline: spectrogram/sample grid vs numpy oracle + e2e with a
tiny fixture model + span heuristics unit cases."""

import json
import numpy as np
import pytest
import scipy.signal

import jax.numpy as jnp

from audio_analysis_tpu.pipeline import morepork as mp


def _ref_stft_mag(y, n_fft, hop):
    w = scipy.signal.get_window("hann", n_fft, fftbins=True)
    ypad = np.pad(y, n_fft // 2)
    n_frames = 1 + (len(ypad) - n_fft) // hop
    frames = np.stack([ypad[i * hop : i * hop + n_fft] for i in range(n_frames)])
    return np.abs(np.fft.rfft(frames * w, axis=-1)).T


def _oracle_samples(frames, sr):
    """Transcription of reference _load_sample + the sample loop
    (src/identify_morepork.py:19-27, 144-167)."""
    nfft = int(sr / 10)
    npspec = _ref_stft_mag(frames, nfft, int(nfft / 2))[
        int(mp.frequency_min / 10) : int(mp.frequency_max / 10)
    ]
    samples, start_times = [], []
    for base in range(0, npspec.shape[1], mp.sample_slide_slices):
        limit = base + mp.slices_per_sample
        if limit > npspec.shape[1]:
            limit = npspec.shape[1]
        start = limit - mp.slices_per_sample
        start_times.append(start / mp.slices_per_second)
        sample = npspec[:, start:limit]
        # amplitude_to_db(ref=max)
        amin = 1e-5
        ref = sample.max()
        db = 20 * np.log10(np.maximum(amin, sample)) - 20 * np.log10(max(amin, ref))
        db = np.maximum(db, db.max() - 80)
        sample = db
        if sample.min() != 0:
            sample = sample / abs(sample.min()) + 1.0
        if sample.shape[1] < 60:
            sample = np.pad(sample, ((0, 0), (0, 60 - sample.shape[1])))
        samples.append(sample.reshape(sample.shape + (1,)))
    return np.array(samples), start_times


def test_sample_grid_matches_oracle(rng):
    sr = 48000
    y = (0.05 * rng.randn(7 * sr)).astype(np.float32)
    t = np.arange(len(y)) / sr
    y += (0.4 * np.sin(2 * np.pi * 800 * t) * (t % 2 < 0.5)).astype(np.float32)

    npspec = mp._spectrogram_program(jnp.asarray(y), sr=sr)
    lows, lengths, start_times = mp._sample_grid(int(npspec.shape[1]))
    got = np.asarray(mp._samples_program(npspec, jnp.asarray(lows), jnp.asarray(lengths)))

    ref, ref_times = _oracle_samples(y, sr)
    assert got.shape == ref.shape
    assert start_times == ref_times
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_find_likely_span_cases():
    # single isolated sample
    assert mp._find_likely_span([80], [0.0], 0, 0) == (80, 0.0, 3.0)
    # two consecutive: overlap span
    lik, s, e = mp._find_likely_span([50, 70], [0.0, 1.0], 0, 1)
    assert lik == 70 and s == 1.0 and e == 3.0
    # three consecutive with middle max
    lik, s, e = mp._find_likely_span([40, 90, 50], [0.0, 1.0, 2.0], 0, 2)
    assert lik == 90 and s == 1.0 and e == 4.0
    # many consecutive, interior max trims both ends
    lik, s, e = mp._find_likely_span([10, 80, 90, 80, 10], [0, 1, 2, 3, 4], 0, 4)
    assert lik == 90 and s == 1.0 and e == 6.0


def _oracle_labels(activations_sum, start_times, n_models):
    """Independent second transcription of the reference label loop + span
    heuristics (src/identify_morepork.py:42-120, 175-199), written fresh from
    the reference as a mutation oracle for pipeline.morepork."""
    sps = 3.0  # seconds_per_sample
    slide = 1.0  # sample_slide_seconds

    def span(lik, st, first, last):
        count = last - first
        t0 = st[first]
        t1 = st[last] + sps
        if count == 0:
            return lik[first], t0, t1
        if count == 1:
            return max(lik[first], lik[last]), t0 + slide, t0 + sps
        if count == 2:
            mx = max(lik[first : last + 1])
            mn = min(lik[first : last + 1])
            if mx == lik[first + 1]:
                return mx, st[first + 1], st[first + 1] + sps
            if mn == lik[first]:
                return mx, st[first + 1], t1
            if mn == lik[last]:
                return mx, t0, st[first + 1] + sps
            return mx, t0, t1
        mx = max(lik[first : last + 1])
        if mx > lik[first]:
            if mx > lik[last]:
                return mx, st[first + 1], st[last - 1] + sps
            return mx, st[first + 1], t1
        if mx > lik[last]:
            return mx, t0, st[last - 1] + sps
        return mx, t0, t1

    lik = [round(v * 100 / n_models) for v in activations_sum]
    out = []
    first = -1
    last = -1
    for i, a in enumerate(activations_sum):
        if a >= 1.0:
            if first < 0:
                first = i
            last = i
        elif first >= 0:
            l, s, e = span(lik, start_times, first, last)
            out.append((l, s, e))
            first = -1
    if first >= 0:
        l, s, e = span(lik, start_times, first, last)
        out.append((l, s, e))
    return out


def fuzz_label_loop_one_seed(seed):
    """One seed of the label-loop differential fuzz: random tie-heavy
    activation sums over a real sample grid (incl. short recordings with
    negative/irregular start times) vs the oracle transcription above."""
    r = np.random.RandomState(seed)
    n_models = r.randint(1, 4)
    # grid from a random recording length: 0.5-40 s worth of slices
    n_slices = r.randint(10, 800)
    _, _, start_times = mp._sample_grid(n_slices)
    n = len(start_times)
    # tie-heavy likelihoods: coarse quantised activations cluster around
    # the threshold so ==/>/>= branches and rounding ties all fire
    acts = r.choice([0.0, 0.4, 0.9, 0.99, 1.0, 1.01, 1.5, 2.0, 2.5], size=n)
    acts = acts + r.choice([0.0, 0.005], size=n)  # rounding-tie jitter
    got = mp.labels_from_activations(list(acts), start_times, n_models)
    want = _oracle_labels(list(acts), start_times, n_models)
    assert len(got) == len(want), (seed, got, want)
    for g, (l, s, e) in zip(got, want):
        assert g["begin_s"] == s and g["end_s"] == e, (seed, g, (l, s, e))
        assert g["predictions"][0]["likelihood"] == [round(l * 0.01, 2)], (
            seed, g, l,
        )
        assert g["freq_start"] == 600 and g["freq_end"] == 1200


def test_label_loop_fuzz_vs_oracle():
    for seed in range(400):
        fuzz_label_loop_one_seed(seed)


def test_morepork_e2e_with_fixture_model(tmp_path, rng):
    tf = pytest.importorskip("tensorflow")
    sr = 48000
    # recording with an 800 Hz "call" burst in the 600-1200 band
    y = (0.01 * rng.randn(10 * sr)).astype(np.float32)
    t = np.arange(len(y)) / sr
    m = (t >= 3.0) & (t < 4.0)
    y[m] += (0.5 * np.sin(2 * np.pi * 800 * t[m])).astype(np.float32)

    # two-member ensemble biased positive: a single sigmoid can never reach
    # the sum-threshold 1.0 (reference :182 thresholds the SUM), so one
    # unbiased model would make this test vacuously pass on empty labels
    dirs = []
    for i in range(2):
        d = tmp_path / f"mp{i}"
        d.mkdir()
        inp = tf.keras.Input((60, 60, 1))
        x = tf.keras.layers.GlobalAveragePooling2D()(inp)
        out = tf.keras.layers.Dense(
            1,
            activation="sigmoid",
            bias_initializer=tf.keras.initializers.Constant(4.0),
        )(x)
        tf.keras.Model(inp, out).save(str(d / "audioModel.keras"))
        (d / "metadata.txt").write_text(json.dumps({"name": "morepork"}))
        dirs.append(str(d))

    labels = mp.identify_morepork_frames(y, sr, dirs)
    assert labels, "ensemble above threshold must produce at least one span"
    for entry in labels:
        assert entry["freq_start"] == 600 and entry["freq_end"] == 1200
        assert entry["predictions"][0]["species"] == ["morepork"]
        assert entry["predictions"][0]["model"] == "morepork"


def test_morepork_empty_model_dir_nan_crash_quirk(tmp_path, rng):
    """QUIRK (preserved on purpose): a morepork dir with no SavedModel
    members (model_paths finds nothing) divides by zero model count —
    numpy 0.0*100/0 -> NaN -> round() ValueError, exactly like the
    reference (src/identify_morepork.py:179 `/ len(model_paths)`)."""
    y = (0.01 * rng.randn(48000 * 3)).astype(np.float32)
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(ValueError, match="NaN"):
        mp.identify_morepork_frames(y, 48000, mp.model_paths(str(empty)))
