"""Master-tag arbitration rules (reference: src/identify_tracks.py:580-647):
sure specific > sure generic from main models, pre-model noise/human
overrides morepork, raw argmax fallback marks below_thresh."""

from audio_analysis_tpu.detect.signal import Signal, ModelResult, Prediction


def _track(*results):
    t = Signal(0, 3, 1000, 4000)
    t.results.extend(results)
    return t


def _mr(model, pre_model, preds=(), raw=None):
    mr = ModelResult(model, pre_model)
    for what, conf in preds:
        mr.add_prediction(what, conf, None, 0.7)
    if raw:
        mr.raw_prediction = Prediction(raw[0], raw[1], None)
    return mr


def test_specific_beats_generic_bird():
    t = _track(_mr("main", False, [("bird", 0.95), ("kiwi", 0.8)]))
    t.set_master_tag()
    assert t.master_tag.what == "kiwi"  # specific wins despite lower conf
    assert t.master_below_thresh is False


def test_generic_bird_when_only_bird():
    t = _track(_mr("main", False, [("bird", 0.9)]))
    t.set_master_tag()
    assert t.master_tag.what == "bird"


def test_highest_confidence_specific_wins():
    t = _track(_mr("main", False, [("kiwi", 0.75), ("morepork", 0.9)]))
    t.set_master_tag()
    assert t.master_tag.what == "morepork"


def test_pre_model_noise_overrides_morepork():
    t = _track(
        _mr("main", False, [("morepork", 0.9)]),
        _mr("pre", True, [("noise", 0.8)]),
    )
    t.set_master_tag()
    assert t.master_tag.what == "noise"
    assert t.master_model == "pre"


def test_pre_model_does_not_override_other_species():
    t = _track(
        _mr("main", False, [("kiwi", 0.9)]),
        _mr("pre", True, [("noise", 0.95)]),
    )
    t.set_master_tag()
    assert t.master_tag.what == "kiwi"


def test_pre_model_only():
    t = _track(_mr("pre", True, [("human", 0.9)]))
    t.set_master_tag()
    assert t.master_tag.what == "human"
    assert t.master_below_thresh is False


def test_raw_fallback_marks_below_thresh():
    t = _track(_mr("main", False, raw=("kiwi", 0.4)))
    t.set_master_tag()
    assert t.master_tag.what == "kiwi"
    assert t.master_below_thresh is True


def test_pre_raw_last_resort():
    t = _track(_mr("pre", True, raw=("noise", 0.3)))
    t.set_master_tag()
    assert t.master_tag.what == "noise"
    assert t.master_below_thresh is True


def test_filtered_predictions_skipped():
    mr = _mr("main", False, [("kaka", 0.9), ("bird", 0.8)])
    mr.predictions[0].filtered = True
    t = _track(mr)
    t.set_master_tag()
    assert t.master_tag.what == "bird"


def test_no_results_no_tag():
    t = _track()
    t.set_master_tag()
    assert t.master_tag is None
    assert t.master_below_thresh is True


def test_raw_preds_highest_confidence_across_models():
    t = _track(
        _mr("m1", False, raw=("kiwi", 0.3)),
        _mr("m2", False, raw=("whistler", 0.5)),
    )
    t.set_master_tag()
    assert t.master_tag.what == "whistler"
    assert t.master_model == "m2"


# ---------------------------------------------------------------------------
# differential fuzz vs a second transcription of the reference arbitration
# (src/identify_tracks.py:580-647)
# ---------------------------------------------------------------------------

import numpy as np

from audio_analysis_tpu.detect.signal import get_master_tag


def _oracle_master_tag(track):
    """Independent second transcription of reference get_master_tag, quirks
    included: the LAST pre_model result wins and earlier pre results (and
    their raw predictions) are dropped entirely; pre_pred is predictions[0]
    only — a filtered first prediction disables the pre branch even when
    later pre predictions are clean; sorts are stable so confidence ties
    keep results order."""
    pre = None
    others = []
    raws = []
    for mr in track.results:
        if mr.pre_model:
            pre = mr
            continue
        for p in mr.predictions:
            if not p.filtered:
                others.append((p, mr.model))
        if mr.raw_prediction is not None:
            raws.append((mr.raw_prediction, mr.model))

    first_specific = None
    if others:
        ordered = sorted(others, key=lambda t: t[0].confidence, reverse=True)
        for t in ordered:
            if t[0].what != "bird":
                first_specific = t
                break
        if first_specific is None:
            first_specific = ordered[0]

    pre_pred = None
    if pre is not None and len(pre.predictions) > 0:
        if not pre.predictions[0].filtered:
            pre_pred = (pre.predictions[0], pre.model)

    if first_specific is None and pre_pred is not None:
        return (*pre_pred, False)
    if first_specific is not None and pre_pred is not None:
        if first_specific[0].what == "morepork" and pre_pred[0].what in ("human", "noise"):
            return (*pre_pred, False)
        return (*first_specific, False)
    if first_specific is not None:
        return (*first_specific, False)
    if raws:
        ordered = sorted(raws, key=lambda t: t[0].confidence, reverse=True)
        return (*ordered[0], True)
    if pre is not None and pre.raw_prediction is not None:
        return pre.raw_prediction, pre.model, True
    return None


LABELS_FUZZ = ["bird", "morepork", "kiwi", "tui", "human", "noise"]
CONFS = [0.6, 0.7, 0.7, 0.8, 0.9]  # coarse so cross-model ties are common


def _random_track(r):
    t = _track()
    n_models = r.randint(1, 5)
    for i in range(n_models):
        pre = bool(r.rand() < 0.35)  # several pre results happen (last wins)
        mr = ModelResult(f"m{i}", pre)
        for _ in range(r.randint(0, 4)):
            p = Prediction(
                str(r.choice(LABELS_FUZZ)), float(r.choice(CONFS)), None, 0.7
            )
            p.filtered = bool(r.rand() < 0.3)
            mr.predictions.append(p)
        if r.rand() < 0.5:
            mr.raw_prediction = Prediction(
                str(r.choice(LABELS_FUZZ)), float(r.choice(CONFS)), None
            )
        t.results.append(mr)
    return t


def fuzz_master_tag_one_seed(seed):
    """One seed of the arbitration fuzz. Returns the outcome class
    (None / False / True) so the test can assert class coverage."""
    r = np.random.RandomState(seed)
    t = _random_track(r)
    got = get_master_tag(t)
    want = _oracle_master_tag(t)
    if want is None:
        assert got is None, seed
        return None
    assert got is not None, seed
    # identity: the exact same Prediction object must be chosen
    assert got[0] is want[0] and got[1] == want[1] and got[2] == want[2], (
        seed,
        (got[0].what, got[0].confidence, got[1], got[2]),
        (want[0].what, want[0].confidence, want[1], want[2]),
    )
    return got[2]


def test_master_tag_fuzz_vs_oracle():
    outcomes = {None: 0, False: 0, True: 0}
    for seed in range(3000):
        outcomes[fuzz_master_tag_one_seed(seed)] += 1
    # all three outcome classes (no tag / confident / below-thresh raw) fire
    assert min(outcomes.values()) > 50, outcomes
