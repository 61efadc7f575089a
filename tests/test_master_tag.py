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
