"""eBird location filtering: region bbox matching on the real bundled data,
atlas-square binary search on synthetic squares, prediction filtering +
generic-bird re-add (reference: src/analyse.py:178-364)."""

import json
import numpy as np
import pytest

from audio_analysis_tpu.pipeline.ebird import (
    species_by_location,
    find_square,
    merge_neighbours,
    filter_by_location,
    SPECIES_FILE,
)
from audio_analysis_tpu.detect.signal import Signal, ModelResult


def test_species_file_bundled():
    assert SPECIES_FILE.exists()
    data = json.loads(SPECIES_FILE.read_text())
    assert "NZ-AUK" in data and len(data) == 18


def test_region_bbox_match_auckland():
    # central Auckland
    species, region = species_by_location({"location": {"lat": -36.85, "lng": 174.76}})
    assert region == "NZ-AUK"
    assert "morepo2" in species  # morepork is observed in Auckland


def test_region_no_location_nz_default():
    species, region = species_by_location({})
    assert region == "NZ"
    assert len(species) > 200


def test_region_outside_all_bounds():
    species, region = species_by_location({"location": {"lat": 48.8, "lng": 2.35}})
    assert region is None
    assert species == set() or len(species) == 0


def test_missing_species_file(tmp_path):
    species, region = species_by_location({}, species_file=tmp_path / "nope.json")
    assert species is None and region is None


# ---------------------------------------------------------------------------
# atlas squares (synthetic data exercising find_square/merge_neighbours)
# ---------------------------------------------------------------------------


def _squares():
    # bounds: [minLng, minLat, maxLng, maxLat]; ordered by lng
    return [
        {"bounds": [170.0, -44.0, 171.0, -43.0], "region_code": "NZ-CAN",
         "species_per_month": {"kiwi1": {"1": 20}}, "neighbours_i": [1]},
        {"bounds": [171.0, -44.0, 172.0, -43.0], "region_code": "NZ-CAN",
         "species_per_month": {"morepo2": {"1": 15}, "kiwi1": {"1": 5}}, "neighbours_i": [0]},
        {"bounds": [172.0, -42.0, 173.0, -41.0], "region_code": "NZ-MBH",
         "species_per_month": {"tui1": {"2": 40}}, "neighbours_i": []},
    ]


def test_find_square_hit():
    sq = find_square(_squares(), 170.5, -43.5)
    assert sq is not None and sq["bounds"][0] == 170.0


def test_find_square_lng_match_wrong_lat_scans_neighbours():
    # lng falls in square 2's range but lat doesn't; the reference's
    # neighbour scan (src/analyse.py:263-283) then walks DOWN from the found
    # index and accepts the first square whose LAT matches, without
    # re-checking lng — a quirk we preserve: square 1 is returned here.
    sq = find_square(_squares(), 172.5, -43.5)
    assert sq is not None and sq["bounds"][0] == 171.0


def test_find_square_miss():
    assert find_square(_squares(), 150.0, -43.5) is None


def test_merge_neighbours_accumulates():
    squares = _squares()
    merged = merge_neighbours(squares[0], squares)
    assert merged["kiwi1"]["1"] == 25
    assert merged["morepo2"]["1"] == 15


def test_atlas_square_filtering(tmp_path):
    sq_file = tmp_path / "squares.json"
    sq_file.write_text(json.dumps(_squares()))
    species, region = species_by_location(
        {"location": {"lat": -43.5, "lng": 170.5}},
        species_square_file=sq_file,
    )
    assert region == "NZ-CAN"
    assert set(species) == {"kiwi1", "morepo2"}


def test_atlas_sparse_data_falls_back_to_region(tmp_path):
    squares = _squares()
    # sparse: total < 30 with > 3 species
    squares[0]["species_per_month"] = {f"s{i}": {"1": 2} for i in range(5)}
    squares[0]["neighbours_i"] = []
    sq_file = tmp_path / "squares.json"
    sq_file.write_text(json.dumps(squares))
    species, region = species_by_location(
        {"location": {"lat": -43.6, "lng": 170.6}},
        species_square_file=sq_file,
    )
    # falls through to region bbox (Canterbury contains this point)
    assert region == "NZ-CAN"


# ---------------------------------------------------------------------------
# prediction filtering
# ---------------------------------------------------------------------------


def _track_with_predictions(preds):
    t = Signal(0.0, 3.0, 1000, 5000)
    mr = ModelResult("m", False)
    for what, conf, ebird in preds:
        mr.add_prediction(what, conf, ebird, 0.7)
    t.results.append(mr)
    return t


def test_filter_marks_unobserved_and_readds_bird():
    t = _track_with_predictions([("kaka", 0.9, ["kaka2"])])
    meta = {"location": {"lat": -36.85, "lng": 174.76}}
    # kaka2 might be observed in Auckland; use a fake id that never is
    t2 = _track_with_predictions([("fakey", 0.95, ["zzz_not_a_bird"])])
    filter_by_location(meta, [t2])
    mr = t2.results[0]
    assert mr.predictions[0].filtered is True
    # generic bird was re-added with the max filtered confidence
    added = [p for p in mr.predictions if p.what == "bird"]
    assert len(added) == 1
    assert added[0].confidence == mr.predictions[0].confidence
    assert added[0].ebird_id is None


def test_filter_keeps_observed_and_none_ebird():
    meta = {"location": {"lat": -36.85, "lng": 174.76}}
    t = _track_with_predictions([("morepork", 0.9, ["morepo2"]), ("noise", 0.8, None)])
    filter_by_location(meta, [t])
    mr = t.results[0]
    assert all(not p.filtered for p in mr.predictions)
    assert len(mr.predictions) == 2  # nothing added


def test_filter_no_region_noop():
    t = _track_with_predictions([("x", 0.9, ["zzz"])])
    filter_by_location({"location": {"lat": 48.8, "lng": 2.35}}, [t])
    # region is None (outside NZ) -> species list empty -> region_code None -> no-op
    assert not t.results[0].predictions[0].filtered
