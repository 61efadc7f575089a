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


# ---------------------------------------------------------------------------
# differential fuzz: find_square / merge_neighbours vs fresh second
# transcriptions of the reference (src/analyse.py:244-299)
# ---------------------------------------------------------------------------


def _oracle_find_square(squares, lng, lat):
    """Independent second transcription of reference find_square
    (src/analyse.py:244-283), quirks included: the upward scan re-checks
    only minLng (not maxLng), the downward pass starts at found-1, and
    mid == len(squares) re-tests STALE bounds (`mid > len(squares)`)."""
    high, low, found = len(squares), 0, None
    while high >= low:
        mid = (high + low) // 2
        b = squares[mid]["bounds"]
        if b[0] <= lng <= b[2]:
            found = mid
            break
        if b[2] < lng:
            low = mid + 1
        else:
            high = mid - 1
    if found is None:
        return None
    dec = False
    b = squares[mid]["bounds"]
    while True:
        if mid < 0:
            return None
        if mid < len(squares):
            b = squares[mid]["bounds"]
        if mid > len(squares) or b[0] > lng:
            if dec:
                return None
            dec = True
            mid = found - 1
            continue
        if b[1] <= lat <= b[3]:
            return squares[mid]
        mid = mid - 1 if dec else mid + 1


def _oracle_merge(square, meta):
    """Second transcription of reference merge_neighbours
    (src/analyse.py:286-299), quirk included: a neighbour month absent from
    the square's own dict for a SHARED species raises KeyError (:298 is an
    unguarded `+=`); only wholly-new species get copied in."""
    out = {s: dict(m) for s, m in square["species_per_month"].items()}
    for n in square["neighbours_i"]:
        for s, md in meta[n]["species_per_month"].items():
            if s not in out:
                out[s] = dict(md)
            else:
                for m, c in md.items():
                    out[s][m] += c  # KeyError on month mismatch, like the ref
    return out


def _random_grid(r):
    """lng-sorted squares with random widths (so lng ranges overlap or gap),
    random lat bands, and small-int coords so boundary equality fires."""
    n = int(r.randint(1, 30))
    lng0 = r.randint(0, 8, size=n)
    lng0.sort()
    squares = []
    for i in range(n):
        w = int(r.randint(1, 4))
        lat0 = int(r.randint(-6, 4))
        h = int(r.randint(1, 4))
        squares.append(
            {
                "bounds": [int(lng0[i]), lat0, int(lng0[i]) + w, lat0 + h],
                "region_code": f"R{i}",
                "species_per_month": {
                    f"sp{int(k)}": {str(int(m)): int(r.randint(1, 9))
                                    for m in r.choice(12, r.randint(1, 4), replace=False)}
                    for k in r.choice(20, r.randint(0, 5), replace=False)
                },
                "neighbours_i": [int(x) for x in r.choice(n, r.randint(0, min(n, 4)), replace=False)],
            }
        )
    return squares


def _outcome(fn, *args):
    """(value, exception-type) pair so the fuzz compares crash behaviour too —
    both find_square (IndexError past the right edge) and merge_neighbours
    (KeyError on month mismatch) crash by design, matching the reference."""
    try:
        return fn(*args), None
    except (IndexError, KeyError) as e:
        return None, type(e)


def fuzz_find_square_one_seed(seed):
    """One seed = one random grid x 20 queries. Returns (crashes, hits) so
    the test can assert outcome-class coverage in aggregate."""
    import copy

    crashes = hits = 0
    r = np.random.RandomState(seed)
    squares = _random_grid(r)
    for _ in range(20):
        lng = float(r.randint(-1, 13)) + float(r.choice([0.0, 0.5]))
        lat = float(r.randint(-8, 6)) + float(r.choice([0.0, 0.5]))
        got, ge = _outcome(find_square, copy.deepcopy(squares), lng, lat)
        want, we = _outcome(_oracle_find_square, copy.deepcopy(squares), lng, lat)
        assert ge == we, (seed, lng, lat, ge, we)
        crashes += ge is not None
        if want is None:
            assert got is None, (seed, lng, lat)
        else:
            hits += 1
            assert got is not None and got["region_code"] == want["region_code"], (
                seed, lng, lat, got, want,
            )
    return crashes, hits


def test_find_square_fuzz_vs_oracle():
    crashes = hits = 0
    for seed in range(300):
        c, h = fuzz_find_square_one_seed(seed)
        crashes += c
        hits += h
    # the draw must actually exercise all three outcome classes
    assert crashes > 50 and hits > 500, (crashes, hits)


def fuzz_merge_neighbours_one_seed(seed):
    """One seed of the merge fuzz. Returns (crashed, merged) flags."""
    import copy

    r = np.random.RandomState(1000 + seed)
    squares = _random_grid(r)
    i = int(r.randint(len(squares)))
    want, we = _outcome(_oracle_merge, copy.deepcopy(squares[i]), copy.deepcopy(squares))
    got, ge = _outcome(merge_neighbours, copy.deepcopy(squares[i]), copy.deepcopy(squares))
    assert ge == we, (seed, i, ge, we)
    if ge is None:
        assert got == want, (seed, i)
    return ge is not None, ge is None


def test_merge_neighbours_fuzz_vs_oracle():
    crashes = merges = 0
    for seed in range(200):
        c, m = fuzz_merge_neighbours_one_seed(seed)
        crashes += c
        merges += m
    assert crashes > 20 and merges > 20, (crashes, merges)


def test_find_square_beyond_right_edge_crashes_like_reference():
    """Quirk pinned: lng east of every square's range drives the reference's
    binary search to index squares[len(squares)] (src/analyse.py:245,251
    starts high at len) — IndexError, not a None miss. West of every square
    returns None via the high = mid - 1 path."""
    squares = _squares()
    with pytest.raises(IndexError):
        find_square(squares, 200.0, -43.5)
    assert find_square(squares, 100.0, -43.5) is None


def test_merge_neighbours_month_mismatch_crashes_like_reference():
    """Quirk pinned: a shared species whose neighbour has a month the square
    lacks raises KeyError (reference src/analyse.py:298 unguarded +=)."""
    squares = [
        {"bounds": [0, 0, 1, 1], "region_code": "A",
         "species_per_month": {"sp": {"1": 2}}, "neighbours_i": [1]},
        {"bounds": [1, 0, 2, 1], "region_code": "B",
         "species_per_month": {"sp": {"2": 3}}, "neighbours_i": []},
    ]
    with pytest.raises(KeyError):
        merge_neighbours(squares[0], squares)
