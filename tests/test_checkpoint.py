"""Unit tests for the native checkpoint flatten/unflatten round-trip."""

import numpy as np
import pytest

from audio_analysis_tpu.io.checkpoint import (
    _flatten,
    _unflatten,
    load_checkpoint_params,
    save_checkpoint,
)


def test_roundtrip_nested(tmp_path):
    params = {
        "conv": {"kernel": np.arange(6.0).reshape(2, 3), "bias": np.zeros(3)},
        "blocks": [{"w": np.ones((2, 2))}, {"w": np.full((2, 2), 2.0)}],
    }
    save_checkpoint(tmp_path / "m", params, {"name": "t"})
    got = load_checkpoint_params(tmp_path / "m")
    np.testing.assert_array_equal(got["conv"]["kernel"], params["conv"]["kernel"])
    assert isinstance(got["blocks"], list) and len(got["blocks"]) == 2
    np.testing.assert_array_equal(got["blocks"][1]["w"], params["blocks"][1]["w"])


def test_non_contiguous_digit_keys_stay_dict():
    # A pruned layer list saved as keys '0','2' must NOT listify (it used to
    # KeyError on range(len)); it round-trips as a dict instead.
    flat = {"layers/0/w": np.zeros(1), "layers/2/w": np.ones(1)}
    got = _unflatten(flat)
    assert isinstance(got["layers"], dict)
    assert set(got["layers"]) == {"0", "2"}


def test_slash_in_leaf_name_rejected():
    with pytest.raises(ValueError, match="separator"):
        _flatten({"a/b": np.zeros(1)})
