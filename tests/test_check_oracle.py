"""The local gate replica must be hash-faithful to the driver: the driver
hashes rendered values, so -0.0 vs 0.0 (numerically equal, different bits /
different rendering) must FAIL locally too.  Round-1 regression: the replica
compared floats with == and waved hourly_type_stats through while the
driver's value hash failed on DuckDB's -0.0.
"""

from __future__ import annotations

import importlib.util
import pathlib

import pandas as pd

_SPEC = importlib.util.spec_from_file_location(
    "check_oracle", pathlib.Path(__file__).resolve().parents[1] / "tools" / "check_oracle.py"
)
check_oracle = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(check_oracle)


def test_negative_zero_is_a_mismatch():
    s = pd.DataFrame({"x": [0.0, 1.5]})
    o = pd.DataFrame({"x": [-0.0, 1.5]})
    problems = check_oracle.compare("t", s, o)
    assert problems, "-0.0 vs 0.0 must fail bit-exact comparison"


def test_identical_floats_and_nans_pass():
    s = pd.DataFrame({"x": [0.0, -0.0, float("nan"), 2.25]})
    o = pd.DataFrame({"x": [0.0, -0.0, float("nan"), 2.25]})
    assert check_oracle.compare("t", s, o) == []


def test_value_difference_still_caught():
    s = pd.DataFrame({"x": [1.0]})
    o = pd.DataFrame({"x": [1.0000001]})
    assert check_oracle.compare("t", s, o)


def test_nan_vs_value_is_a_mismatch():
    s = pd.DataFrame({"x": [float("nan")]})
    o = pd.DataFrame({"x": [0.0]})
    assert check_oracle.compare("t", s, o)
