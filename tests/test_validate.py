"""Validation rule tests (analog of the reference's DataValidator behavior +
mirrored rules on the benchrows-style fixture, FIXTURES.md F2)."""

from __future__ import annotations

import pyarrow as pa
import pytest

import ray.data

from pipeflow_ray.stages.validate import (
    DataValidator,
    apply_validation,
    validate_with_results,
)


def _rows() -> pa.Table:
    return pa.table(
        {
            "Name": ["Alice", "", None, "Bob", "Charlie"],
            "Email": ["a@x.com", "bad", "c@y.org", "no-at-sign", "e@z.io"],
            "Age": pa.array([25, 130, 30, -1, 40], pa.int64()),
            "City": ["London", "Paris", "Atlantis", "London", "Tokyo"],
        }
    )


def _validator() -> DataValidator:
    v = DataValidator()
    v.column("Name").required()
    v.column("Email").email()
    v.column("Age").in_range(0, 120)
    return v


def test_skip_strategy_keeps_only_valid():
    out = apply_validation(ray.data.from_arrow(_rows()), _validator(), "skip").to_pandas()
    assert list(out.Name) == ["Alice", "Charlie"]  # rows passing all three rules


def test_route_strategy_splits():
    valid, invalid = apply_validation(ray.data.from_arrow(_rows()), _validator(), "route")
    assert valid.count() == 2 and invalid.count() == 3


def test_throw_strategy_raises():
    import ray.exceptions

    ds = apply_validation(ray.data.from_arrow(_rows()), _validator(), "throw")
    with pytest.raises(Exception, match="validation failed"):
        ds.materialize()


def test_validate_with_results_error_lists():
    out = validate_with_results(ray.data.from_arrow(_rows()), _validator()).to_pandas()
    assert list(out.is_valid) == [True, False, False, False, True]
    # row 1 fails all three rules; row 3: bad email + age out of range
    assert list(out.errors[1]) == [
        "Name is required", "Email is not a valid email", "Age must be between 0 and 120",
    ]
    assert list(out.errors[3]) == ["Email is not a valid email", "Age must be between 0 and 120"]


def test_membership_length_and_type_rules():
    v = DataValidator()
    v.column("City").is_in(["London", "Paris", "Tokyo"])
    v.column("Name").min_length(3).max_length(10)
    out = apply_validation(ray.data.from_arrow(_rows()), v, "skip").to_pandas()
    assert sorted(out.Name) == ["Alice", "Bob", "Charlie"]  # Bob: London + len 3 → valid


def test_type_rule_coercion():
    t = pa.table({"s": ["42", "x", "7", None]})
    v = DataValidator()
    v.column("s").of_type(pa.int64())
    out = apply_validation(ray.data.from_arrow(t), v, "skip").to_pandas()
    assert list(out.s) == ["42", "7"]


def test_missing_column_fails_required():
    t = pa.table({"a": [1, 2]})
    v = DataValidator()
    v.column("nope").required()
    assert apply_validation(ray.data.from_arrow(t), v, "skip").count() == 0
