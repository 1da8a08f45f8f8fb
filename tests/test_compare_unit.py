"""Unit pins for the driver-strict comparator itself (tests/compare.py).

These exist so a revert of a comparator hardening fails a TEST, not a
driver round: round 4 shipped 7 hash-reds because the local canonicalizer
coerced Spark-side Decimals to float — exactly the coercion the driver
does not do."""

from __future__ import annotations

from decimal import Decimal

import pytest

from tests.compare import _render_strict


def test_spark_side_decimal_is_a_hard_error():
    with pytest.raises(AssertionError, match="DecimalType"):
        _render_strict(Decimal("1341148.6071000"), "q", "revenue", side="spark")


def test_duck_side_decimal_renders_as_float():
    assert (
        _render_strict(Decimal("1341148.6071000"), "q", "revenue", side="duck")
        == repr(1341148.6071)
    )


def test_int_and_float_render_distinct():
    assert _render_strict(0, "q", "c") == "0"
    assert _render_strict(0.0, "q", "c") == "0.0"


def test_array_cell_is_a_hard_error_on_either_side():
    for side in ("spark", "duck"):
        with pytest.raises(AssertionError, match="array/struct"):
            _render_strict([1, 2], "q", "c", side=side)
