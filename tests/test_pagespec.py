"""Page-spec / range / chunking parity tests (ported from
/root/reference/tests/test_utils.py:26-69 and
tests/test_core_robustness.py:37-72)."""

from __future__ import annotations

import pytest

from pdf_toolkit_spark.errors import UserError
from pdf_toolkit_spark.pagespec import (
    chunk_ranges,
    compute_page_digits,
    compute_part_digits,
    parse_page_ranges,
    parse_page_spec,
    validate_degrees,
)


def test_parse_page_spec_all_and_star():
    assert parse_page_spec("all", 4) == [0, 1, 2, 3]
    assert parse_page_spec(" ALL ", 3) == [0, 1, 2]
    assert parse_page_spec("*", 2) == [0, 1]


def test_parse_page_spec_ranges_and_singles():
    assert parse_page_spec("1-3,5,7-8", 10) == [0, 1, 2, 4, 6, 7]


def test_parse_page_spec_rejects_bad_input():
    with pytest.raises(UserError):
        parse_page_spec("", 5)
    with pytest.raises(UserError):
        parse_page_spec("1,,2", 5)
    with pytest.raises(UserError):
        parse_page_spec("a-3", 5)
    with pytest.raises(UserError):
        parse_page_spec("3-1", 5)
    with pytest.raises(UserError):
        parse_page_spec("6", 5)  # out of range
    with pytest.raises(UserError):
        parse_page_spec("2,2", 5)  # duplicate
    with pytest.raises(UserError):
        parse_page_spec("0", 5)  # 1-based
    with pytest.raises(UserError):
        parse_page_spec("1", 0)  # no pages


def test_parse_page_ranges_zero_based_inclusive():
    assert parse_page_ranges("1-120,121-240", 240) == [(0, 119), (120, 239)]
    assert parse_page_ranges("5", 10) == [(4, 4)]


def test_parse_page_ranges_rejects_overlap_and_all():
    with pytest.raises(UserError):
        parse_page_ranges("1-3,3-5", 10)
    with pytest.raises(UserError):
        parse_page_ranges("all", 10)


def test_chunk_ranges_ten_by_three():
    # pinned: test_core_robustness.py:50-61
    assert chunk_ranges(10, 3) == [(0, 2), (3, 5), (6, 8), (9, 9)]
    assert chunk_ranges(6, 6) == [(0, 5)]
    assert chunk_ranges(1, 100) == [(0, 0)]
    with pytest.raises(UserError):
        chunk_ranges(10, 0)


def test_digits_helpers():
    # pinned: test_core_robustness.py:37-48, 63-72
    assert compute_page_digits([]) == 4
    assert compute_page_digits([3]) == 4
    assert compute_page_digits([12345]) == 5
    assert compute_part_digits(5) == 2
    assert compute_part_digits(250) == 3


def test_validate_degrees_whitelist():
    assert validate_degrees(90) == 90
    for bad in (0, 45, 360, -90):
        with pytest.raises(UserError):
            validate_degrees(bad)
