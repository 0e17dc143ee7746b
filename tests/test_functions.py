"""Unit tests for the hyrise-compatible scalar function surface
(functions/__init__.py) — semantics pinned against the reference's documented
behavior (SURVEY.md §2.2, §7 hard-part 3)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hyrise_spark import functions as hf


def _one(spark, col):
    return spark.range(1).select(col.alias("x")).collect()[0]["x"]


def test_substr_is_one_based(spark):
    assert _one(spark, hf.substr(F.lit("abcdef"), 1, 3)) == "abc"
    assert _one(spark, hf.substr(F.lit("abcdef"), 3, 2)) == "cd"


def test_concat_null_propagates(spark):
    assert _one(spark, hf.concat(F.lit("a"), F.lit("b"))) == "ab"
    assert _one(spark, hf.concat(F.lit("a"), F.lit(None).cast("string"))) is None


def test_abs(spark):
    assert _one(spark, hf.abs(F.lit(-3))) == 3


@pytest.mark.parametrize(
    "a,b,want",
    [(7, 2, 3), (-7, 2, -3), (7, -2, -3), (-7, -2, 3), (6, 3, 2), (0, 5, 0)],
)
def test_int_div_truncates_toward_zero(spark, a, b, want):
    assert _one(spark, hf.int_div(F.lit(a), F.lit(b))) == want


def test_int_div_by_zero_is_null(spark):
    assert _one(spark, hf.int_div(F.lit(7), F.lit(0))) is None


@pytest.mark.parametrize("a,b,want", [(7, 2, 1), (-7, 2, -1), (7, -2, 1)])
def test_mod_sign_follows_dividend(spark, a, b, want):
    assert _one(spark, hf.mod(F.lit(a), F.lit(b))) == want


def test_date_interval_folds_like_reference():
    # The TPC-H Q1 fold: DATE '1998-12-01' - INTERVAL '90' DAY
    assert hf.date_interval("1998-12-01", days=-90) == "1998-09-02"
    assert hf.date_interval("1997-01-31", months=1) == "1997-02-28"  # clamp
    assert hf.date_interval("1996-02-29", years=1) == "1997-02-28"  # leap clamp


@pytest.mark.parametrize(
    "pattern,s,want",
    [
        ("abc%", "abcdef", True),
        ("%def", "abcdef", True),
        ("a_c%", "abcdef", True),
        ("a.c%", "abcdef", False),  # dot is literal, not wildcard
        ("%x%", "abcdef", False),
    ],
)
def test_like_to_regex(spark, pattern, s, want):
    got = _one(spark, F.lit(s).rlike(hf.like_to_regex(pattern)))
    assert got == want


def test_ilike(spark):
    assert _one(spark, hf.ilike(F.lit("ABCdef"), "abc%")) is True
    assert _one(spark, hf.ilike(F.lit("xyz"), "abc%")) is False
