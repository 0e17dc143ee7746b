"""Hyrise-compatible scalar function surface.

The reference's entire named-function vocabulary is three functions —
SUBSTR, CONCAT, ABS (/root/reference/src/lib/expression/
function_expression.hpp:14-18) — plus operators evaluated by its
ExpressionEvaluator (expression_evaluator.cpp): null-propagating arithmetic,
C++-truncating integer division, translation-time date-interval folding
(sql_translator.cpp:1943-1948, date_time_utils.hpp:20-30) and LIKE wildcard
matching compiled to regex (like_matcher.cpp).

These wrappers pin the *reference's* semantics on Spark columns where the
obvious Spark builtin differs (e.g. Spark's `/` on ints is double division;
hyrise's truncates). All are thin JVM-side expressions — no UDFs.
"""

from __future__ import annotations

import datetime as _dt
import re as _re

import pyspark.sql.functions as F
from pyspark.sql import Column


def substr(col: Column | str, start: int | Column, length: int | Column) -> Column:
    """1-based SUBSTR(s, start, len) (function_expression.hpp:15; SQL
    standard indexing — Spark's F.substring matches)."""
    return F.substring(col, start, length)


def concat(*cols: Column | str) -> Column:
    """CONCAT that propagates NULL if ANY argument is NULL — the reference's
    evaluator semantics (expression_evaluator.cpp:873-885). Spark's F.concat
    already null-propagates (unlike concat_ws / DuckDB's CONCAT)."""
    return F.concat(*cols)


def abs(col: Column | str) -> Column:  # noqa: A001 - mirrors the SQL name
    """ABS(x) (function_expression.hpp:17)."""
    return F.abs(col)


def int_div(a: Column, b: Column) -> Column:
    """Integer division with C++ truncation-toward-zero semantics
    (arithmetic_expression.hpp:12: hyrise `/` on two ints is int32 division).

    Spark's `a / b` is double division and `a div b` / F.floor differ for
    negative operands (floor rounds toward -inf; C++ truncates toward 0):
    -7 / 2 = -3 in hyrise/C++, but floor(-3.5) = -4.
    NULL-propagating; division by zero yields NULL (ANSI off).
    """
    q = a.cast("double") / b.cast("double")
    return F.when(q >= 0, F.floor(q)).otherwise(-F.floor(-q)).cast("long")


def mod(a: Column, b: Column) -> Column:
    """C++ `%` semantics: sign follows the dividend (types.hpp arithmetic).
    Spark's pmod is always-positive; `a % b` in Spark already matches C++."""
    return a % b


def date_interval(date_str: str, days: int = 0, months: int = 0, years: int = 0) -> str:
    """Translation-time date arithmetic: DATE '...' ± INTERVAL folds to a
    string constant before execution (sql_translator.cpp:1943-1948,
    date_time_utils.hpp:20-30 date_interval()). Mirrors that fold in Python
    so query builders embed plain literals — zero runtime cost, and the
    constant participates in parquet pushdown."""
    import calendar as _cal

    d = _dt.date.fromisoformat(date_str)
    y, m = divmod(d.month - 1 + months + 12 * years, 12)
    year, month = d.year + y, m + 1
    # Clamp to the target month's last day (Jan 31 + 1 month -> Feb 28/29),
    # matching boost::gregorian's snap-to-end-of-month used by the reference.
    day = min(d.day, _cal.monthrange(year, month)[1])
    d = _dt.date(year, month, day) + _dt.timedelta(days=days)
    return d.isoformat()


def like_to_regex(pattern: str) -> str:
    """Compile a SQL LIKE pattern (%/_ wildcards) to an anchored regex — the
    reference's LikeMatcher transformation (like_matcher.cpp). Useful for
    F.regexp_like when a single scan needs many patterns."""
    out = []
    for ch in pattern:
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(_re.escape(ch))
    return "^" + "".join(out) + "$"


def ilike(col: Column, pattern: str) -> Column:
    """Case-insensitive LIKE (PredicateCondition::LikeCaseInsensitive,
    types.hpp:172)."""
    return F.lower(col).rlike(like_to_regex(pattern.lower()))
