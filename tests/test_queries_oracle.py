"""Differential tests: every registered query vs its DuckDB oracle at sf0.001.

This is the pytest mirror of the driver's t2 gate (and of the reference's
SQLite-testrunner differential harness, SURVEY.md §5 layer 3).
"""

from __future__ import annotations

import pytest

# full-registry oracle differential (the driver runs the same differential itself; full sweep stays in the local target) — deselected from the driver-window default run (pytest.ini / conftest);
# runs under HYRISE_SPARK_FULL_TESTS=1.
pytestmark = pytest.mark.slow


from hyrise_spark.registry import all_queries
from tests.conftest import SF_DIR
from tests.oracle_utils import assert_matches_oracle

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    qd = QUERIES[name]
    df = qd.builder(spark, SF_DIR)
    if qd.oracle is None:
        # rows-only check (driver's weaker gate for non-SQL-expressible ops)
        assert df.count() >= 0
        return
    assert_matches_oracle(df, duck, qd.oracle, name)
