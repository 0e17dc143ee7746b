"""Micro-benchmark suite (src/benchmark/operators/* analog): every item
builds, executes, and reports a positive wall time."""

from __future__ import annotations
import pytest


# timing-oriented micro bench — deselected from the driver-window default run (pytest.ini / conftest);
# runs under HYRISE_SPARK_FULL_TESTS=1.
pytestmark = pytest.mark.slow


import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from tests.conftest import SF_DIR


def test_micro_bench_items_run(spark):
    from tools.micro_bench import build_items, run

    items = build_items(spark, SF_DIR)
    assert len(items) >= 14
    out = run(spark, SF_DIR, runs=1)
    assert set(out) == set(items)
    assert all(v > 0 for v in out.values())
