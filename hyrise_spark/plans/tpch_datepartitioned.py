"""Date-PARTITIONED-layout variant of TPC-H Q6 — directory pruning measured.

`layout.write_date_partitioned` is documented in SCALE.md §1 as the first
layout decision for a 100 TB time-series fact (a time-band predicate prunes
whole partitions before any file opens), and its PartitionFilters plan shape
is pinned in tests/test_layout.py — but until round 6 it had no BENCHED
query. This registers the exact tpch_q6 semantics against a month-
partitioned lineitem: the band predicate hits the `__pdate` partition
column (12 of ~84 month-directories survive) AND the original row predicate
for exactness inside the surviving months. Same oracle, same result;
bench.py builds the layout in its uncounted warm-up (the amortized
ingest-time cost), so the timing isolates the query-time win.

Reference analog: chunk pruning over per-chunk statistics
(chunk_pruning_rule.cpp) — here the pruning happens at directory-listing
time, one level earlier than row-group min/max.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

import hyrise_spark.plans.tpch  # noqa: F401  (registers the oracle we reuse)
from hyrise_spark.catalog import load_tables
from hyrise_spark.registry import _REGISTRY, register

R2 = 2


def ensure_date_partitioned(spark: SparkSession, sf_dir: str) -> str:
    """Create (once per warehouse x sf_dir) the month-partitioned lineitem
    managed table; returns its name. Idempotent."""
    from hyrise_spark.layout import write_date_partitioned

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:6]
    name = f"dp_{tag}_lineitem"
    if not spark.catalog.tableExists(name):
        li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
        write_date_partitioned(li, name, "l_shipdate", granularity="month")
    return name


@register(
    "tpch_q6_datepartitioned",
    oracle=_REGISTRY["tpch_q6"].oracle,
    tags=("tpch", "datepartitioned"),
)
def tpch_q6_datepartitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.table(ensure_date_partitioned(spark, sf_dir))
    return (
        li.filter(
            # partition-column band -> PartitionFilters (directory pruning);
            # month-truncated bounds are exactly the original year band
            (F.col("__pdate") >= F.lit("1996-01-01"))
            & (F.col("__pdate") < F.lit("1997-01-01"))
            # original row-level predicates keep the semantics exact
            & (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), R2).alias("revenue"))
    )
