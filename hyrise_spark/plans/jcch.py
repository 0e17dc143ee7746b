"""JCC-H — skewed TPC-H, the reference's fourth benchmark suite.

The reference ships JCC-H table configs (resources/benchmark/jcch/*;
README.md:37-44): TPC-H with join-crossing correlations and heavy key skew
(Boncz et al., "JCC-H: adding join crossing correlations with skew to
TPC-H", TPCTC 2017). The driver's synthetic data is uniform, so these
queries INDUCE the JCC-H signature — one supplier receiving ~75% of all
lineitems — with a deterministic key rewrite, then run the two plans that
survive that skew at 100 TB:

  * two-phase (salted) aggregation: partial-agg on (key, salt) spreads the
    hot key over 8 reducers before the final combine;
  * salted shuffle join (operators/joins.py::salted_join): the hot fact side
    is salted and the dim replicated, so no single reducer owns the hot key.
    `shuffle_hash` hints keep Catalyst from broadcasting the toy-sized dim —
    at JCC-H scale the dim wouldn't be broadcastable, and the point is the
    shuffle-path behavior.

Both are oracle-checked against the PLAIN formulation (DuckDB) — salting
must never change results, only the shuffle layout. AQE skew-join splitting
(session.py) covers moderate skew; these are the explicit paths for
pathological keys (SCALE.md "Skew").
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hyrise_spark.catalog import load_tables
from hyrise_spark.operators.joins import salted_join
from hyrise_spark.registry import register

R2 = 2
_SALT = 8


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    tabs = load_tables(spark, sf_dir, names)
    return [tabs[n] for n in names]


def _skewed_lineitem(li: DataFrame) -> DataFrame:
    """JCC-H-style hot key: ~75% of lineitems redirected to supplier 1."""
    return li.select(
        F.when(F.col("l_orderkey") % 4 != 0, F.lit(1))
        .otherwise(F.col("l_suppkey"))
        .alias("s_suppkey"),
        "l_extendedprice",
    )


# --------------------------------------------------------------------------
@register(
    "jcch_skewed_group_agg",
    oracle="""
    SELECT skew_suppkey, CAST(COUNT(*) AS BIGINT) AS cnt,
           ROUND(SUM(l_extendedprice), 2) AS rev
    FROM (
      SELECT CASE WHEN l_orderkey % 4 <> 0 THEN 1 ELSE l_suppkey END AS skew_suppkey,
             l_extendedprice
      FROM lineitem
    )
    GROUP BY skew_suppkey ORDER BY skew_suppkey
    """,
    tags=("jcch",),
)
def jcch_skewed_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a hot key. Phase 1 groups on
    (key, salt) — the hot key's rows land on _SALT different reducers — and
    phase 2 combines the _SALT partials per key (tiny). Results are provably
    salt-invariant: SUM/COUNT re-associate."""
    (li,) = _t(spark, sf_dir, "lineitem")
    skewed = _skewed_lineitem(li).withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(_SALT))
    )
    partial = skewed.groupBy("s_suppkey", "__salt").agg(
        F.count(F.lit(1)).alias("pcnt"), F.sum("l_extendedprice").alias("prev")
    )
    return (
        partial.groupBy(F.col("s_suppkey").alias("skew_suppkey"))
        .agg(
            F.sum("pcnt").alias("cnt"),
            F.round(F.sum("prev"), R2).alias("rev"),
        )
        .orderBy("skew_suppkey")
    )


# --------------------------------------------------------------------------
@register(
    "jcch_skewed_salted_join",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS cnt,
           ROUND(SUM(l_extendedprice), 2) AS rev
    FROM (
      SELECT CASE WHEN l_orderkey % 4 <> 0 THEN 1 ELSE l_suppkey END AS sk,
             l_extendedprice
      FROM lineitem
    )
    JOIN supplier ON sk = s_suppkey
    GROUP BY s_name ORDER BY s_name
    """,
    tags=("jcch",),
)
def jcch_skewed_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key fact ⋈ dim through salted_join: the fact side gets a random
    salt, the dim is replicated _SALT times, the join runs on
    (key, salt) — the hot supplier's rows spread across _SALT reducers
    instead of melting one. Join output is independent of salt assignment,
    which the oracle (plain join) verifies."""
    li, supp = _t(spark, sf_dir, "lineitem", "supplier")
    skewed = _skewed_lineitem(li)
    joined = salted_join(
        skewed,
        supp.select("s_suppkey", "s_name").hint("shuffle_hash"),
        on="s_suppkey",
        salt=_SALT,
        how="inner",
    )
    return (
        joined.groupBy("s_name")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("l_extendedprice"), R2).alias("rev"),
        )
        .orderBy("s_name")
    )
