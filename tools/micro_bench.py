"""Per-operator micro-benchmarks — the reference micro-benchmark suite analog.

Reference: `src/benchmark/operators/*_benchmark.cpp` (table_scan, projection,
join, aggregate, sort, union_all, difference, sql) time single operators on
generated tables via Google Benchmark. Same inventory here, timed on the
driver testdata with one warm run + N timed runs per item, noop-sink
materialization (full result, no driver funnel) — the methodology bench.py
uses for whole queries, applied to operator primitives:

  scan_full / scan_pushdown      table_scan_benchmark (cold vs predicate)
  scan_sorted_band               table_scan_sorted_benchmark (range on sorted col)
  projection_arithmetic          projection_benchmark
  join_broadcast / join_shuffle  join_benchmark (dim vs fact-fact)
  join_aggregate                 join_aggregate_benchmark
  aggregate_group / distinct     aggregate_benchmark
  sort_global / sort_topk        sort_benchmark
  union_all / difference         union_all/difference_benchmark
  sql_end_to_end                 sql_benchmark (spark.sql text path)

Run: python tools/micro_bench.py [--sf-dir DIR] [--cpus N] [--runs N]
Prints one JSON object {"items": {name: best_sec}, "sf_dir": ...}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F


def build_items(spark, sf_dir: str) -> dict:
    from hyrise_spark.catalog import load_tables

    t = load_tables(spark, sf_dir, ("lineitem", "orders", "customer", "nation", "part"))
    li, orders, cust, nation, part = (
        t["lineitem"], t["orders"], t["customer"], t["nation"], t["part"]
    )
    no_bc = {"spark.sql.autoBroadcastJoinThreshold": "-1"}
    return {
        "scan_full": (lambda: li.select("*"), {}),
        "scan_pushdown": (
            lambda: li.filter((F.col("l_quantity") < 5) & (F.col("l_discount") > 0.08)),
            {},
        ),
        "scan_sorted_band": (
            lambda: li.filter(F.col("l_shipdate").between("1997-01-01", "1997-01-31")),
            {},
        ),
        "projection_arithmetic": (
            lambda: li.select(
                (F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))).alias("net"),
                F.abs(F.col("l_quantity") - 25).alias("d"),
            ),
            {},
        ),
        "join_broadcast": (
            lambda: orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")),
            {},
        ),
        "join_shuffle": (
            lambda: li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")),
            no_bc,
        ),
        "join_aggregate": (
            lambda: li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev")),
            {},
        ),
        "aggregate_group": (
            lambda: li.groupBy("l_returnflag", "l_linestatus").agg(
                F.sum("l_quantity"), F.avg("l_extendedprice"), F.count(F.lit(1))
            ),
            {},
        ),
        "aggregate_distinct": (
            lambda: li.select(F.countDistinct("l_partkey"), F.countDistinct("l_suppkey")),
            {},
        ),
        "sort_global": (lambda: li.orderBy("l_extendedprice"), {}),
        "sort_topk": (lambda: li.orderBy(F.col("l_extendedprice").desc()).limit(100), {}),
        "union_all": (lambda: li.select("l_orderkey").union(li.select("l_partkey")), {}),
        "difference": (
            lambda: orders.select("o_custkey").exceptAll(
                cust.select("c_custkey").filter(F.col("c_custkey") % 2 == 0)
            ),
            {},
        ),
        "sql_end_to_end": (
            lambda: spark.sql(
                """
                SELECT n_name, ROUND(SUM(o_totalprice), 2) AS rev
                FROM orders JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey
                GROUP BY n_name ORDER BY rev DESC
                """
            ),
            {},
        ),
    }


def run(spark, sf_dir: str, runs: int = 3) -> dict:
    out: dict[str, float] = {}
    for name, (build, confs) in build_items(spark, sf_dir).items():
        saved = {k: spark.conf.get(k) for k in confs}
        for k, v in confs.items():
            spark.conf.set(k, v)
        try:
            build().write.format("noop").mode("overwrite").save()  # warm
            times = []
            for _ in range(runs):
                t0 = time.perf_counter()
                build().write.format("noop").mode("overwrite").save()
                times.append(time.perf_counter() - t0)
            times.sort()
            out[name] = round(times[len(times) // 2], 4)  # warm-run median
        finally:
            for k, v in saved.items():
                spark.conf.set(k, v)
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args(argv)

    from hyrise_spark.session import get_spark

    spark = get_spark("micro_bench", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    items = run(spark, args.sf_dir, runs=args.runs)
    print(json.dumps({"items": items, "sf_dir": args.sf_dir}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
