"""File-based benchmark runner — the reference BenchmarkRunner analog.

Reference: `src/benchmark/file_based_benchmark.cpp` discovers `*.sql` query
files and table files from directories and hands them to `BenchmarkRunner`
(src/benchmarklib/benchmark_runner.hpp), which warms up, times each item
over N runs, and (with `--verify`) cross-checks results against SQLite
(src/benchmarklib/sqlite_wrapper.hpp). This module does the same on Spark:

  * queries: every `<name>.sql` in --queries (multi-statement files run
    through Engine; the LAST statement's result is the benchmark item)
  * tables: every `<name>.parquet` / `.csv` / `.tbl` in --tables registers
    as a view named `<name>` (sources.read_any dispatch)
  * timing: one un-timed warmup run (codegen/broadcast priming), then
    --runs timed runs; per-item best and mean wall seconds
  * --verify: the same SQL runs on DuckDB over the same table files and the
    results hash-compare order-insensitively (the SQLite-verification
    analog; DuckDB is this repo's oracle engine throughout)

CLI:
    python -m hyrise_spark.benchmark_runner \
        --queries bench_queries/ --tables /root/testdata/sf0.01 \
        --runs 3 --verify

Output: one JSON object {"items": {name: {"best_s": .., "mean_s": ..,
"rows": .., "verified": true|false|null}}, "total_s": ..}.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

from pyspark.sql import SparkSession


def discover_queries(query_dir: str | Path) -> dict[str, str]:
    """name -> SQL text for every *.sql file (sorted, reference item order)."""
    return {
        p.stem: p.read_text().strip()
        for p in sorted(Path(query_dir).glob("*.sql"))
    }


def register_tables(spark: SparkSession, table_dir: str | Path) -> list[str]:
    """Register every table file in table_dir as a temp view named after the
    file stem. Parquet goes through catalog.load_tables (nanos handling);
    csv/tbl through sources.read_any."""
    from hyrise_spark.catalog import load_tables
    from hyrise_spark.sources import read_any

    table_dir = Path(table_dir)
    names: list[str] = []
    parquet = sorted(table_dir.glob("*.parquet"))
    if parquet:
        loaded = load_tables(spark, str(table_dir), tuple(p.stem for p in parquet))
        for name, df in loaded.items():
            df.createOrReplaceTempView(name)
            names.append(name)
    for p in sorted(table_dir.iterdir()):
        if p.suffix in (".csv", ".tbl") and p.stem not in names:
            read_any(spark, str(p)).createOrReplaceTempView(p.stem)
            names.append(p.stem)
    return names


def _verify_duckdb(table_dir: str | Path, sql: str, sdf) -> bool:
    """Run `sql` on DuckDB over the same table files; order-insensitive
    compare (BenchmarkRunner --verify / sqlite_wrapper analog)."""
    import duckdb

    from hyrise_spark.oracle import canon

    con = duckdb.connect()
    seen: set[str] = set()
    for p in sorted(Path(table_dir).glob("*.parquet")):
        con.execute(f"CREATE VIEW {p.stem} AS SELECT * FROM read_parquet('{p}')")
        seen.add(p.stem)
    for p in sorted(Path(table_dir).iterdir()):
        # csv/tbl tables register too, mirroring register_tables() on the
        # Spark side — previously --verify silently saw only parquet.
        if p.stem in seen:
            continue
        if p.suffix == ".csv":
            con.execute(f"CREATE VIEW {p.stem} AS SELECT * FROM read_csv_auto('{p}')")
            seen.add(p.stem)
        elif p.suffix == ".tbl":
            # Hyrise .tbl: row 1 = names, row 2 = types (load_table.hpp).
            with open(p) as fh:
                names = fh.readline().rstrip("\n").split("|")
            name_list = "[" + ", ".join(f"'{n}'" for n in names) + "]"
            con.execute(
                f"CREATE VIEW {p.stem} AS SELECT * FROM read_csv_auto("
                f"'{p}', delim='|', header=false, skip=2, nullstr='null', "
                f"names={name_list})"
            )
            seen.add(p.stem)
    res = con.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if sorted(scols) != sorted(ocols) or len(srows) != len(orows):
        return False
    return canon(scols, srows) == canon(ocols, orows)


def run(
    spark: SparkSession,
    query_dir: str | Path,
    table_dir: str | Path,
    runs: int = 3,
    verify: bool = False,
    clients: int = 1,
    discover_uccs: bool = False,
) -> dict:
    """Run every discovered query `runs` times; with clients > 1, the
    (query, run) stream is drained by a thread pool — the reference's
    multi-client benchmark mode (BenchmarkConfig::clients,
    benchmark_config.hpp:53). Spark executes concurrent driver threads as
    concurrent jobs, so this measures scheduler/queueing behavior, not just
    single-stream latency."""
    from hyrise_spark.engine import Engine

    engine = Engine(spark)
    for name in register_tables(spark, table_dir):
        # mirror the temp views into the Engine catalog so catalog-aware
        # features (meta tables, UCC discovery) see the benchmark tables
        if not engine.catalog.has_table(name):
            engine.catalog.add_table(name, spark.table(name))
    queries = discover_queries(query_dir)
    items: dict[str, dict] = {}
    t_total = time.perf_counter()

    # warmup + verification happen single-stream (deterministic)
    warm_rows: dict[str, int] = {}
    verified: dict[str, bool | None] = {}
    for name, sql in queries.items():
        df = engine.execute(sql)
        warm_rows[name] = len(df.collect()) if df is not None else 0
        verified[name] = (
            _verify_duckdb(table_dir, sql, df) if verify and df is not None else None
        )
    n_uccs = None
    if discover_uccs:
        # the reference UCC plugin's pre-benchmark hook
        # (ucc_discovery_plugin.cpp:82-88): after the warmup stream has
        # populated the statement log, discover+validate UCCs so the timed
        # runs benefit from the redundant-DISTINCT rewrite
        from hyrise_spark.ucc import discover_uccs as _discover
        from hyrise_spark.ucc import maybe_strip_redundant_distinct

        n_uccs = _discover(spark, engine.catalog)
        if verify:
            # Discovery ran AFTER the warmup-stream verification, so any
            # query the DISTINCT rewrite now changes was verified in its
            # un-rewritten form only. Re-verify those: execute through the
            # engine (rewrite applied) and compare against DuckDB running
            # the ORIGINAL statement — this checks the rewrite's soundness,
            # not just the original query's (ADVICE r6).
            for name, sql in queries.items():
                if maybe_strip_redundant_distinct(sql, engine.catalog) == sql:
                    continue
                df = engine.execute(sql)
                verified[name] = _verify_duckdb(table_dir, sql, df) if df is not None else None

    def timed(name: str) -> tuple[str, float]:
        t0 = time.perf_counter()
        df = engine.execute(queries[name])
        if df is not None:
            df.collect()
        return name, time.perf_counter() - t0

    stream = [name for name in queries for _ in range(runs)]
    times: dict[str, list[float]] = {name: [] for name in queries}
    if clients <= 1:
        results = map(timed, stream)
        for name, dt in results:
            times[name].append(dt)
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=clients) as pool:
            for name, dt in pool.map(timed, stream):
                times[name].append(dt)

    for name in queries:
        ts = sorted(times[name])
        items[name] = {
            "best_s": round(ts[0], 4),
            "median_s": round(ts[len(ts) // 2], 4),
            "mean_s": round(sum(ts) / len(ts), 4),
            "rows": warm_rows[name],
            "verified": verified[name],
        }
    out = {
        "items": items,
        "clients": clients,
        "total_s": round(time.perf_counter() - t_total, 3),
    }
    if n_uccs is not None:
        out["validated_uccs"] = n_uccs
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--queries", required=True, help="directory of *.sql files")
    ap.add_argument("--tables", required=True, help="directory of table files")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--verify", action="store_true", help="cross-check on DuckDB")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument(
        "--clients", type=int, default=1,
        help="parallel query streams (BenchmarkConfig::clients analog)",
    )
    ap.add_argument(
        "--discover-uccs", action="store_true",
        help="run UCC discovery after warmup (the UCC plugin's "
             "pre-benchmark hook analog)",
    )
    args = ap.parse_args(argv)

    from hyrise_spark.session import get_spark

    spark = get_spark(app_name="file_based_benchmark", cpus=args.cpus)
    result = run(
        spark, args.queries, args.tables,
        runs=args.runs, verify=args.verify, clients=args.clients,
        discover_uccs=args.discover_uccs,
    )
    print(json.dumps(result))
    if args.verify and any(v["verified"] is False for v in result["items"].values()):
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
