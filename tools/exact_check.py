"""Bit-exact Spark-vs-DuckDB differential for selected queries.

Stricter than tools/check_oracle.py: floats compare by full repr() (17
significant digits), not the %.6g canonicalization — this is the check
that would have caught the round-12 bench_jcch_q09 driver hash mismatch
locally. Use it for money aggregates / anything float-valued whose groups
the JCC-H skew fattens.

Usage:
    python tools/exact_check.py [--sf DIR] name [name...]
"""

from __future__ import annotations

import argparse
import decimal
import math
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full 17-digit shortest repr — bit-exact for doubles
    if isinstance(v, bool):
        return str(int(v))
    if hasattr(v, "isoformat"):
        s = v.isoformat()
        return s[:10] if len(s) == 10 else s[:19]
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(norm(r[i]) for i in order) for r in rows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", type=int, default=8,
                    help="core count — vary it to perturb Spark's summation "
                    "order (the driver checks at 32)")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from hyrise_spark.registry import all_queries
    from hyrise_spark.session import get_spark

    spark = get_spark("exact_check", cpus=args.cpus)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    qs = all_queries()
    failed = 0
    for name in args.names:
        qd = qs[name]
        sdf = qd.builder(spark, args.sf)
        srows = [tuple(r) for r in sdf.collect()]
        res = con.execute(qd.oracle)
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        sc, oc = canon(sdf.columns, srows), canon(ocols, orows)
        if len(sc) != len(oc):
            print(f"FAIL {name}: rowcount {len(sc)} vs {len(oc)}")
            failed += 1
            continue
        diffs = [(a, b) for a, b in zip(sc, oc) if a != b]
        if diffs:
            print(f"FAIL {name}: {len(diffs)}/{len(sc)} rows differ bit-exactly")
            for a, b in diffs[:5]:
                print(f"  spark : {a}\n  duckdb: {b}")
            failed += 1
        else:
            print(f"PASS {name} ({len(sc)} rows bit-exact)")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
