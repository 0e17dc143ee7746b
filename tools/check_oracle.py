"""Local driver-mimic: run each registered query on Spark AND its DuckDB
oracle, compare row count, column names and an order-insensitive value hash.

Usage:
    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import sys
import time
import traceback

import duckdb

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def normalize(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round defensively; queries already round explicitly
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    if hasattr(v, "isoformat"):  # date/datetime
        s = v.isoformat()
        return s[:10] if len(s) == 10 else s[:19]
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(normalize(x) for x in v) + "]"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(normalize(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--json", help="also write a driver-format per-query "
                    "JSON artifact (CORRECTNESS_LOCAL_r{N}.json)")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from hyrise_spark.session import get_spark
    from hyrise_spark.registry import all_queries

    spark = get_spark("check_oracle", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    qs = all_queries()
    names = args.names or sorted(qs)
    n_pass = n_fail = n_rows_only = 0
    report: dict[str, dict] = {}
    for name in names:
        qd = qs[name]
        t0 = time.time()
        try:
            sdf = qd.builder(spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": None,
                            "oracle_rows": None, "err": f"spark: {e}"}
            continue
        if qd.oracle is None:
            print(f"rows  {name}: {len(srows)} rows (no oracle)")
            n_rows_only += 1
            report[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": len(srows),
                            "oracle_rows": None, "err": None,
                            "rows_only": True}
            continue
        try:
            res = con.execute(qd.oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error {e}")
            n_fail += 1
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": len(srows),
                            "oracle_rows": None, "err": f"duckdb: {e}"}
            continue
        dt = time.time() - t0
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} duckdb={sorted(ocols)}")
        if not problems:
            sh, oh = value_hash(scols, srows), value_hash(ocols, orows)
            if sh != oh:
                problems.append(f"hash spark={sh} duckdb={oh}")
                # show a small diff
                so = sorted(
                    "|".join(normalize(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i]))
                    for r in srows
                )
                oo = sorted(
                    "|".join(normalize(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i]))
                    for r in orows
                )
                for a, b in list(zip(so, oo))[:200]:
                    if a != b:
                        print(f"   spark : {a}\n   duckdb: {b}")
                        break
        report[name] = {
            "rows_match": len(srows) == len(orows),
            "schema_match": sorted(scols) == sorted(ocols),
            "hash_match": not problems,
            "spark_rows": len(srows),
            "oracle_rows": len(orows),
            "err": "; ".join(problems) or None,
        }
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS  {name}  ({len(srows)} rows, {dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    if args.json:
        import json

        with open(args.json, "w") as fh:
            json.dump(report, fh, indent=1, sort_keys=True)
        print(f"wrote {args.json} ({len(report)} queries)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
