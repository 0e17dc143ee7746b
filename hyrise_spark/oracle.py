"""Order-insensitive result comparison (mimics the driver's t2 gate).

Reference parity: join_verification.hpp / sqlite_testrunner's result compare
(src/test/lib/sql/sqlite_testrunner/sqlite_testrunner.cpp) — canonicalize
column order, normalize scalar rendering, sort rows, diff.
"""

from __future__ import annotations

import decimal
import math


def normalize(v):
    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    if hasattr(v, "isoformat"):
        s = v.isoformat()
        return s[:10] if len(s) == 10 else s[:19]
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(normalize(x) for x in v) + "]"
    return str(v)


def canon(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(normalize(r[i]) for i in order) for r in rows)


def assert_matches_oracle(sdf, duck, oracle: str, name: str = "") -> None:
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols), f"{name}: column mismatch {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: rowcount {len(srows)} vs {len(orows)}"
    sc, oc = canon(scols, srows), canon(ocols, orows)
    for i, (a, b) in enumerate(zip(sc, oc)):
        assert a == b, f"{name}: first diff at sorted row {i}:\n spark : {a}\n duckdb: {b}"
