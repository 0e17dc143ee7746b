"""Rounding-margin audit for money aggregates over the JCC-H skewed copy.

For each audited (query, money expression, grouping), computes per group:
  n   = rows in the group
  S   = exact sum (doubles cast to DECIMAL(38,10) -- order-independent)
  err = |ordered double sum - S|  (the scale of cross-engine ordering delta)
  d   = distance of S to the nearest x.xx5 ROUND(...,2) boundary
A group is flagged RISK when err is not << d; d = 0 means the exact sum
sits ON the boundary and the rounded DOUBLE result is a per-run coin flip
(round-13 evidence behind the decimal-lattice fix in plans/tpch.py).
Run: python tools/margin_audit.py
"""
import duckdb, sys
sys.path.insert(0, ".")
SF = "/root/testdata/sf0.1"
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem".split():
    con.execute(f"CREATE VIEW {t}_base AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
for t in "region nation supplier part".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM {t}_base")
con.execute("CREATE VIEW lineitem AS SELECT l_orderkey, l_partkey, CASE WHEN l_orderkey % 4 <> 0 THEN 1 ELSE l_suppkey END AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate FROM lineitem_base")
con.execute("CREATE VIEW orders AS SELECT o_orderkey, CASE WHEN o_orderkey % 4 <> 0 THEN ((o_custkey - 1) % 25) + 1 ELSE o_custkey END AS o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM orders_base")
con.execute("CREATE VIEW customer AS SELECT c_custkey, c_name, CASE WHEN c_custkey % 4 <> 0 THEN 1 ELSE c_nationkey END AS c_nationkey, c_acctbal, c_mktsegment FROM customer_base")

D = "DECIMAL(38,10)"
def detail(name, money, inner_from, group_by, post=""):
    q = f"""
    WITH g AS (
      SELECT {group_by} AS k, COUNT(*) AS n,
             SUM(CAST(({money}) AS {D})) AS s_exact, SUM({money}) AS s_dbl
      FROM {inner_from} GROUP BY {group_by}
    )
    SELECT k, n, abs(s_dbl - CAST(s_exact AS DOUBLE)) AS err,
           abs(abs(CAST(s_exact AS DOUBLE))*100 - floor(abs(CAST(s_exact AS DOUBLE))*100) - 0.5)/100 AS d,
           s_exact
    FROM g {post}
    """
    print(f"--- {name}")
    for r in con.execute(q).fetchall():
        k, n, err, d, s = r
        flag = " <== RISK" if err > 0.2*d else ""
        print(f"  k={k} n={n} err={err:.2e} d={d:.2e} S={s}{flag}")

REV = "l_extendedprice * (1 - l_discount)"
detail("q01.charge", "l_extendedprice * (1 - l_discount) * (1 + l_tax)",
      "lineitem WHERE l_shipdate <= DATE '2001-09-02'", "l_returnflag, l_linestatus",
      "ORDER BY d")
detail("q08.vol", REV,
      """part JOIN lineitem ON p_partkey = l_partkey
         JOIN supplier ON s_suppkey = l_suppkey
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation n1 ON c_nationkey = n1.n_nationkey
         JOIN region ON n1.n_regionkey = r_regionkey
         JOIN nation n2 ON s_nationkey = n2.n_nationkey
         WHERE r_name = 'AMERICA' AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
           AND p_type = 'ECONOMY'""",
      "EXTRACT(YEAR FROM o_orderdate)")
# q08 also needs the NATION_3 numerator sums
detail("q08.num", "CASE WHEN n2.n_name = 'NATION_3' THEN l_extendedprice * (1 - l_discount) ELSE 0 END",
      """part JOIN lineitem ON p_partkey = l_partkey
         JOIN supplier ON s_suppkey = l_suppkey
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation n1 ON c_nationkey = n1.n_nationkey
         JOIN region ON n1.n_regionkey = r_regionkey
         JOIN nation n2 ON s_nationkey = n2.n_nationkey
         WHERE r_name = 'AMERICA' AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
           AND p_type = 'ECONOMY'""",
      "EXTRACT(YEAR FROM o_orderdate)")
detail("q10.rev(top25)", REV,
      """customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         WHERE o_orderdate >= DATE '1996-10-01' AND o_orderdate < DATE '1997-01-01'
           AND l_returnflag = 'R'""",
      "c_custkey", "ORDER BY s_exact DESC LIMIT 25")
detail("q15.rev(top3)", REV,
      """lineitem WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'""",
      "l_suppkey", "ORDER BY s_exact DESC LIMIT 3")
