"""SQL-string corpus differential harness (SURVEY.md §5 layer 3).

The reference's SQLiteTestRunner executes a 518-line SQL corpus against both
Hyrise and SQLite (/root/reference/src/test/lib/sql/sqlite_testrunner/,
resources/test_data/sqlite_testrunner_queries.sql). This is its pytest
mirror: every corpus entry is ONE SQL string executed verbatim by BOTH
`spark.sql` and DuckDB over the same sf0.001 tables, results canonicalized
and compared. The corpus covers the declared SQL surface from SURVEY.md §2.2
(predicates, scalar expressions), §2.4 (aggregates/HAVING/DISTINCT), §2.5
(windows), §2.6 (sort/limit), §2.7 (set ops), plus subqueries/CTEs.

Dialect notes (cases deliberately excluded): CAST(double AS INT) rounds in
DuckDB but truncates in Spark; integer division operators differ (`//` vs
`div`) — the engine's declared surface uses CAST(FLOOR(...)) for those.

Accounting of reference-corpus lines NOT mirrored here (the remainder of
the 518-line file beyond this corpus's coverage):
  * DML + transaction sequences (reference lines ~329-367, 506-510:
    DELETE/UPDATE/INSERT chains, BEGIN..ROLLBACK..SELECT) — they mutate
    state so they don't fit THIS harness's one-string model; they have
    their own differential harness instead (tests/test_dml_differential.py:
    40+ sequences run verbatim on both the Engine and DuckDB, final states
    hash-compared, INCLUDING the BEGIN..ROLLBACK family verbatim with
    mid-transaction SELECT comparison — zero transaction lines excluded
    since round 8).
  * CREATE VIEW / CREATE TABLE sequences (lines ~369-380) — ditto;
    covered by test_engine.py (views, CTAS, IF NOT EXISTS).
  * SQLite integer-as-boolean rows (`WHERE 1 OR 3 > 2`, line 94) — both
    Spark and DuckDB reject bare integers as booleans; not part of the
    declared surface.
  * Outer-column-inside-subquery-PROJECTION scalar subqueries (lines
    385-386, 390) now run VERBATIM (table names remapped onto the sandbox
    schema like every corpus entry) through the ENGINE_CORPUS section
    below: Spark supports correlation only in predicates, so
    Engine._rewrite_correlated_scalar_projection hoists the additive
    outer terms out of the subquery (the reference's
    correlated_parameter_expression path, re-expressed as a text
    rewrite). The hoisted/predicate-correlated `ssq_*` forms remain as
    the plain-Spark corpus entries.
  * Encoding-sweep re-runs — the reference executes this same file once per
    segment encoding; the Spark axis is parquet's WRITE-TIME physical
    layout, swept in tests/test_encoding_sweep.py (codec x dictionary
    on/off over a representative corpus slice, results storage-invariant).
    The .bin segment encodings themselves are covered by tests/test_hybin.py
    + meta_segments.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, TABLES
from tests.oracle_utils import canon

CORPUS: dict[str, str] = {
    # ---- FROM-less / literals (DummyTableNode, static_table_node.hpp) ----
    "select_literal": "SELECT 1 AS x, 'a' AS s, 1.5 AS f",
    "select_arith": "SELECT 2 + 3 * 4 AS a, (2 + 3) * 4 AS b, 7.0 / 2 AS c, 7 % 2 AS d",
    "select_case_no_else": "SELECT CASE WHEN 1 = 2 THEN 'x' END AS c",
    # NB: CONCAT(x, NULL) is NULL in Spark (= hyrise's null-propagating
    # evaluator, expression_evaluator.cpp:873) but 'x' in DuckDB; `||` is
    # null-propagating in both, so the corpus pins that form.
    "null_propagation": "SELECT 1 + CAST(NULL AS INTEGER) AS a, 'x' || CAST(NULL AS VARCHAR(10)) AS b",
    # ---- scans / predicates (table_scan.hpp, types.hpp:160-178) ----------
    "scan_eq": "SELECT COUNT(*) AS n FROM part WHERE p_type = 'PROMO'",
    "scan_neq": "SELECT COUNT(*) AS n FROM part WHERE p_type <> 'PROMO'",
    "scan_range": "SELECT COUNT(*) AS n FROM part WHERE p_size >= 10 AND p_size < 20",
    "scan_between": "SELECT COUNT(*) AS n FROM part WHERE p_size BETWEEN 10 AND 20",
    "scan_not_between": "SELECT COUNT(*) AS n FROM part WHERE p_size NOT BETWEEN 10 AND 20",
    "scan_in": "SELECT COUNT(*) AS n FROM part WHERE p_brand IN ('Brand#1', 'Brand#7', 'Brand#19')",
    "scan_not_in": "SELECT COUNT(*) AS n FROM part WHERE p_brand NOT IN ('Brand#1', 'Brand#7')",
    "scan_like": "SELECT COUNT(*) AS n FROM part WHERE p_name LIKE '%red%'",
    "scan_like_underscore": "SELECT COUNT(*) AS n FROM region WHERE r_name LIKE 'A___%'",
    "scan_not_like": "SELECT COUNT(*) AS n FROM part WHERE p_name NOT LIKE 'red%'",
    "scan_ilike": "SELECT COUNT(*) AS n FROM part WHERE p_name ILIKE 'RED%'",
    "scan_or_3vl": "SELECT COUNT(*) AS n FROM part WHERE p_size > 45 OR p_type = 'PROMO'",
    "scan_not": "SELECT COUNT(*) AS n FROM part WHERE NOT (p_size > 45)",
    "scan_is_distinct_from": "SELECT COUNT(*) AS n FROM part WHERE p_type IS DISTINCT FROM 'PROMO'",
    # ---- scalar expressions (expression_evaluator.cpp dispatch) ----------
    "expr_substr": "SELECT p_partkey AS k, SUBSTR(p_name, 1, 3) AS s FROM part WHERE p_partkey <= 20",
    "expr_concat": "SELECT p_partkey AS k, CONCAT(p_brand, ':', p_type) AS s FROM part WHERE p_partkey <= 20",
    "expr_abs_neg": "SELECT p_partkey AS k, ABS(-p_size) AS a, -p_size AS m FROM part WHERE p_partkey <= 20",
    "expr_case_searched": """
        SELECT p_partkey AS k,
               CASE WHEN p_size < 10 THEN 'S' WHEN p_size < 30 THEN 'M' ELSE 'L' END AS bucket
        FROM part WHERE p_partkey <= 50""",
    "expr_coalesce_nullif": """
        SELECT p_partkey AS k, COALESCE(NULLIF(p_type, 'PROMO'), 'was_promo') AS t
        FROM part WHERE p_partkey <= 50""",
    "expr_string_funcs": """
        SELECT p_partkey AS k, UPPER(p_brand) AS u, LOWER(p_type) AS lo,
               LENGTH(p_name) AS len, TRIM(CONCAT(' ', p_name, ' ')) AS t,
               REPLACE(p_brand, 'Brand#', 'B') AS rep
        FROM part WHERE p_partkey <= 30""",
    "expr_math_funcs": """
        SELECT p_partkey AS k, ROUND(p_retailprice, 1) AS r, FLOOR(p_retailprice) AS fl,
               CEIL(p_retailprice) AS ce, MOD(p_size, 7) AS m,
               ROUND(POWER(p_size, 2), 2) AS sq, ROUND(SQRT(p_size), 4) AS sr
        FROM part WHERE p_partkey <= 30""",
    "expr_cast": """
        SELECT CAST('42' AS INTEGER) AS i, CAST(7 AS DOUBLE) AS d,
               CAST(p_size AS VARCHAR(10)) AS s, CAST(FLOOR(p_retailprice) AS BIGINT) AS b
        FROM part WHERE p_partkey <= 10""",
    "expr_extract": """
        SELECT o_orderkey AS k,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS y,
               CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS m,
               CAST(EXTRACT(DAY FROM o_orderdate) AS INTEGER) AS d,
               CAST(EXTRACT(HOUR FROM o_orderdate) AS INTEGER) AS h
        FROM orders WHERE o_orderkey <= 40""",
    "expr_date_arith": "SELECT CAST(DATE '1997-01-01' + INTERVAL 90 DAY AS DATE) AS d",
    "expr_date_compare": "SELECT COUNT(*) AS n FROM orders WHERE o_orderdate < DATE '1997-06-15'",
    # ---- aggregates (aggregate_hash.cpp; window_function_expression.hpp) -
    "agg_basic": """
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(o_totalprice), 2) AS s,
               ROUND(MIN(o_totalprice), 2) AS mn, ROUND(MAX(o_totalprice), 2) AS mx,
               ROUND(SUM(o_totalprice), 2) / COUNT(*) AS av
        FROM orders GROUP BY o_orderstatus""",
    "agg_count_distinct": """
        SELECT o_orderpriority, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS cd
        FROM orders GROUP BY o_orderpriority""",
    "agg_no_groupby": "SELECT CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(o_totalprice), 2) AS s FROM orders",
    "agg_empty_input": "SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(o_totalprice) AS s FROM orders WHERE o_orderkey < 0",
    "agg_having": """
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n FROM orders
        GROUP BY o_custkey HAVING COUNT(*) >= 8""",
    "agg_distinct_rows": "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    "agg_stddev": """
        SELECT o_orderstatus, ROUND(STDDEV_SAMP(o_totalprice), 2) AS sd
        FROM orders GROUP BY o_orderstatus""",
    "agg_expr_group_key": """
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS y, CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY 1""",
    "agg_rollup_sql": """
        SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""",
    "agg_filtered_avg": """
        SELECT ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS f_total
        FROM orders""",
    # ---- FILTER clause (SQL:2003 T612; shared dialect in both engines) ---
    "agg_filter_count": """
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(*) FILTER (WHERE o_totalprice > 100000) AS BIGINT) AS n_big
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "agg_filter_sum_mixed": """
        SELECT l_returnflag,
               ROUND(SUM(l_quantity) FILTER (WHERE l_discount > 0.05), 2) AS q_disc,
               ROUND(SUM(l_quantity) FILTER (WHERE l_discount <= 0.05), 2) AS q_nodisc
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "agg_filter_no_group": """
        SELECT CAST(COUNT(*) FILTER (WHERE p_size >= 25) AS BIGINT) AS big,
               CAST(COUNT(*) FILTER (WHERE p_size < 25) AS BIGINT) AS small,
               CAST(COUNT(DISTINCT p_brand) FILTER (WHERE p_type = 'PROMO') AS BIGINT) AS promo_brands
        FROM part""",
    # ---- joins in SQL (abstract_join_operator.hpp modes) -----------------
    "join_two_dims": """
        SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey
        ORDER BY n_name""",
    "join_left_null_fill": """
        SELECT c_custkey, o_orderkey FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey AND o_totalprice > 99999999
        WHERE c_custkey <= 30 ORDER BY c_custkey""",
    "join_self": """
        SELECT a.n_name AS n1, b.n_name AS n2 FROM nation a
        JOIN nation b ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey""",
    "join_using_where_syntax": """
        SELECT COUNT(*) AS n FROM customer, nation
        WHERE c_nationkey = n_nationkey AND n_name = 'NATION_3'""",
    # ---- sort / limit (sort.cpp; SortModes types.hpp:219) ----------------
    "sort_multi_key": """
        SELECT o_orderstatus, o_orderpriority, o_orderkey FROM orders
        WHERE o_orderkey <= 100
        ORDER BY o_orderstatus ASC, o_orderpriority DESC, o_orderkey""",
    "sort_nulls_first": """
        SELECT lk FROM (SELECT CASE WHEN o_orderkey % 10 = 0 THEN NULL ELSE o_orderkey END AS lk
                        FROM orders WHERE o_orderkey <= 50) t
        ORDER BY lk ASC NULLS FIRST""",
    "sort_nulls_last_desc": """
        SELECT lk FROM (SELECT CASE WHEN o_orderkey % 10 = 0 THEN NULL ELSE o_orderkey END AS lk
                        FROM orders WHERE o_orderkey <= 50) t
        ORDER BY lk DESC NULLS LAST""",
    "topk": """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS p FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""",
    # ---- set operations (§2.7) -------------------------------------------
    "union_all": """
        SELECT n_regionkey AS k FROM nation WHERE n_nationkey < 5
        UNION ALL SELECT r_regionkey AS k FROM region""",
    "union_distinct": """
        SELECT n_regionkey AS k FROM nation UNION SELECT r_regionkey AS k FROM region""",
    "intersect_": """
        SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 10
        INTERSECT SELECT n_nationkey AS k FROM nation WHERE n_nationkey >= 5""",
    "except_": """
        SELECT n_nationkey AS k FROM nation
        EXCEPT SELECT n_nationkey AS k FROM nation WHERE n_nationkey >= 5""",
    # ---- subqueries (in_expression.hpp, exists_expression.hpp) -----------
    "subq_scalar": """
        SELECT COUNT(*) AS n FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)""",
    "subq_in": """
        SELECT COUNT(*) AS n FROM customer
        WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)""",
    "subq_not_in": """
        SELECT COUNT(*) AS n FROM customer
        WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)""",
    "subq_exists_correlated": """
        SELECT COUNT(*) AS n FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')""",
    "subq_not_exists_correlated": """
        SELECT COUNT(*) AS n FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""",
    "subq_correlated_scalar": """
        SELECT c_custkey FROM customer c
        WHERE c_acctbal > (SELECT 2 * AVG(o_totalprice) FROM orders o
                           WHERE o.o_custkey = c.c_custkey)
        ORDER BY c_custkey""",
    "subq_from_clause": """
        SELECT t.o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT * FROM orders WHERE o_totalprice > 1000) t
        GROUP BY t.o_orderstatus""",
    # ---- CTEs (sql_translator.cpp:502) -----------------------------------
    "cte_simple": """
        WITH big AS (SELECT * FROM orders WHERE o_totalprice > 5000)
        SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n FROM big GROUP BY o_orderstatus""",
    "cte_chained": """
        WITH a AS (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey),
             b AS (SELECT * FROM a WHERE n >= 5)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_heavy FROM b""",
    # ---- additional edge cases -------------------------------------------
    "in_list_with_null_3vl": """
        SELECT COUNT(*) AS n FROM part WHERE p_size IN (1, 2, NULL)""",
    "not_in_list_with_null_3vl": """
        SELECT COUNT(*) AS n FROM part WHERE p_size NOT IN (1, 2, NULL)""",
    "scalar_subquery_in_select": """
        SELECT r_name,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM nation WHERE n_regionkey = r_regionkey) AS n_nations
        FROM region ORDER BY r_name""",
    "cte_referenced_twice": """
        WITH s AS (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_above
        FROM s WHERE n > (SELECT SUM(n) / COUNT(*) FROM s)""",
    "limit_offset": """
        SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 10 OFFSET 25""",
    "order_by_expression": """
        SELECT p_partkey, p_size FROM part WHERE p_partkey <= 50
        ORDER BY p_size * -1, p_partkey""",
    "boolean_precedence": """
        SELECT COUNT(*) AS n FROM part
        WHERE p_size < 10 OR p_size > 40 AND p_type = 'PROMO'""",
    "nested_derived_tables": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM (
          SELECT * FROM (SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 100) a
          WHERE o_custkey % 2 = 0) b""",
    "exists_or_predicate": """
        SELECT COUNT(*) AS n FROM customer c
        WHERE c_acctbal > 9000
           OR EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > 9000)""",
    "union_inside_cte": """
        WITH keys AS (
          SELECT n_nationkey AS k FROM nation WHERE n_regionkey = 0
          UNION SELECT n_nationkey AS k FROM nation WHERE n_regionkey = 1
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer WHERE c_nationkey IN (SELECT k FROM keys)""",
    # ---- window functions in SQL (§2.5) ----------------------------------
    "win_range_frame": """
        SELECT o_orderkey,
               CAST(COUNT(*) OVER (ORDER BY o_totalprice
                    RANGE BETWEEN 100 PRECEDING AND 100 FOLLOWING) AS BIGINT) AS near_n
        FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""",
    "win_first_last_value": """
        SELECT o_orderkey,
               FIRST_VALUE(o_orderkey) OVER w AS first_k,
               LAST_VALUE(o_orderkey) OVER w AS last_k
        FROM orders WHERE o_custkey <= 20
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY o_orderkey""",
    "win_ntile": """
        SELECT o_orderkey, NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
        FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey""",
    "win_row_number": """
        SELECT o_orderkey, rn FROM (
          SELECT o_orderkey,
                 ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) t
        WHERE rn <= 3 ORDER BY o_orderkey""",
    "win_running_sum": """
        SELECT o_orderkey,
               ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                     ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS rt
        FROM orders WHERE o_custkey <= 20 ORDER BY o_orderkey""",
    "win_lag_lead": """
        SELECT o_orderkey,
               LAG(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_k,
               LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS next_k
        FROM orders WHERE o_custkey <= 20 ORDER BY o_orderkey""",
    "win_rank_dense": """
        SELECT o_orderkey, RANK() OVER w AS rk, DENSE_RANK() OVER w AS drk
        FROM orders WHERE o_orderkey <= 200
        WINDOW w AS (ORDER BY o_orderpriority)
        ORDER BY o_orderkey""",
}


# ---------------------------------------------------------------------------
# Systematic families (round 4): widen the corpus toward the reference's
# 518-statement sqlite_testrunner breadth. Each entry is still ONE SQL string
# in the shared Spark/DuckDB dialect, executed verbatim by both engines.
# ---------------------------------------------------------------------------

# Comparison-operator matrix over numeric and string columns (table_scan
# col-vs-value impls, types.hpp:160-178).
for _op, _tag in (("=", "eq"), ("<>", "ne"), ("<", "lt"), ("<=", "le"),
                  (">", "gt"), (">=", "ge")):
    CORPUS[f"cmp_int_{_tag}"] = (
        f"SELECT COUNT(*) AS n FROM part WHERE p_size {_op} 25"
    )
    CORPUS[f"cmp_str_{_tag}"] = (
        f"SELECT COUNT(*) AS n FROM nation WHERE n_name {_op} 'NATION_2'"
    )
    CORPUS[f"cmp_float_{_tag}"] = (
        f"SELECT COUNT(*) AS n FROM customer WHERE c_acctbal {_op} 5000.0"
    )
    CORPUS[f"cmp_colcol_{_tag}"] = (
        f"SELECT COUNT(*) AS n FROM lineitem WHERE l_discount {_op} l_tax"
    )

# Aggregate-function matrix x grouping shapes (aggregate_hash.cpp).
for _fn, _tag, _nd in (("SUM", "sum", 2), ("MIN", "min", 2), ("MAX", "max", 2),
                       ("STDDEV_SAMP", "stddev", 2), ("VAR_SAMP", "var", 1)):
    CORPUS[f"aggm_{_tag}_flag"] = (
        f"SELECT l_returnflag, ROUND({_fn}(l_quantity), {_nd}) AS v "
        "FROM lineitem GROUP BY l_returnflag"
    )
    CORPUS[f"aggm_{_tag}_global"] = (
        f"SELECT ROUND({_fn}(l_quantity), {_nd}) AS v FROM lineitem"
    )
for _fn, _tag in (("COUNT", "count"),):
    CORPUS[f"aggm_{_tag}_flag"] = (
        f"SELECT l_returnflag, CAST({_fn}(l_quantity) AS BIGINT) AS v "
        "FROM lineitem GROUP BY l_returnflag"
    )
CORPUS["aggm_avg_exact"] = (
    "SELECT l_returnflag, ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)"
    " / COUNT(*), 2) AS v FROM lineitem GROUP BY l_returnflag"
)
CORPUS["aggm_bool"] = (
    "SELECT l_returnflag, BOOL_AND(l_quantity > 0) AS ba, BOOL_OR(l_discount > 0.09) AS bo "
    "FROM lineitem GROUP BY l_returnflag"
)
CORPUS["aggm_filter_clause"] = (
    "SELECT CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS nf, "
    "CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS no_ FROM orders"
)
CORPUS["aggm_sum_filter"] = (
    "SELECT ROUND(SUM(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT'), 2) AS s "
    "FROM orders"
)
CORPUS["aggm_count_star_vs_col"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS all_rows, "
    "CAST(COUNT(CASE WHEN o_orderkey % 10 = 0 THEN NULL ELSE o_orderkey END) AS BIGINT) AS non_null "
    "FROM orders WHERE o_orderkey <= 200"
)

# Join-mode matrix on the dims (abstract_join_operator.hpp modes).
CORPUS["joinm_inner"] = (
    "SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey "
    "WHERE n_nationkey < 8 ORDER BY n_name"
)
CORPUS["joinm_left"] = (
    "SELECT n_name, r_name FROM nation LEFT JOIN region "
    "ON n_regionkey = r_regionkey AND r_regionkey < 2 ORDER BY n_name"
)
CORPUS["joinm_right"] = (
    "SELECT n_name, r_name FROM nation RIGHT JOIN region "
    "ON n_regionkey = r_regionkey AND n_nationkey < 3 ORDER BY r_name, n_name"
)
CORPUS["joinm_full"] = (
    "SELECT n_name, r_name FROM nation FULL JOIN region "
    "ON n_regionkey = r_regionkey AND n_nationkey < 3 ORDER BY r_name, n_name"
)
CORPUS["joinm_cross_small"] = (
    "SELECT a.r_name AS r1, b.r_name AS r2 FROM region a CROSS JOIN region b "
    "ORDER BY r1, r2"
)
CORPUS["joinm_semi_exists"] = (
    "SELECT r_name FROM region r WHERE EXISTS "
    "(SELECT 1 FROM nation n WHERE n.n_regionkey = r.r_regionkey AND n.n_nationkey > 20) "
    "ORDER BY r_name"
)
CORPUS["joinm_anti_not_exists"] = (
    "SELECT r_name FROM region r WHERE NOT EXISTS "
    "(SELECT 1 FROM nation n WHERE n.n_regionkey = r.r_regionkey AND n.n_nationkey > 20) "
    "ORDER BY r_name"
)
CORPUS["joinm_theta_ineq"] = (
    "SELECT COUNT(*) AS n FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey"
)
CORPUS["joinm_multi_cond"] = (
    "SELECT COUNT(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "AND l_shipdate > o_orderdate"
)
CORPUS["joinm_three_way"] = (
    "SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n FROM customer "
    "JOIN nation ON c_nationkey = n_nationkey "
    "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name ORDER BY r_name"
)

# Window-function matrix (window_function_evaluator parity, plans/windows.py).
for _fn, _tag in (("ROW_NUMBER()", "row_number"), ("RANK()", "rank"),
                  ("DENSE_RANK()", "dense_rank"), ("NTILE(4)", "ntile")):
    CORPUS[f"winm_{_tag}"] = (
        f"SELECT o_orderkey, CAST({_fn} OVER (PARTITION BY o_orderstatus "
        "ORDER BY o_orderkey) AS INTEGER) AS w "
        "FROM orders WHERE o_orderkey <= 120 ORDER BY o_orderkey"
    )
for _fn, _tag in (("PERCENT_RANK()", "percent_rank"), ("CUME_DIST()", "cume_dist")):
    CORPUS[f"winm_{_tag}"] = (
        f"SELECT o_orderkey, ROUND({_fn} OVER (PARTITION BY o_orderstatus "
        "ORDER BY o_orderkey), 6) AS w "
        "FROM orders WHERE o_orderkey <= 120 ORDER BY o_orderkey"
    )
CORPUS["winm_first_last_value"] = (
    "SELECT o_orderkey, FIRST_VALUE(o_orderkey) OVER w AS fv, "
    "LAST_VALUE(o_orderkey) OVER w AS lv FROM orders WHERE o_orderkey <= 80 "
    "WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) ORDER BY o_orderkey"
)
CORPUS["winm_nth_value"] = (
    "SELECT o_orderkey, NTH_VALUE(o_orderkey, 2) OVER "
    "(PARTITION BY o_orderstatus ORDER BY o_orderkey "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nv "
    "FROM orders WHERE o_orderkey <= 80 ORDER BY o_orderkey"
)
CORPUS["winm_rows_sliding"] = (
    "SELECT o_orderkey, ROUND(SUM(o_totalprice) OVER (ORDER BY o_orderkey "
    "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS s "
    "FROM orders WHERE o_orderkey <= 60 ORDER BY o_orderkey"
)
CORPUS["winm_rows_following"] = (
    "SELECT o_orderkey, ROUND(SUM(o_totalprice) OVER (ORDER BY o_orderkey "
    "ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING), 2) AS s "
    "FROM orders WHERE o_orderkey <= 60 ORDER BY o_orderkey"
)
CORPUS["winm_range_unbounded"] = (
    "SELECT o_orderkey, ROUND(SUM(o_totalprice) OVER (ORDER BY o_orderkey "
    "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS s "
    "FROM orders WHERE o_orderkey <= 60 ORDER BY o_orderkey"
)
CORPUS["winm_lag_default"] = (
    "SELECT o_orderkey, LAG(o_orderkey, 2, -1) OVER (ORDER BY o_orderkey) AS p "
    "FROM orders WHERE o_orderkey <= 40 ORDER BY o_orderkey"
)
CORPUS["winm_lead_default"] = (
    "SELECT o_orderkey, LEAD(o_orderkey, 3, -1) OVER (ORDER BY o_orderkey) AS nx "
    "FROM orders WHERE o_orderkey <= 40 ORDER BY o_orderkey"
)
CORPUS["winm_multiple_windows"] = (
    "SELECT o_orderkey, CAST(ROW_NUMBER() OVER (ORDER BY o_orderkey) AS INTEGER) AS a, "
    "CAST(ROW_NUMBER() OVER (ORDER BY o_orderkey DESC) AS INTEGER) AS b "
    "FROM orders WHERE o_orderkey <= 40 ORDER BY o_orderkey"
)
CORPUS["winm_agg_and_window"] = (
    "SELECT o_orderstatus, ROUND(SUM(s) OVER (ORDER BY o_orderstatus "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running FROM "
    "(SELECT o_orderstatus, SUM(o_totalprice) AS s FROM orders GROUP BY o_orderstatus) t "
    "ORDER BY o_orderstatus"
)

# String-function matrix (expression_evaluator string dispatch).
CORPUS["strm_left_right"] = (
    "SELECT n_name, LEFT(n_name, 3) AS l3, RIGHT(n_name, 2) AS r2 FROM nation "
    "ORDER BY n_name"
)
CORPUS["strm_lpad_rpad"] = (
    "SELECT r_name, LPAD(r_name, 12, '.') AS lp, RPAD(r_name, 12, '.') AS rp "
    "FROM region ORDER BY r_name"
)
CORPUS["strm_repeat_reverse"] = (
    "SELECT r_name, REPEAT(r_name, 2) AS rp, REVERSE(r_name) AS rv FROM region "
    "ORDER BY r_name"
)
CORPUS["strm_ltrim_rtrim"] = (
    "SELECT LTRIM('  x  ') AS l, RTRIM('  x  ') AS r, TRIM('  x  ') AS t"
)
CORPUS["strm_position"] = (
    "SELECT n_name, CAST(POSITION('_' IN n_name) AS INTEGER) AS pos FROM nation "
    "ORDER BY n_name"
)
CORPUS["strm_split_part"] = (
    "SELECT n_name, SPLIT_PART(n_name, '_', 2) AS num FROM nation ORDER BY n_name"
)
CORPUS["strm_contains_like"] = (
    "SELECT COUNT(*) AS n FROM part WHERE p_name LIKE '%a%e%'"
)
CORPUS["strm_like_escape"] = (
    "SELECT COUNT(*) AS n FROM nation WHERE n_name LIKE 'NATION!_1%' ESCAPE '!'"
)
CORPUS["strm_upper_lower_mix"] = (
    "SELECT UPPER(LOWER(r_name)) AS u FROM region ORDER BY u"
)
CORPUS["strm_concat_ws"] = (
    "SELECT CONCAT_WS('-', r_name, CAST(r_regionkey AS VARCHAR(5))) AS s "
    "FROM region ORDER BY s"
)
CORPUS["strm_substr_negative_start"] = (
    "SELECT SUBSTR('abcdef', 2) AS tail_, SUBSTR('abcdef', 2, 3) AS mid_"
)
CORPUS["strm_nested"] = (
    "SELECT UPPER(SUBSTR(p_name, 1, 4)) AS s, LENGTH(TRIM(p_name)) AS n "
    "FROM part WHERE p_partkey <= 25 ORDER BY p_partkey"
)

# Math-function matrix.
CORPUS["mathm_exp_ln"] = (
    "SELECT p_size, ROUND(EXP(1.0), 6) AS e, ROUND(LN(p_size), 6) AS ln_ "
    "FROM part WHERE p_partkey <= 20 ORDER BY p_partkey"
)
CORPUS["mathm_log10_log2"] = (
    "SELECT ROUND(LOG10(1000.0), 6) AS l10, ROUND(LOG2(8.0), 6) AS l2"
)
CORPUS["mathm_trig"] = (
    "SELECT ROUND(SIN(0.5), 8) AS s, ROUND(COS(0.5), 8) AS c, ROUND(ATAN(1.0), 8) AS a"
)
CORPUS["mathm_sign"] = (
    "SELECT SIGN(-5.0) AS sn, SIGN(0.0) AS sz, SIGN(7.5) AS sp"
)
CORPUS["mathm_greatest_least"] = (
    "SELECT GREATEST(p_size, 25) AS g, LEAST(p_size, 25) AS l FROM part "
    "WHERE p_partkey <= 20 ORDER BY p_partkey"
)
CORPUS["mathm_pi_trunc"] = "SELECT ROUND(PI(), 8) AS p"
CORPUS["mathm_mod_negative"] = "SELECT MOD(-7, 3) AS a, MOD(7, -3) AS b"
CORPUS["mathm_power_sqrt_chain"] = (
    "SELECT ROUND(SQRT(POWER(3.0, 4)), 6) AS v"
)

# Date/time-function matrix (NTZ-safe; o_orderdate is TIMESTAMP both sides).
CORPUS["datem_trunc_month"] = (
    "SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS m, CAST(COUNT(*) AS BIGINT) AS n "
    "FROM orders WHERE o_orderkey <= 500 GROUP BY 1 ORDER BY m"
)
CORPUS["datem_trunc_quarter_year"] = (
    "SELECT CAST(DATE_TRUNC('quarter', o_orderdate) AS TIMESTAMP) AS q, CAST(DATE_TRUNC('year', o_orderdate) AS TIMESTAMP) AS y "
    "FROM orders WHERE o_orderkey <= 20 ORDER BY o_orderkey"
)
CORPUS["datem_extract_quarter_week"] = (
    "SELECT o_orderkey, CAST(EXTRACT(QUARTER FROM o_orderdate) AS INTEGER) AS q, "
    "CAST(EXTRACT(WEEK FROM o_orderdate) AS INTEGER) AS w "
    "FROM orders WHERE o_orderkey <= 40 ORDER BY o_orderkey"
)
CORPUS["datem_last_day"] = (
    "SELECT CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS DATE) AS ld "
    "FROM orders WHERE o_orderkey <= 20 ORDER BY o_orderkey"
)
CORPUS["datem_interval_add_sub"] = (
    "SELECT CAST(DATE '1997-03-15' + INTERVAL 45 DAY AS DATE) AS plus_d, "
    "CAST(DATE '1997-03-15' - INTERVAL 2 MONTH AS DATE) AS minus_m"
)
CORPUS["datem_between_timestamps"] = (
    "SELECT COUNT(*) AS n FROM orders WHERE o_orderdate "
    "BETWEEN TIMESTAMP '1997-01-01 00:00:00' AND TIMESTAMP '1997-06-30 23:59:59'"
)
CORPUS["datem_group_by_year_month"] = (
    "SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS y, "
    "CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS m, "
    "CAST(COUNT(*) AS BIGINT) AS n FROM orders GROUP BY 1, 2 ORDER BY y, m"
)
CORPUS["datem_compare_cols"] = (
    "SELECT COUNT(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY"
)

# NULL semantics / conditional matrix (3VL, expression_evaluator.cpp).
CORPUS["nullm_is_null_count"] = (
    "SELECT CAST(SUM(CASE WHEN NULLIF(o_orderstatus, 'P') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n "
    "FROM orders"
)
CORPUS["nullm_coalesce_chain"] = (
    "SELECT COALESCE(NULL, NULL, 3) AS a, COALESCE(NULL, 'x') AS b"
)
CORPUS["nullm_ifnull"] = "SELECT IFNULL(NULL, 9) AS a, IFNULL(4, 9) AS b"
CORPUS["nullm_and_or_3vl"] = (
    "SELECT (TRUE AND NULL) IS NULL AS a, (FALSE AND NULL) = FALSE AS b, "
    "(TRUE OR NULL) = TRUE AS c, (FALSE OR NULL) IS NULL AS d"
)
CORPUS["nullm_arith_propagates"] = (
    "SELECT 1 + CAST(NULL AS INTEGER) AS a, CAST(NULL AS DOUBLE) * 2 AS b"
)
CORPUS["nullm_in_with_null_match"] = (
    "SELECT 3 IN (1, 2, 3) AS hit_"
)
CORPUS["nullm_case_null_branch"] = (
    "SELECT CASE WHEN CAST(NULL AS BOOLEAN) THEN 'never' ELSE 'else_taken' END AS v"
)
CORPUS["nullm_try_cast"] = (
    "SELECT TRY_CAST('123' AS INTEGER) AS ok_, TRY_CAST('abc' AS INTEGER) AS bad_"
)

# GROUP BY extensions (analytic.py surface in plain SQL).
CORPUS["grpx_cube"] = (
    "SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n "
    "FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority) "
    "ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"
)
CORPUS["grpx_grouping_sets"] = (
    "SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n "
    "FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ()) "
    "ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"
)
CORPUS["grpx_grouping_fn"] = (
    "SELECT o_orderstatus, CAST(GROUPING(o_orderstatus) AS INTEGER) AS g, "
    "CAST(COUNT(*) AS BIGINT) AS n "
    "FROM orders GROUP BY ROLLUP (o_orderstatus) ORDER BY o_orderstatus NULLS FIRST"
)
CORPUS["grpx_having_on_agg"] = (
    "SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS s FROM orders "
    "GROUP BY o_custkey HAVING SUM(o_totalprice) > 50000 ORDER BY o_custkey"
)
CORPUS["grpx_having_count_distinct"] = (
    "SELECT o_custkey FROM orders GROUP BY o_custkey "
    "HAVING COUNT(DISTINCT o_orderpriority) = 5 ORDER BY o_custkey"
)

# ORDER BY / LIMIT / OFFSET matrix.
CORPUS["lim_offset"] = (
    "SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 5 OFFSET 10"
)
CORPUS["lim_zero"] = "SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 0"
CORPUS["lim_larger_than_input"] = (
    "SELECT r_regionkey FROM region ORDER BY r_regionkey LIMIT 100"
)
CORPUS["lim_order_by_expr"] = (
    "SELECT n_name FROM nation ORDER BY LENGTH(n_name), n_name LIMIT 10"
)
CORPUS["lim_order_by_alias"] = (
    "SELECT n_nationkey * 2 AS dk FROM nation ORDER BY dk DESC LIMIT 5"
)

# Set-op matrix (union_all.hpp, difference.hpp, intersect_node.hpp).
CORPUS["setm_union_all_dups"] = (
    "SELECT r_regionkey AS k FROM region UNION ALL SELECT r_regionkey AS k FROM region "
    "ORDER BY k"
)
CORPUS["setm_union_mixed_width"] = (
    "SELECT n_nationkey AS k, n_name AS s FROM nation WHERE n_nationkey < 3 "
    "UNION SELECT r_regionkey AS k, r_name AS s FROM region ORDER BY k, s"
)
CORPUS["setm_intersect_empty"] = (
    "SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 5 "
    "INTERSECT SELECT n_nationkey AS k FROM nation WHERE n_nationkey > 20"
)
CORPUS["setm_except_all_of_them"] = (
    "SELECT r_regionkey AS k FROM region EXCEPT SELECT r_regionkey AS k FROM region"
)
CORPUS["setm_chained"] = (
    "SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 10 "
    "UNION SELECT n_nationkey AS k FROM nation WHERE n_nationkey BETWEEN 8 AND 12 "
    "ORDER BY k"
)
CORPUS["setm_union_in_subquery"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ("
    "SELECT n_regionkey AS k FROM nation UNION SELECT r_regionkey AS k FROM region) t"
)

# Subquery/CTE matrix.
CORPUS["subm_scalar_in_select"] = (
    "SELECT r_name, (SELECT CAST(COUNT(*) AS BIGINT) FROM nation) AS total_nations "
    "FROM region ORDER BY r_name"
)
CORPUS["subm_correlated_in_select"] = (
    "SELECT r_name, (SELECT CAST(COUNT(*) AS BIGINT) FROM nation n "
    "WHERE n.n_regionkey = r.r_regionkey) AS n_nations FROM region r ORDER BY r_name"
)
CORPUS["subm_in_with_predicate"] = (
    "SELECT COUNT(*) AS n FROM orders WHERE o_custkey IN "
    "(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')"
)
CORPUS["subm_nested_two_deep"] = (
    "SELECT COUNT(*) AS n FROM customer WHERE c_nationkey IN "
    "(SELECT n_nationkey FROM nation WHERE n_regionkey IN "
    "(SELECT r_regionkey FROM region WHERE r_name = 'ASIA'))"
)
CORPUS["subm_cte_referenced_twice"] = (
    "WITH t AS (SELECT o_custkey AS ck, SUM(o_totalprice) AS s FROM orders GROUP BY 1) "
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM t a JOIN t b ON a.ck = b.ck"
)
CORPUS["subm_cte_chain"] = (
    "WITH a AS (SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 10), "
    "b AS (SELECT k FROM a WHERE k % 2 = 0) "
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM b"
)
CORPUS["subm_derived_join"] = (
    "SELECT t.y, CAST(COUNT(*) AS BIGINT) AS n FROM "
    "(SELECT o_orderkey, CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS y FROM orders) t "
    "JOIN lineitem ON t.o_orderkey = l_orderkey GROUP BY t.y ORDER BY t.y"
)
CORPUS["subm_values_inline"] = (
    "SELECT * FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c')) AS t(k, s) ORDER BY k"
)

# CAST matrix (shared-dialect members of the 5-type system).
CORPUS["castm_int_widening"] = (
    "SELECT CAST(p_size AS BIGINT) AS b, CAST(p_size AS DOUBLE) AS d "
    "FROM part WHERE p_partkey <= 10 ORDER BY p_partkey"
)
CORPUS["castm_string_roundtrip"] = (
    "SELECT CAST(CAST(p_size AS VARCHAR(10)) AS INTEGER) AS v "
    "FROM part WHERE p_partkey <= 10 ORDER BY p_partkey"
)
CORPUS["castm_float_to_string_stable"] = (
    "SELECT CAST(CAST(2.5 AS DOUBLE) AS VARCHAR(10)) AS s"
)
CORPUS["castm_bool_literal"] = "SELECT TRUE AS t, FALSE AS f, NOT TRUE AS nt"
CORPUS["castm_date_string"] = (
    "SELECT CAST('1997-06-15' AS DATE) AS d, CAST(DATE '1997-06-15' AS VARCHAR(10)) AS s"
)

# Complex compositions (multi-feature statements like the testrunner tail).
CORPUS["comp_join_agg_window"] = (
    "SELECT n_name, ROUND(s, 2) AS s, CAST(RANK() OVER (ORDER BY s DESC, n_name) AS INTEGER) AS rk "
    "FROM (SELECT n_name, SUM(c_acctbal) AS s FROM customer "
    "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name) t ORDER BY rk, n_name"
)
CORPUS["comp_union_of_aggs"] = (
    "SELECT 'high' AS band, CAST(COUNT(*) AS BIGINT) AS n FROM customer WHERE c_acctbal > 5000 "
    "UNION ALL SELECT 'low' AS band, CAST(COUNT(*) AS BIGINT) AS n FROM customer "
    "WHERE c_acctbal <= 5000 ORDER BY band"
)
CORPUS["comp_case_in_group_key"] = (
    "SELECT CASE WHEN p_size < 17 THEN 'small' WHEN p_size < 34 THEN 'mid' ELSE 'big' END AS band, "
    "CAST(COUNT(*) AS BIGINT) AS n FROM part GROUP BY 1 ORDER BY band"
)
CORPUS["comp_having_with_subquery"] = (
    "SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n FROM orders GROUP BY o_custkey "
    "HAVING COUNT(*) > (SELECT CAST(COUNT(*) AS BIGINT) / 200 FROM orders) ORDER BY o_custkey"
)
CORPUS["comp_distinct_on_expr"] = (
    "SELECT DISTINCT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS y FROM orders ORDER BY y"
)
CORPUS["comp_exists_plus_in"] = (
    "SELECT COUNT(*) AS n FROM customer c WHERE "
    "c.c_mktsegment IN ('BUILDING', 'MACHINERY') AND EXISTS "
    "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 10000)"
)
CORPUS["comp_window_over_join"] = (
    "SELECT c_custkey, o_orderkey, CAST(ROW_NUMBER() OVER "
    "(PARTITION BY c_custkey ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS seq "
    "FROM customer JOIN orders ON c_custkey = o_custkey WHERE c_custkey <= 12 "
    "ORDER BY c_custkey, seq"
)
CORPUS["comp_self_join_agg"] = (
    "SELECT a.o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n FROM orders a "
    "JOIN orders b ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey "
    "GROUP BY a.o_orderstatus ORDER BY a.o_orderstatus"
)


# Per-table smoke + cardinality (GetTable over the full catalog; the
# testrunner opens every table the same way).
_TABLE_KEYS = {
    "region": "r_regionkey", "nation": "n_nationkey", "customer": "c_custkey",
    "supplier": "s_suppkey", "part": "p_partkey", "orders": "o_orderkey",
    "lineitem": "l_orderkey, l_linenumber", "events": "event_id",
    "documents": "doc_id", "embeddings": "vec_id",
}
for _tbl, _key in _TABLE_KEYS.items():
    CORPUS[f"tbl_{_tbl}_head"] = (
        f"SELECT {_key.split(',')[0].strip()} AS k FROM {_tbl} ORDER BY {_key} LIMIT 5"
    )
    CORPUS[f"tbl_{_tbl}_count"] = (
        f"SELECT CAST(COUNT(*) AS BIGINT) AS n FROM {_tbl}"
    )

# Arithmetic-operator matrix over int and double columns.
for _op, _tag in (("+", "add"), ("-", "sub"), ("*", "mul")):
    CORPUS[f"arith_int_{_tag}"] = (
        f"SELECT p_partkey AS k, p_size {_op} 3 AS v FROM part "
        "WHERE p_partkey <= 15 ORDER BY p_partkey"
    )
    CORPUS[f"arith_float_{_tag}"] = (
        f"SELECT p_partkey AS k, ROUND(p_retailprice {_op} 1.5, 2) AS v FROM part "
        "WHERE p_partkey <= 15 ORDER BY p_partkey"
    )
CORPUS["arith_float_div"] = (
    "SELECT p_partkey AS k, ROUND(p_retailprice / 3.0, 4) AS v FROM part "
    "WHERE p_partkey <= 15 ORDER BY p_partkey"
)
CORPUS["arith_mixed_precedence"] = (
    "SELECT p_partkey AS k, p_size + 2 * 3 - 1 AS v FROM part "
    "WHERE p_partkey <= 15 ORDER BY p_partkey"
)
CORPUS["arith_unary_minus_col"] = (
    "SELECT p_partkey AS k, -p_size AS v, ABS(-p_size) AS av FROM part "
    "WHERE p_partkey <= 15 ORDER BY p_partkey"
)
CORPUS["arith_round_negative_digits"] = "SELECT ROUND(12345.678, -2) AS v"
CORPUS["arith_ceil_floor_negative"] = (
    "SELECT CEIL(-2.5) AS c, FLOOR(-2.5) AS f, CEIL(2.5) AS c2, FLOOR(2.5) AS f2"
)
CORPUS["arith_chr_ascii"] = "SELECT ASCII('A') AS a, CHR(66) AS b"

# IN-list width matrix (ExpressionEvaluator IN-list dispatch).
CORPUS["inlist_one"] = "SELECT COUNT(*) AS n FROM part WHERE p_size IN (7)"
CORPUS["inlist_five"] = (
    "SELECT COUNT(*) AS n FROM part WHERE p_size IN (1, 7, 13, 29, 41)"
)
CORPUS["inlist_twenty"] = (
    "SELECT COUNT(*) AS n FROM part WHERE p_size IN "
    "(1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,16,17,18,19,20)"
)
CORPUS["inlist_strings"] = (
    "SELECT COUNT(*) AS n FROM orders WHERE o_orderpriority IN "
    "('1-URGENT', '5-LOW')"
)
CORPUS["inlist_expr_values"] = (
    "SELECT COUNT(*) AS n FROM part WHERE p_size IN (5 * 2, 5 * 4, 5 * 6)"
)

# events / documents coverage (the non-TPC-H tables through plain SQL).
CORPUS["evt_type_counts"] = (
    "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events "
    "GROUP BY event_type ORDER BY event_type"
)
CORPUS["evt_hour_histogram"] = (
    "SELECT CAST(EXTRACT(HOUR FROM ts) AS INTEGER) AS hr, CAST(COUNT(*) AS BIGINT) AS n "
    "FROM events GROUP BY 1 ORDER BY hr"
)
CORPUS["evt_value_stats"] = (
    "SELECT event_type, ROUND(MIN(value), 4) AS mn, ROUND(MAX(value), 4) AS mx "
    "FROM events GROUP BY event_type ORDER BY event_type"
)
CORPUS["evt_user_topn"] = (
    "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events "
    "GROUP BY user_id ORDER BY n DESC, user_id LIMIT 10"
)
CORPUS["doc_lang_counts"] = (
    "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents "
    "GROUP BY lang ORDER BY lang"
)
CORPUS["doc_source_lang_matrix"] = (
    "SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents "
    "GROUP BY source, lang ORDER BY source, lang"
)
CORPUS["doc_len_vs_nchars"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents WHERE LENGTH(text) <> n_chars"
)
CORPUS["doc_longest"] = (
    "SELECT doc_id FROM documents ORDER BY n_chars DESC, doc_id LIMIT 5"
)

# Nested conditionals and boolean logic.
CORPUS["cond_nested_case"] = (
    "SELECT p_partkey AS k, CASE WHEN p_size < 25 THEN "
    "CASE WHEN p_type = 'PROMO' THEN 'small-promo' ELSE 'small-other' END "
    "ELSE 'large' END AS cls FROM part WHERE p_partkey <= 30 ORDER BY p_partkey"
)
CORPUS["cond_case_simple_form"] = (
    "SELECT o_orderkey AS k, CASE o_orderstatus WHEN 'F' THEN 'finished' "
    "WHEN 'O' THEN 'open' ELSE 'partial' END AS st "
    "FROM orders WHERE o_orderkey <= 30 ORDER BY o_orderkey"
)
CORPUS["cond_boolean_col_output"] = (
    "SELECT p_partkey AS k, p_size > 25 AS big FROM part "
    "WHERE p_partkey <= 20 ORDER BY p_partkey"
)
CORPUS["cond_not_in_parens"] = (
    "SELECT COUNT(*) AS n FROM part WHERE NOT (p_size IN (1, 2, 3) OR p_type = 'PROMO')"
)

# More window frames.
CORPUS["winf_preceding_band"] = (
    "SELECT o_orderkey, ROUND(SUM(o_totalprice) OVER (ORDER BY o_orderkey "
    "ROWS BETWEEN 4 PRECEDING AND 2 PRECEDING), 2) AS s "
    "FROM orders WHERE o_orderkey <= 40 ORDER BY o_orderkey"
)
CORPUS["winf_count_frame"] = (
    "SELECT o_orderkey, CAST(COUNT(*) OVER (PARTITION BY o_orderstatus "
    "ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c "
    "FROM orders WHERE o_orderkey <= 60 ORDER BY o_orderkey"
)
CORPUS["winf_minmax_frame"] = (
    "SELECT o_orderkey, ROUND(MIN(o_totalprice) OVER w, 2) AS mn, "
    "ROUND(MAX(o_totalprice) OVER w, 2) AS mx "
    "FROM orders WHERE o_orderkey <= 60 "
    "WINDOW w AS (ORDER BY o_orderkey ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) "
    "ORDER BY o_orderkey"
)
CORPUS["winf_partition_two_cols"] = (
    "SELECT o_orderkey, CAST(ROW_NUMBER() OVER (PARTITION BY o_orderstatus, o_orderpriority "
    "ORDER BY o_orderkey) AS INTEGER) AS rn "
    "FROM orders WHERE o_orderkey <= 120 ORDER BY o_orderkey"
)

# DISTINCT / join / aggregation combinations.
CORPUS["dj_distinct_join"] = (
    "SELECT DISTINCT n_regionkey AS k FROM customer "
    "JOIN nation ON c_nationkey = n_nationkey ORDER BY k"
)
CORPUS["dj_count_distinct_join"] = (
    "SELECT r_name, CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS nc FROM customer "
    "JOIN nation ON c_nationkey = n_nationkey "
    "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name ORDER BY r_name"
)
CORPUS["dj_agg_after_semijoin"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders WHERE o_custkey IN "
    "(SELECT c_custkey FROM customer WHERE c_acctbal > 9000)"
)
CORPUS["dj_join_on_expr"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation a "
    "JOIN nation b ON a.n_nationkey + 1 = b.n_nationkey"
)
CORPUS["dj_group_by_two_tables_cols"] = (
    "SELECT n_name, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n FROM customer "
    "JOIN nation ON c_nationkey = n_nationkey "
    "GROUP BY n_name, c_mktsegment ORDER BY n_name, c_mktsegment"
)

# UNION type coercion + ordering edge cases.
CORPUS["coerce_union_int_double"] = (
    "SELECT CAST(1 AS DOUBLE) AS v UNION ALL SELECT 2.5 AS v ORDER BY v"
)
CORPUS["coerce_compare_int_double"] = (
    "SELECT COUNT(*) AS n FROM part WHERE p_size > 24.5"
)
CORPUS["coerce_concat_num_string"] = (
    "SELECT CAST(p_size AS VARCHAR(10)) || '-sz' AS s FROM part "
    "WHERE p_partkey <= 10 ORDER BY p_partkey"
)

# Aggregates over expressions and duplicated aliases.
CORPUS["aggx_sum_of_expr"] = (
    "SELECT ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS s "
    "FROM lineitem WHERE l_orderkey <= 500"
)
CORPUS["aggx_min_max_strings"] = (
    "SELECT MIN(n_name) AS mn, MAX(n_name) AS mx FROM nation"
)
CORPUS["aggx_min_max_dates"] = (
    "SELECT MIN(o_orderdate) AS mn, MAX(o_orderdate) AS mx FROM orders"
)
CORPUS["aggx_count_distinct_two_cols"] = (
    "SELECT CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS a, "
    "CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS b FROM orders"
)
CORPUS["aggx_group_by_all_cols"] = (
    "SELECT r_regionkey, r_name, CAST(COUNT(*) AS BIGINT) AS n FROM region "
    "GROUP BY r_regionkey, r_name ORDER BY r_regionkey"
)
CORPUS["aggx_nested_subquery_agg"] = (
    "SELECT ROUND(MAX(s), 2) AS mx FROM "
    "(SELECT o_custkey, SUM(o_totalprice) AS s FROM orders GROUP BY o_custkey) t"
)


# BETWEEN across types; LIKE anchor variants; remaining EXTRACT fields.
CORPUS["betw_float"] = (
    "SELECT COUNT(*) AS n FROM customer WHERE c_acctbal BETWEEN 1000.5 AND 2000.5"
)
CORPUS["betw_string"] = (
    "SELECT COUNT(*) AS n FROM nation WHERE n_name BETWEEN 'NATION_1' AND 'NATION_3'"
)
CORPUS["betw_date"] = (
    "SELECT COUNT(*) AS n FROM lineitem WHERE l_shipdate "
    "BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 23:59:59'"
)
CORPUS["like_prefix"] = "SELECT COUNT(*) AS n FROM part WHERE p_name LIKE 'red%'"
CORPUS["like_suffix"] = "SELECT COUNT(*) AS n FROM part WHERE p_name LIKE '%bolt'"
CORPUS["like_exact_no_wildcard"] = (
    "SELECT COUNT(*) AS n FROM part WHERE p_name LIKE 'red bolt'"
)
CORPUS["like_single_char_class"] = (
    "SELECT COUNT(*) AS n FROM nation WHERE n_name LIKE 'NATION__'"
)
CORPUS["extr_minute_second"] = (
    "SELECT event_id, CAST(EXTRACT(MINUTE FROM ts) AS INTEGER) AS mi, "
    "CAST(EXTRACT(SECOND FROM ts) AS INTEGER) AS se "
    "FROM events WHERE event_id <= 20 ORDER BY event_id"
)
CORPUS["extr_in_where"] = (
    "SELECT COUNT(*) AS n FROM events WHERE EXTRACT(MINUTE FROM ts) = 30"
)

# Scalar-subquery comparison operators.
CORPUS["subc_lt_avg"] = (
    "SELECT COUNT(*) AS n FROM orders WHERE o_totalprice < "
    "(SELECT AVG(o_totalprice) FROM orders)"
)
CORPUS["subc_ge_min_plus"] = (
    "SELECT COUNT(*) AS n FROM part WHERE p_retailprice >= "
    "(SELECT MIN(p_retailprice) + 5 FROM part)"
)
CORPUS["subc_eq_max"] = (
    "SELECT p_partkey FROM part WHERE p_retailprice = "
    "(SELECT MAX(p_retailprice) FROM part) ORDER BY p_partkey"
)

# COALESCE / NULLIF on real columns through an outer join.
CORPUS["nullc_coalesce_after_left_join"] = (
    "SELECT n_name, COALESCE(r_name, 'none') AS rn FROM nation "
    "LEFT JOIN region ON n_regionkey = r_regionkey AND r_regionkey = 0 "
    "ORDER BY n_name"
)
CORPUS["nullc_nullif_group"] = (
    "SELECT NULLIF(o_orderstatus, 'P') AS st, CAST(COUNT(*) AS BIGINT) AS n "
    "FROM orders GROUP BY 1 ORDER BY st NULLS FIRST"
)

# Modulo-derived group keys; HAVING over rollup; deeper sorts.
CORPUS["modk_group"] = (
    "SELECT CAST(o_orderkey % 7 AS INTEGER) AS bucket, CAST(COUNT(*) AS BIGINT) AS n "
    "FROM orders GROUP BY 1 ORDER BY bucket"
)
CORPUS["rollup_with_having"] = (
    "SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n FROM orders "
    "GROUP BY ROLLUP (o_orderstatus) HAVING COUNT(*) > 100 "
    "ORDER BY o_orderstatus NULLS FIRST"
)
CORPUS["sort_three_mixed_dirs"] = (
    "SELECT o_orderstatus, o_orderpriority, o_orderkey FROM orders "
    "WHERE o_orderkey <= 150 "
    "ORDER BY o_orderstatus DESC, o_orderpriority ASC, o_orderkey DESC"
)
CORPUS["sort_by_hidden_expr"] = (
    "SELECT n_name FROM nation ORDER BY n_nationkey % 5, n_name"
)

# Cross-checking count identities the testrunner favors.
CORPUS["ident_union_vs_or"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ("
    "SELECT p_partkey FROM part WHERE p_size < 10 "
    "UNION SELECT p_partkey FROM part WHERE p_type = 'PROMO') t"
)
CORPUS["ident_join_count_eq_filter"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem "
    "JOIN part ON l_partkey = p_partkey WHERE p_size = 1"
)
CORPUS["ident_double_negation"] = (
    "SELECT COUNT(*) AS n FROM part WHERE NOT (NOT (p_size > 25))"
)


# Wave 4: correlation, 3VL traps, per-table aggregate bounds — deterministic
# result types only (counts / ints / strings / dates).
for _outer, _inner, _corr, _tag in (
    ("orders", "lineitem", "l_orderkey = o_orderkey", "orders_lineitem"),
    ("part", "lineitem", "l_partkey = p_partkey", "part_lineitem"),
    ("supplier", "lineitem", "l_suppkey = s_suppkey", "supplier_lineitem"),
):
    CORPUS[f"exists_{_tag}"] = (
        f"SELECT COUNT(*) AS n FROM {_outer} o WHERE EXISTS "
        f"(SELECT 1 FROM {_inner} i WHERE i.{_corr.split(' = ')[0]} = o.{_corr.split(' = ')[1]})"
    )
    CORPUS[f"not_exists_{_tag}"] = (
        f"SELECT COUNT(*) AS n FROM {_outer} o WHERE NOT EXISTS "
        f"(SELECT 1 FROM {_inner} i WHERE i.{_corr.split(' = ')[0]} = o.{_corr.split(' = ')[1]})"
    )

# The classic NOT IN + NULL three-valued-logic trap: a NULL in the subquery
# makes NOT IN empty on BOTH standard engines.
CORPUS["not_in_with_null_subquery"] = (
    "SELECT COUNT(*) AS n FROM nation WHERE n_nationkey NOT IN "
    "(SELECT CASE WHEN r_regionkey = 0 THEN NULL ELSE r_regionkey END FROM region)"
)
CORPUS["in_with_null_subquery_still_matches"] = (
    "SELECT COUNT(*) AS n FROM nation WHERE n_regionkey IN "
    "(SELECT CASE WHEN r_regionkey = 0 THEN NULL ELSE r_regionkey END FROM region)"
)

# Per-dimension fact counts (join-agg identities).
for _dim, _key, _fact_key in (
    ("customer", "c_custkey", "o_custkey"),
    ("nation", "n_nationkey", "c_nationkey"),
):
    CORPUS[f"percount_{_dim}"] = (
        f"SELECT CAST(COUNT(*) AS BIGINT) AS n FROM {_dim} "
        f"JOIN {'orders' if _dim == 'customer' else 'customer'} ON {_key} = {_fact_key}"
    )

# MIN/MAX bounds per column type.
CORPUS["bounds_lineitem_ints"] = (
    "SELECT CAST(MIN(l_linenumber) AS INTEGER) AS mn, CAST(MAX(l_linenumber) AS INTEGER) AS mx, "
    "MIN(l_orderkey) AS mnk, MAX(l_orderkey) AS mxk FROM lineitem"
)
CORPUS["bounds_orders_dates"] = (
    "SELECT MIN(o_orderdate) AS mn, MAX(o_orderdate) AS mx FROM orders"
)
CORPUS["bounds_strings_flags"] = (
    "SELECT MIN(l_returnflag) AS mnf, MAX(l_returnflag) AS mxf, "
    "MIN(l_linestatus) AS mns, MAX(l_linestatus) AS mxs FROM lineitem"
)
CORPUS["bounds_after_filter"] = (
    "SELECT MIN(p_size) AS mn, MAX(p_size) AS mx FROM part WHERE p_type = 'PROMO'"
)

# CASE-bucket count matrices.
for _tbl, _col, _cut, _tag in (
    ("part", "p_size", 25, "part_size"),
    ("customer", "c_acctbal", 5000, "cust_acct"),
    ("orders", "o_totalprice", 100000, "order_price"),
    ("lineitem", "l_quantity", 25, "li_qty"),
):
    CORPUS[f"casebucket_{_tag}"] = (
        f"SELECT CASE WHEN {_col} < {_cut} THEN 'lo' ELSE 'hi' END AS band, "
        f"CAST(COUNT(*) AS BIGINT) AS n FROM {_tbl} GROUP BY 1 ORDER BY band"
    )

# More EXTRACT fields (shared semantics).
CORPUS["extr_doy"] = (
    "SELECT o_orderkey, CAST(EXTRACT(DOY FROM o_orderdate) AS INTEGER) AS doy "
    "FROM orders WHERE o_orderkey <= 20 ORDER BY o_orderkey"
)
CORPUS["extr_dom_group"] = (
    "SELECT CAST(EXTRACT(DAY FROM o_orderdate) AS INTEGER) AS dom, "
    "CAST(COUNT(*) AS BIGINT) AS n FROM orders GROUP BY 1 ORDER BY dom"
)

# Integer arithmetic identities (exact in both engines).
CORPUS["intm_large_products"] = (
    "SELECT o_orderkey * 1000000 AS big FROM orders WHERE o_orderkey <= 10 "
    "ORDER BY o_orderkey"
)
CORPUS["intm_nested_mod"] = (
    "SELECT CAST(MOD(MOD(o_orderkey, 97), 13) AS INTEGER) AS r, CAST(COUNT(*) AS BIGINT) AS n "
    "FROM orders GROUP BY 1 ORDER BY r"
)
CORPUS["intm_sum_of_keys"] = (
    "SELECT CAST(SUM(n_nationkey) AS BIGINT) AS s FROM nation"
)
CORPUS["intm_parity_split"] = (
    "SELECT CAST(o_orderkey % 2 AS INTEGER) AS parity, CAST(COUNT(*) AS BIGINT) AS n "
    "FROM orders GROUP BY 1 ORDER BY parity"
)

# documents predicates (string ops on the non-TPC-H text table).
CORPUS["docm_lang_in"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents WHERE lang IN ('en', 'de')"
)
CORPUS["docm_source_like"] = (
    "SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents "
    "WHERE source LIKE '%a%' GROUP BY source ORDER BY source"
)
CORPUS["docm_long_docs_per_lang"] = (
    "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents "
    "WHERE n_chars > 500 GROUP BY lang ORDER BY lang"
)
CORPUS["docm_text_prefix"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents WHERE SUBSTR(text, 1, 1) = 'T'"
)

# OFFSET / fetch-window matrix (deterministic total orders).
CORPUS["offm_mid_page"] = (
    "SELECT p_partkey FROM part ORDER BY p_partkey LIMIT 10 OFFSET 25"
)
CORPUS["offm_last_page_overrun"] = (
    "SELECT r_regionkey FROM region ORDER BY r_regionkey LIMIT 10 OFFSET 3"
)
CORPUS["offm_offset_zero"] = (
    "SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 3 OFFSET 0"
)

# UNION type widening and duplicate semantics.
CORPUS["unim_int_bigint_widen"] = (
    "SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation WHERE n_nationkey < 3 "
    "UNION SELECT o_orderkey AS k FROM orders WHERE o_orderkey <= 2 ORDER BY k"
)
CORPUS["unim_union_all_count_identity"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM "
    "(SELECT n_nationkey FROM nation UNION ALL SELECT n_nationkey FROM nation) t"
)

# HAVING without GROUP BY (global-aggregate HAVING).
CORPUS["havm_global_true"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation HAVING COUNT(*) > 10"
)
CORPUS["havm_global_false"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation HAVING COUNT(*) > 1000"
)

# FILTER-clause matrix over order priorities.
for _i, _p in enumerate(("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")):
    CORPUS[f"filtm_prio_{_i}"] = (
        f"SELECT CAST(COUNT(*) FILTER (WHERE o_orderpriority = '{_p}') AS BIGINT) AS n "
        "FROM orders"
    )

# Join-shape extras.
CORPUS["joinx_coalesce_key"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation "
    "JOIN region ON COALESCE(n_regionkey, -1) = r_regionkey"
)
CORPUS["joinx_cross_count_identity"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation CROSS JOIN region"
)
CORPUS["joinx_self_pairs"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM region a JOIN region b "
    "ON a.r_regionkey <> b.r_regionkey"
)
CORPUS["joinx_derived_both_sides"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM "
    "(SELECT DISTINCT n_regionkey AS k FROM nation) a JOIN "
    "(SELECT r_regionkey AS k FROM region) b ON a.k = b.k"
)
CORPUS["joinx_group_by_alias"] = (
    "SELECT n_regionkey + 100 AS shifted, CAST(COUNT(*) AS BIGINT) AS n "
    "FROM nation GROUP BY shifted ORDER BY shifted"
)
CORPUS["joinx_window_over_derived_join"] = (
    "SELECT k, CAST(ROW_NUMBER() OVER (ORDER BY k) AS INTEGER) AS rn FROM "
    "(SELECT DISTINCT n_regionkey AS k FROM nation) t ORDER BY k"
)


# Wave 5: scalar-subquery positions, sort-stability probes, type-coercion
# edges, nested set ops, expression-in-every-clause forms.
CORPUS["pos_scalar_in_order_by"] = (
    "SELECT n_name FROM nation "
    "ORDER BY n_nationkey - (SELECT MIN(n_nationkey) FROM nation), n_name LIMIT 10"
)
CORPUS["pos_scalar_in_case"] = (
    "SELECT n_name, CASE WHEN n_nationkey > (SELECT CAST(AVG(n_nationkey) AS INTEGER) FROM nation) "
    "THEN 'upper' ELSE 'lower' END AS half FROM nation ORDER BY n_name"
)
CORPUS["pos_scalar_arithmetic"] = (
    "SELECT CAST((SELECT COUNT(*) FROM nation) * (SELECT COUNT(*) FROM region) AS BIGINT) AS product"
)
CORPUS["pos_two_scalars_compared"] = (
    "SELECT (SELECT COUNT(*) FROM nation) > (SELECT COUNT(*) FROM region) AS more_nations"
)
CORPUS["pos_subquery_in_having"] = (
    "SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n FROM nation GROUP BY n_regionkey "
    "HAVING COUNT(*) = (SELECT MAX(cnt) FROM "
    "(SELECT COUNT(*) AS cnt FROM nation GROUP BY n_regionkey) t) ORDER BY n_regionkey"
)

# Set-op nesting and precedence.
CORPUS["setn_except_of_union"] = (
    "SELECT k FROM (SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 10 "
    "UNION SELECT n_nationkey AS k FROM nation WHERE n_nationkey BETWEEN 5 AND 15) t "
    "WHERE k NOT IN (SELECT r_regionkey FROM region) ORDER BY k"
)
CORPUS["setn_intersect_chain_three"] = (
    "SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 20 "
    "INTERSECT SELECT n_nationkey AS k FROM nation WHERE n_nationkey > 5 "
    "INTERSECT SELECT n_nationkey AS k FROM nation WHERE n_nationkey % 2 = 0 ORDER BY k"
)
CORPUS["setn_union_then_agg"] = (
    "SELECT CAST(SUM(k) AS BIGINT) AS s FROM ("
    "SELECT n_nationkey AS k FROM nation UNION ALL SELECT r_regionkey AS k FROM region) t"
)

# Type-coercion edges that are deterministic in both engines.
CORPUS["coer_int_string_concat_cast"] = (
    "SELECT CONCAT(CAST(n_nationkey AS VARCHAR(5)), ':', n_name) AS tagd "
    "FROM nation WHERE n_nationkey < 5 ORDER BY tagd"
)
CORPUS["coer_bigint_int_compare"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders "
    "WHERE o_orderkey = CAST(100 AS BIGINT)"
)
CORPUS["coer_case_branch_widening"] = (
    "SELECT CASE WHEN n_nationkey < 5 THEN CAST(n_nationkey AS BIGINT) "
    "ELSE CAST(-1 AS BIGINT) END AS v FROM nation ORDER BY v, n_nationkey"
)

# Expression-heavy WHERE / GROUP BY / ORDER BY in one statement.
CORPUS["exprall_everything_clause"] = (
    "SELECT UPPER(SUBSTR(n_name, 1, 6)) AS pre, CAST(COUNT(*) AS BIGINT) AS n "
    "FROM nation WHERE LENGTH(n_name) > 7 AND n_nationkey % 3 <> 1 "
    "GROUP BY UPPER(SUBSTR(n_name, 1, 6)) "
    "HAVING COUNT(*) >= 1 ORDER BY n DESC, pre"
)
CORPUS["exprall_join_on_function"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation a JOIN nation b "
    "ON MOD(a.n_nationkey, 5) = MOD(b.n_nationkey, 5)"
)
CORPUS["exprall_between_expressions"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part "
    "WHERE p_size BETWEEN 10 + 5 AND 50 - 10"
)

# DISTINCT forms.
CORPUS["dist_count_distinct_expr"] = (
    "SELECT CAST(COUNT(DISTINCT p_size % 10) AS BIGINT) AS n FROM part"
)
CORPUS["dist_distinct_star_small"] = (
    "SELECT DISTINCT n_regionkey FROM nation ORDER BY n_regionkey"
)
CORPUS["dist_distinct_multi_expr"] = (
    "SELECT DISTINCT o_orderstatus, CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS y "
    "FROM orders ORDER BY o_orderstatus, y"
)

# Window + set-op / subquery compositions.
CORPUS["wcomp_rank_of_union"] = (
    "SELECT k, CAST(DENSE_RANK() OVER (ORDER BY k) AS INTEGER) AS dr FROM ("
    "SELECT n_regionkey AS k FROM nation UNION SELECT r_regionkey AS k FROM region) t "
    "ORDER BY k"
)
CORPUS["wcomp_window_in_subquery_filtered"] = (
    "SELECT o_orderkey FROM ("
    "SELECT o_orderkey, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn "
    "FROM orders) t WHERE rn = 1 AND o_orderkey <= 200 ORDER BY o_orderkey"
)
CORPUS["wcomp_agg_of_window"] = (
    "SELECT CAST(MAX(rn) AS INTEGER) AS deepest FROM ("
    "SELECT ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn FROM orders) t"
)

# LEFT JOIN null-extension counting (outer-join 3VL).
CORPUS["ljn_count_unmatched"] = (
    "SELECT CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS never_ordered "
    "FROM customer LEFT JOIN orders ON c_custkey = o_custkey"
)
CORPUS["ljn_coalesce_in_agg"] = (
    "SELECT CAST(COUNT(COALESCE(o_orderkey, -1)) AS BIGINT) AS n "
    "FROM customer LEFT JOIN orders ON c_custkey = o_custkey AND o_totalprice > 1e12"
)
CORPUS["ljn_is_null_predicate_after_join"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer "
    "LEFT JOIN orders ON c_custkey = o_custkey WHERE o_orderkey IS NULL"
)

# ---------------------------------------------------------------------------
# Round-5 mining of the reference corpus's untranslated families
# (resources/test_data/sqlite_testrunner_queries.sql). Table mapping:
# `mixed` -> part (id=p_partkey, a=p_type, b=p_size, c=p_retailprice,
# d=p_name); `mixed_null` -> a NULL-injecting derived table over part;
# `id_int_int_int_*` -> nation / customer key columns.
_PNULL = (
    "(SELECT p_partkey AS id, p_type AS a, "
    "CASE WHEN p_partkey % 3 = 0 THEN NULL ELSE p_size END AS b, "
    "CASE WHEN p_partkey % 5 = 0 THEN NULL ELSE p_retailprice END AS c, "
    "CASE WHEN p_partkey % 7 = 0 THEN NULL ELSE p_name END AS d FROM part) pn"
)

# -- expression ORDER BY (corpus lines 281-282, 306, 464) --------------------
CORPUS["eob_order_by_count"] = (
    "SELECT p_type AS a, CAST(COUNT(*) AS BIGINT) AS n FROM part "
    "GROUP BY p_type ORDER BY COUNT(*) DESC"
)
CORPUS["eob_order_by_arith_of_count"] = (
    "SELECT p_type AS a, CAST(COUNT(*) AS BIGINT) AS n FROM part "
    "GROUP BY p_type ORDER BY 100 - COUNT(*) DESC"
)
CORPUS["eob_order_by_agg_then_key_desc"] = (
    "SELECT p_type AS a, CAST(MAX(p_size) AS INTEGER) AS m FROM part "
    "GROUP BY p_type ORDER BY MAX(p_size), a DESC"
)
CORPUS["eob_order_by_expr_on_column"] = (
    "SELECT p_partkey AS k FROM part WHERE p_partkey <= 30 ORDER BY -p_partkey"
)
CORPUS["eob_order_by_substr"] = (
    "SELECT p_partkey AS k, SUBSTR(p_name, 1, 4) AS s FROM part "
    "WHERE p_partkey <= 40 ORDER BY SUBSTR(p_name, 2, 3), k"
)
CORPUS["eob_order_by_ordinal"] = (
    "SELECT p_type AS a, CAST(COUNT(*) AS BIGINT) AS n FROM part GROUP BY p_type ORDER BY 2 DESC, 1"
)
CORPUS["eob_order_by_case"] = (
    "SELECT p_partkey AS k FROM part WHERE p_partkey <= 25 "
    "ORDER BY CASE WHEN p_partkey % 2 = 0 THEN p_partkey ELSE -p_partkey END"
)
CORPUS["eob_order_by_inside_derived"] = (
    "SELECT sub.k, sub.s FROM (SELECT p_partkey AS k, p_size AS s FROM part "
    "WHERE p_type = 'PROMO' ORDER BY p_size) AS sub WHERE sub.s > 10 ORDER BY s"
)

# -- SELECT-list scalar subqueries (corpus lines 385-389) --------------------
CORPUS["ssq_uncorrelated_in_select"] = (
    "SELECT n_nationkey AS k, (SELECT MAX(p_size) FROM part) AS m FROM nation"
)
CORPUS["ssq_correlated_arith_in_select"] = (
    # reference puts the outer column inside the subquery projection
    # (line 386) — Spark only supports correlation in predicates, so the
    # declared-dialect form hoists the outer term out of the subquery
    "SELECT (SELECT MAX(p_size) FROM part) + n_nationkey AS foo FROM nation"
)
CORPUS["ssq_correlated_two_outer_cols"] = (
    "SELECT (SELECT MAX(p_size) FROM part) + n_nationkey + n_regionkey AS foo FROM nation"
)
CORPUS["ssq_correlated_agg_in_select_predicate_corr"] = (
    # the Spark-supported correlated-scalar form: correlation in the WHERE
    "SELECT n_nationkey AS k, (SELECT MAX(n2.n_regionkey) FROM nation n2 "
    "WHERE n2.n_nationkey = nation.n_nationkey) AS m FROM nation"
)
CORPUS["ssq_const_agg_in_select"] = (
    "SELECT (SELECT MIN(1 + 2) FROM part) AS foos FROM nation"
)
CORPUS["ssq_scalar_in_where_correlated_arith"] = (
    "SELECT n_name FROM nation AS r WHERE n_nationkey + 1 = "
    "(SELECT MIN(n2.n_nationkey) + 1 FROM nation n2 WHERE n2.n_nationkey = r.n_nationkey)"
)
CORPUS["ssq_exists_in_select_list"] = (
    "SELECT EXISTS(SELECT 1) AS some_exists, NOT EXISTS(SELECT * FROM region WHERE r_regionkey > 99) AS none"
)
CORPUS["ssq_in_scalar_subquery_both_sides"] = (
    "SELECT n_nationkey AS k FROM nation WHERE n_nationkey IN (SELECT 14) "
    "OR n_nationkey > (SELECT 15 + 2)"
)
CORPUS["ssq_in_agg_derived_scalar"] = (
    "SELECT n_nationkey AS k FROM nation "
    "WHERE n_nationkey IN (SELECT CAST(FLOOR(MAX(r_regionkey) / 2) AS INTEGER) FROM region) "
    "OR n_nationkey > (SELECT MAX(r_regionkey) * 5 FROM region)"
)

# -- NULL-literal arithmetic / comparisons (corpus lines 47-56, 119-121) -----
CORPUS["nla_add_null_projection"] = (
    "SELECT p_partkey AS k, p_size + p_partkey AS e, p_size + p_partkey + NULL AS f "
    "FROM part WHERE p_partkey <= 20"
)
CORPUS["nla_null_comparisons_not_exists"] = (
    "SELECT COUNT(*) AS n FROM region WHERE NOT EXISTS "
    "(SELECT * FROM part WHERE p_size > NULL)"
)
CORPUS["nla_null_between_not_exists"] = (
    "SELECT COUNT(*) AS n FROM region WHERE NOT EXISTS "
    "(SELECT * FROM part WHERE p_name BETWEEN NULL AND '')"
)
CORPUS["nla_neq_null_not_exists"] = (
    "SELECT COUNT(*) AS n FROM region WHERE NOT EXISTS "
    "(SELECT * FROM part WHERE p_size != NULL)"
)
CORPUS["nla_div_mod_by_zero"] = (
    "SELECT 2 / 0 AS a, p_size / 0 AS b, 50 % (p_partkey - p_partkey) AS c "
    "FROM part WHERE p_partkey <= 5"
)
CORPUS["nla_null_in_aggregate_input"] = (
    f"SELECT CAST(COUNT(b) AS BIGINT) AS cb, CAST(COUNT(*) AS BIGINT) AS call, "
    f"CAST(SUM(b) AS BIGINT) AS sb FROM {_PNULL}"
)
CORPUS["nla_avg_min_max_over_nulls"] = (
    f"SELECT a, CAST(MIN(b) AS INTEGER) AS mn, CAST(MAX(b) AS INTEGER) AS mx, "
    f"CAST(COUNT(b) AS BIGINT) AS cb FROM {_PNULL} GROUP BY a"
)
CORPUS["nla_arith_null_propagation_cols"] = (
    f"SELECT id AS k, b * c AS bc FROM {_PNULL} WHERE b * c IS NOT NULL AND id <= 50"
)
CORPUS["nla_not_in_list_over_nullable"] = (
    f"SELECT CAST(COUNT(*) AS BIGINT) AS n FROM {_PNULL} WHERE NOT (b IN (12, 13, 14))"
)

# -- scans: predicates without column references (lines 65-69) ---------------
CORPUS["cfs_const_true_predicate"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation WHERE 4 > 3"
)
CORPUS["cfs_const_bool_combo"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation WHERE (4 > 3 AND 2 < 1) OR 4 < 5"
)
CORPUS["cfs_const_in_list"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation WHERE 50 IN (51, 52, 50)"
)
CORPUS["cfs_const_in_subquery"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation WHERE 5 IN (SELECT r_regionkey + 1 FROM region)"
)
CORPUS["cfs_or_true_shortcircuit"] = (
    "SELECT p_size AS b FROM part WHERE (2 > 1 OR 2 > 0) AND p_size = 1"
)

# -- scans: out-of-range literals vs column type (lines 58-61) ---------------
CORPUS["oor_wide_range_keeps_all"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part "
    "WHERE p_size > -3000000000 AND p_size < 3000000000"
)
CORPUS["oor_impossible_range_or_escape"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part "
    "WHERE (p_size < -3000000000 AND p_size > 3000000000) OR p_partkey = 1"
)
CORPUS["oor_between_widened"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part WHERE p_size BETWEEN -3123456789 AND 3123456789"
)
CORPUS["oor_huge_float_bound"] = (
    # literal beyond FLOAT_MAX (reference line 61); written in exponent form —
    # the 40-digit decimal literal overflows Spark's decimal parser
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part "
    "WHERE p_retailprice < CAST('1.23456789e39' AS DOUBLE)"
)

# -- reversed / column-vs-column BETWEEN (lines 21-27, 83-85) ----------------
CORPUS["btw_literal_on_left"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part WHERE 40 >= p_size"
)
CORPUS["btw_value_between_columns"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part WHERE 10 BETWEEN p_size AND 40"
)
CORPUS["btw_column_between_col_and_literal"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part "
    "WHERE p_retailprice BETWEEN p_size AND 950"
)
CORPUS["btw_expr_between_cols"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part "
    "WHERE p_size + 10 BETWEEN p_size AND p_retailprice"
)
CORPUS["btw_empty_reversed_bounds"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part "
    "WHERE p_size = 10 OR p_size BETWEEN 45 AND 20"
)
CORPUS["btw_rewrite_half_open_pairs"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part WHERE p_size >= 20 AND p_size < 41"
)
CORPUS["btw_rewrite_reversed_comparisons"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part WHERE 41 > p_size AND 20 <= p_size"
)

# -- aliases: duplicates, GROUP BY/HAVING on alias (lines 122-137) -----------
CORPUS["als_duplicate_output_cols"] = (
    "SELECT p_type AS a1, p_type AS a2 FROM part WHERE p_partkey <= 20"
)
CORPUS["als_six_way_duplicate_aliases"] = (
    "SELECT p_type AS a1, p_size AS b2, p_size AS b3, p_type AS a3, p_size AS b1, p_type AS a2 "
    "FROM part WHERE p_partkey <= 15"
)
CORPUS["als_group_by_alias"] = (
    "SELECT p_type AS x, CAST(SUM(p_size) AS BIGINT) AS s FROM part GROUP BY x"
)
CORPUS["als_having_on_alias"] = (
    "SELECT p_type AS x, CAST(SUM(p_size) AS BIGINT) AS s FROM part GROUP BY x HAVING x > 'M'"
)
CORPUS["als_triple_count_star"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS cnt1, CAST(COUNT(*) AS BIGINT) AS cnt2, "
    "CAST(COUNT(*) AS BIGINT) AS cnt3 FROM nation"
)
CORPUS["als_triple_count_star_grouped"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS cnt1, CAST(COUNT(*) AS BIGINT) AS cnt2, "
    "CAST(COUNT(*) AS BIGINT) AS cnt3 FROM nation GROUP BY n_regionkey"
)
CORPUS["als_project_subset_of_duplicates"] = (
    "SELECT a1, b2, a3 FROM (SELECT p_type AS a1, p_size AS b2, p_size AS b3, "
    "p_type AS a3, p_size AS b1, p_type AS a2 FROM part WHERE p_partkey <= 15) AS r"
)
CORPUS["als_cross_of_two_count_derived"] = (
    "SELECT * FROM (SELECT CAST(COUNT(*) AS BIGINT) AS cnt1 FROM region) AS s1, "
    "(SELECT CAST(COUNT(*) AS BIGINT) AS cnt2 FROM nation) AS s2"
)
CORPUS["als_cross_of_two_selfjoin_counts"] = (
    "SELECT * FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c1 FROM nation AS l, nation AS r "
    "WHERE l.n_regionkey = r.n_regionkey) AS s1, "
    "(SELECT CAST(COUNT(*) AS BIGINT) AS c2 FROM region AS l, region AS r "
    "WHERE l.r_regionkey = r.r_regionkey) AS s2"
)

# -- COUNT(expr) family (lines 289-296) --------------------------------------
CORPUS["cnt_count_literal_one"] = (
    "SELECT CAST(COUNT(1) AS BIGINT) AS n FROM part"
)
CORPUS["cnt_count_expr_plus_one"] = (
    "SELECT CAST(COUNT(p_size + 1) AS BIGINT) AS a, CAST(COUNT(p_size) + 1 AS BIGINT) AS b, "
    "CAST(COUNT(1 + 2) AS BIGINT) AS c FROM part"
)
CORPUS["cnt_count_sum_expr"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(p_size + p_partkey) AS BIGINT) AS s FROM part"
)
CORPUS["cnt_group_count_of_expr"] = (
    "SELECT p_size + 1 AS b1, CAST(COUNT(p_partkey + 1) AS BIGINT) AS c FROM part GROUP BY p_size + 1"
)
CORPUS["cnt_count_star_plus_one"] = (
    "SELECT CAST(COUNT(*) + 1 AS BIGINT) AS n FROM part"
)
CORPUS["cnt_case_insensitive_keywords"] = (
    "sELEcT CAST(Sum(p_size + p_size) AS BIGINT) AS sum_b_b fRoM part"
)

# -- HAVING variants (lines 318-327) -----------------------------------------
CORPUS["hav_two_aggs_band"] = (
    "SELECT p_type AS a, CAST(MAX(p_size) AS INTEGER) AS mb FROM part "
    "GROUP BY p_type HAVING MAX(p_size) >= 10 AND MAX(p_size) < 60"
)
CORPUS["hav_agg_expr_mix"] = (
    "SELECT p_type AS a, CAST(MAX(p_size) AS INTEGER) AS mb FROM part GROUP BY p_type "
    "HAVING MAX(p_size) >= 10 AND MAX(p_size * 0.8 + p_retailprice * 0.01) < 60"
)
CORPUS["hav_on_grouping_col"] = (
    "SELECT p_type AS a, p_size AS b, CAST(COUNT(*) AS BIGINT) AS n FROM part "
    "GROUP BY p_type, p_size HAVING p_size > 33 OR p_size = 1 OR p_size = 17"
)
CORPUS["hav_agg_not_in_select"] = (
    "SELECT p_type AS a, ROUND(AVG(p_size), 2) AS ab FROM part "
    "GROUP BY p_type HAVING MAX(p_retailprice) > 990 AND MIN(p_retailprice) <= 920"
)

# -- post-aggregate reuse (lines 313-315) ------------------------------------
CORPUS["pag_filter_on_agg_output"] = (
    "SELECT b, sub.min_c, max_b FROM (SELECT p_type AS a, p_size AS b, "
    "CAST(MAX(p_size) AS INTEGER) AS max_b, MIN(p_retailprice) AS min_c FROM part "
    "GROUP BY p_type, p_size) AS sub WHERE b BETWEEN 20 AND 50 AND min_c > 905"
)
CORPUS["pag_count_aliased_as_data_col"] = (
    "SELECT a, b FROM (SELECT p_type AS a, CAST(COUNT(p_type) AS BIGINT) AS b FROM part GROUP BY p_type) t"
)

# -- CASE operand form + LIKE-in-CASE (lines 434-437, 476) -------------------
CORPUS["cse_simple_case_on_expr"] = (
    "SELECT p_partkey AS k, CASE p_partkey + 10 WHEN 15 THEN p_type WHEN 26 THEN 'World' "
    "ELSE p_name END AS case_column FROM part WHERE p_partkey <= 40"
)
CORPUS["cse_case_like_branches"] = (
    "SELECT p_partkey AS k, CASE WHEN p_name LIKE '%ab%' THEN 'contains AB' "
    "WHEN p_name NOT LIKE '%x%' THEN 'no x' ELSE p_type END AS c FROM part WHERE p_partkey <= 60"
)
CORPUS["cse_case_null_grouping"] = (
    f"SELECT a, CASE WHEN b IS NULL THEN 1 ELSE 2 END AS tag, CAST(COUNT(*) AS BIGINT) AS n "
    f"FROM {_PNULL} GROUP BY a, CASE WHEN b IS NULL THEN 1 ELSE 2 END"
)

# -- COALESCE family (lines 440-448) -----------------------------------------
CORPUS["coa_string_default"] = (
    f"SELECT id AS k, COALESCE(d, '') AS d_not_null FROM {_PNULL} WHERE id <= 30"
)
CORPUS["coa_numeric_defaults"] = (
    f"SELECT id AS k, COALESCE(b, -1) AS b_not_null, COALESCE(c, 0.0) AS c_not_null "
    f"FROM {_PNULL} WHERE id <= 30"
)
CORPUS["coa_expr_defaults"] = (
    f"SELECT id AS k, COALESCE(b, 1 - 1) AS bn, COALESCE(c, 3.0 / -4.0) AS cn "
    f"FROM {_PNULL} WHERE id <= 30"
)
CORPUS["coa_nested_cast"] = (
    f"SELECT id AS k, COALESCE(c, CAST(COALESCE(b, 0) AS DOUBLE)) AS cn FROM {_PNULL} WHERE id <= 30"
)
CORPUS["coa_sum_of_coalesce"] = (
    f"SELECT id AS k, COALESCE(b, 0) + COALESCE(c, 0.0) AS sum_not_null FROM {_PNULL} WHERE id <= 30"
)
CORPUS["coa_equals_case_equivalence"] = (
    f"SELECT id AS k, COALESCE(c, 0.0) = (CASE WHEN c IS NULL THEN 0.0 ELSE c END) AS eq "
    f"FROM {_PNULL} WHERE id <= 30"
)
CORPUS["coa_null_first_arg"] = (
    f"SELECT id AS k, COALESCE(NULL, b, NULL) AS b FROM {_PNULL} WHERE id <= 30"
)

# -- SUBSTR / ABS edge cases (lines 455-471) ---------------------------------
CORPUS["sub_substr_edges"] = (
    "SELECT SUBSTR('HELLO', 2, 3) AS s1, SUBSTR('HELLO', 5000, 20) AS s2, "
    "SUBSTR('HELLO', -4, 3) AS s3"
)
CORPUS["sub_substr_computed_args"] = (
    # CAST(double AS INT) rounds in DuckDB but truncates in Spark (header
    # dialect note) — the declared surface spells truncation as FLOOR
    "SELECT p_partkey AS k, SUBSTR(p_name, CAST(FLOOR(p_size / 10) AS INTEGER) + 1, 3) AS s "
    "FROM part WHERE p_partkey <= 40"
)
CORPUS["abs_diff_columns"] = (
    "SELECT p_partkey AS k, ABS(p_partkey - p_size) AS a FROM part WHERE p_partkey <= 30"
)
CORPUS["abs_case_sign_flip"] = (
    "SELECT p_partkey AS k, "
    "ABS(CASE WHEN p_partkey % 2 = 0 THEN p_size ELSE p_size * -1 END) = p_size AS abs_equal "
    "FROM part WHERE p_partkey <= 30"
)

# -- LIKE pattern family (lines 474-481) -------------------------------------
CORPUS["lik_multi_wildcard"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part WHERE p_name LIKE '%e%a%'"
)
CORPUS["lik_underscore_mix"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part WHERE p_name LIKE '%e__%a_%'"
)
CORPUS["lik_or_with_range"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part "
    "WHERE p_name LIKE '%e__%a_%' OR (p_partkey > 50 AND p_type LIKE '%O%')"
)
CORPUS["lik_bare_percent"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part WHERE p_name LIKE '%'"
)

# -- EXISTS breadth (lines 487-503) ------------------------------------------
CORPUS["exs_top_level_exists_const"] = (
    "SELECT n_nationkey AS k FROM nation WHERE EXISTS(SELECT 0) OR n_nationkey = 42"
)
CORPUS["exs_not_exists_empty_inner"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation "
    "WHERE NOT EXISTS(SELECT * FROM part WHERE p_size > 1000)"
)
CORPUS["exs_correlated_via_expression"] = (
    "SELECT n_nationkey AS k FROM nation AS outer_n WHERE EXISTS"
    "(SELECT * FROM region WHERE region.r_regionkey = outer_n.n_nationkey - 20)"
)
CORPUS["exs_nested_uncorrelated"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation WHERE EXISTS "
    "(SELECT r_regionkey FROM region WHERE EXISTS (SELECT p_size FROM part))"
)
CORPUS["exs_correlated_two_conditions"] = (
    "SELECT c_custkey AS k FROM customer AS r WHERE EXISTS "
    "(SELECT o_orderkey FROM orders AS s WHERE s.o_custkey = r.c_custkey "
    "AND s.o_totalprice < r.c_acctbal * 10) AND c_custkey <= 200"
)
CORPUS["exs_or_of_two_exists"] = (
    "SELECT n_nationkey AS k FROM nation AS a WHERE "
    "EXISTS (SELECT * FROM region AS b WHERE b.r_regionkey = a.n_regionkey AND b.r_name = 'ASIA') "
    "OR EXISTS (SELECT * FROM region AS c WHERE c.r_regionkey = a.n_regionkey AND c.r_name = 'EUROPE')"
)

# -- correlated IN breadth (lines 508-521) -----------------------------------
CORPUS["cin_in_with_arith_lhs"] = (
    "SELECT n_nationkey AS k FROM nation WHERE n_nationkey * 10 IN (SELECT p_size FROM part)"
)
CORPUS["cin_not_in_with_arith_lhs"] = (
    "SELECT n_nationkey AS k FROM nation WHERE n_nationkey * 10 NOT IN (SELECT p_size FROM part)"
)
CORPUS["cin_in_correlated_neq"] = (
    "SELECT n_nationkey AS k FROM nation AS r WHERE n_regionkey IN "
    "(SELECT s.r_regionkey FROM region AS s WHERE s.r_regionkey <> r.n_nationkey)"
)
CORPUS["cin_in_correlated_lt"] = (
    "SELECT n_nationkey AS k FROM nation AS r WHERE n_regionkey IN "
    "(SELECT s.r_regionkey FROM region AS s WHERE s.r_regionkey < r.n_nationkey)"
)
CORPUS["cin_in_subquery_with_projection_arith"] = (
    "SELECT n_nationkey AS k FROM nation AS r WHERE n_nationkey IN "
    "(SELECT s.r_regionkey + 2 FROM region AS s WHERE s.r_regionkey < r.n_nationkey)"
)
CORPUS["cin_not_in_correlated"] = (
    "SELECT n_nationkey AS k FROM nation AS r WHERE n_regionkey NOT IN "
    "(SELECT s.r_regionkey FROM region AS s WHERE s.r_regionkey < r.n_nationkey - 20)"
)
CORPUS["cin_nested_in_chain"] = (
    "SELECT n_nationkey AS k FROM nation WHERE n_regionkey IN "
    "(SELECT r_regionkey FROM region WHERE r_regionkey IN (SELECT p_size - 1 FROM part))"
)
CORPUS["cin_mixed_type_in_list"] = (
    "SELECT p_partkey + p_size AS apc FROM part WHERE p_partkey + p_size IN (110, 9, 13, 169)"
)
CORPUS["cin_in_list_with_exprs"] = (
    "SELECT n_nationkey AS k FROM nation WHERE n_nationkey IN (n_regionkey + 8, n_regionkey * 6)"
)

# -- correlated FROM-subquery interplay (lines 529-531) ----------------------
CORPUS["cfq_derived_selfjoin_then_join"] = (
    "SELECT * FROM (SELECT t1.n_nationkey AS k FROM nation t1 JOIN nation t2 "
    "ON t1.n_nationkey + 1 = t2.n_nationkey) AS s1, nation t3 "
    "WHERE s1.k + 5 = t3.n_nationkey"
)
CORPUS["cfq_correlated_scalar_over_derived"] = (
    "SELECT n_nationkey AS k FROM nation t1 WHERE n_nationkey < 9 AND "
    "(SELECT MIN(t2.n_nationkey + 10) FROM nation t2 WHERE t2.n_nationkey = t1.n_nationkey + 9) > 5"
)

# -- predicate split-up / merge family (reference corpus lines 95-105) -------
CORPUS["psm_or_of_two_exists_different_tables"] = (
    "SELECT p_partkey AS k FROM part AS a WHERE "
    "EXISTS (SELECT * FROM nation AS b WHERE b.n_nationkey = a.p_size) "
    "OR EXISTS (SELECT * FROM region AS c WHERE c.r_regionkey = a.p_size)"
)
CORPUS["psm_or_of_four_exists_shifted"] = (
    "SELECT n_nationkey AS k FROM nation AS a WHERE "
    "EXISTS (SELECT * FROM region AS b WHERE b.r_regionkey = a.n_regionkey) "
    "OR EXISTS (SELECT * FROM region AS c WHERE c.r_regionkey + 1 = a.n_regionkey) "
    "OR EXISTS (SELECT * FROM region AS d WHERE d.r_regionkey + 2 = a.n_regionkey) "
    "OR EXISTS (SELECT * FROM region AS e WHERE e.r_regionkey + 3 = a.n_regionkey)"
)
CORPUS["psm_join_of_two_or_derived"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM "
    "(SELECT a.n_nationkey AS x FROM nation AS a, region AS b "
    " WHERE a.n_regionkey = b.r_regionkey OR a.n_nationkey = b.r_regionkey) r "
    "JOIN "
    "(SELECT a.n_regionkey AS y FROM nation AS a, region AS b "
    " WHERE a.n_regionkey = b.r_regionkey OR a.n_nationkey = b.r_regionkey) s "
    "ON r.x = s.y"
)
CORPUS["psm_and_of_or_bands"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part "
    "WHERE (p_size > 10 OR p_size < 8) AND (p_retailprice <= 907 OR 11 = p_size)"
)
CORPUS["psm_derived_band_then_or_chain"] = (
    "SELECT r.b, r.c FROM (SELECT p_size AS b, p_retailprice AS c FROM part "
    "WHERE p_size < p_retailprice AND p_size = 19) r "
    "WHERE (b > 10 OR b < 8) AND (c <= 960 OR 11 = b) OR ((b = 5 AND c = 7) AND 13 = 13)"
)
CORPUS["psm_derived_const_true_filters"] = (
    "SELECT s.k FROM (SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 1 OR 3 > 2) AS s "
    "WHERE s.k < 10 OR 30 > 20 ORDER BY s.k"
)
CORPUS["psm_join_of_const_true_derived"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM "
    "(SELECT * FROM region WHERE r_regionkey < 1 OR 3 > 2) AS l "
    "JOIN (SELECT * FROM region WHERE r_regionkey < 10 OR 30 > 20) AS r "
    "ON l.r_regionkey = r.r_regionkey"
)
CORPUS["psm_cross_join_count"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM region, nation WHERE region.r_regionkey = nation.n_regionkey"
)
CORPUS["psm_self_cross_equi"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation AS l, nation AS r WHERE l.n_regionkey = r.n_regionkey"
)
CORPUS["psm_count_from_one_row_derived"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT 1) t"
)
CORPUS["psm_expr_vs_expr_scan"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part "
    "WHERE p_size + p_retailprice < p_retailprice * p_size - 100"
)
CORPUS["psm_between_col_bound_pair"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part WHERE p_size BETWEEN p_partkey % 10 AND 45"
)

# -- cross-type comparison scans (reference corpus lines 35-40) --------------
CORPUS["xty_int_vs_fractional_ge"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part WHERE p_partkey >= 5.5"
)
CORPUS["xty_int_between_fractional_bounds"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part WHERE p_partkey BETWEEN 5.5 AND 8"
)
CORPUS["xty_int_between_mixed_bounds"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part WHERE p_size BETWEEN 20 AND 45.5"
)
CORPUS["xty_int_eq_float_literal"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part WHERE p_size = 10.0"
)
CORPUS["xty_string_gt_prefix"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part WHERE p_name > 'c'"
)
CORPUS["xty_string_ge_two_chars"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part WHERE p_name >= 'gr'"
)
CORPUS["xty_double_eq_int_literal"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part WHERE p_retailprice = 950"
)


# ---------------------------------------------------------------------------
# Round-5 parity sweep: the last untranslated shared-dialect families of the
# reference corpus (sqlite_testrunner_queries.sql) — NATURAL/USING joins,
# non-scalar BETWEEN, GROUP BY aliases/expressions, qualified stars, joins on
# constants and computed columns, literal-only predicates, COUNT(expr)
# variants, nested/non-equi-correlated EXISTS/IN, NULL-comparison scans,
# ORDER BY arithmetic over aggregates, and keyword case-insensitivity.
# Excluded from this sweep (documented): integer division/modulo by zero —
# SQLite yields NULL but BOTH engines of this harness (Spark ANSI mode and
# DuckDB) reject it, so the declared dialect rejects it too.
# ---------------------------------------------------------------------------
CORPUS.update({
    "join_natural_subq": "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation NATURAL JOIN (SELECT n_nationkey, n_regionkey FROM nation) t2",
    "join_using_key": "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders JOIN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000) t USING (o_orderkey)",
    "between_value_between_cols": "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem WHERE 0.05 BETWEEN l_discount AND l_tax",
    "between_col_col_lit": "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem WHERE l_discount BETWEEN l_tax AND 0.08",
    "between_expr_bounds": "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem WHERE l_quantity + 10 BETWEEN l_quantity AND l_quantity * 2",
    "distinct_over_agg": "SELECT DISTINCT CAST(MIN(p_size) AS INT) AS m FROM part GROUP BY p_brand",
    "groupby_alias": "SELECT p_brand AS x, CAST(SUM(p_size) AS BIGINT) AS s FROM part GROUP BY x",
    "having_on_alias": "SELECT p_brand AS x, CAST(COUNT(*) AS BIGINT) AS n FROM part GROUP BY x HAVING x > 'Brand#2'",
    "join_const_subq_eq": "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation JOIN (SELECT 2 AS rk) f ON n_regionkey = rk",
    "join_const_subq_lt": "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation JOIN (SELECT 2 AS rk) f ON n_regionkey < rk",
    "cross_of_agg_subqs": "SELECT * FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c1 FROM nation) s1, (SELECT CAST(COUNT(*) AS BIGINT) AS c2 FROM region) s2",
    "qualified_star_join": "SELECT n.*, r.r_name FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey",
    "qualified_star_reorder": "SELECT r.*, n.* FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey",
    "join_on_computed": "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation m1 JOIN nation m2 ON m1.n_nationkey * 3 = m2.n_nationkey - 5",
    "scan_literal_true": "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM region WHERE 4 > 3",
    "scan_literal_or": "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM region WHERE (4 > 3 AND 2 < 1) OR 4 < 5",
    "scan_literal_in": "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM region WHERE 50 IN (51, 52, 50)",
    "scan_literal_in_subq": "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM region WHERE 3 IN (SELECT n_regionkey FROM nation)",
    "scan_out_of_range": "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part WHERE p_size > -3000000000 AND p_size < 3000000000",
    "scan_value_on_left": "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part WHERE 40 >= p_size AND 10 <= p_size",
    "count_expr_matrix": "SELECT CAST(COUNT(1) AS BIGINT) AS a, CAST(COUNT(p_size + 1) AS BIGINT) AS b, CAST(COUNT(*) AS BIGINT) + 1 AS c, CAST(COUNT(1 + 2) AS BIGINT) AS d FROM part",
    "count_expr_grouped": "SELECT p_brand, CAST(COUNT(p_size + 1) AS BIGINT) AS n FROM part GROUP BY p_brand",
    "exists_nested": "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part WHERE EXISTS (SELECT 1 FROM nation WHERE EXISTS (SELECT 1 FROM region))",
    "exists_corr_nonequi": "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation r WHERE EXISTS (SELECT 1 FROM region s WHERE s.r_regionkey < r.n_regionkey)",
    "in_corr_nonequi": "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation r WHERE n_regionkey IN (SELECT r_regionkey FROM region s WHERE s.r_regionkey <= r.n_nationkey)",
    "orderby_agg_arith": "SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n FROM part GROUP BY p_brand ORDER BY 100 - COUNT(*) DESC, p_brand",
    "distinct_expr_orderby_limit": "SELECT DISTINCT p_size + p_partkey AS s FROM part ORDER BY s DESC LIMIT 10",
    "keyword_case_insensitive": "sELEcT CAST(Sum(p_size + p_size) AS BIGINT) AS sum_ss fRoM part",
    "groupby_expr_plus": "SELECT p_size + 1 AS k, CAST(COUNT(*) AS BIGINT) AS n FROM part GROUP BY p_size + 1",
    "groupby_expr_mod": "SELECT CAST(SUM(p_size) AS BIGINT) + CAST(COUNT(*) AS BIGINT) AS x FROM part GROUP BY p_partkey % 7",
    "substr_overflow": "SELECT SUBSTR('HELLO', 2, 3) AS s1, SUBSTR('HELLO', 5000, 20) AS s2",
    "exists_select_list": "SELECT EXISTS(SELECT 1) AS e, NOT EXISTS(SELECT 1 FROM region WHERE r_regionkey > 1000) AS ne",
    "like_in_case": "SELECT p_partkey AS k, CASE WHEN p_name LIKE '%red%' THEN 'has red' WHEN p_name NOT LIKE '%a%' THEN 'no a' ELSE p_type END AS c FROM part WHERE p_partkey <= 50",
    "like_percent_only": "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part WHERE p_name LIKE '%'",
    "case_simple_operand": "SELECT p_partkey AS k, CASE p_size % 2 WHEN 0 THEN 'even' WHEN 1 THEN 'odd' END AS par FROM part WHERE p_partkey <= 20",
    "null_compare_empty": "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part WHERE NOT EXISTS (SELECT 1 FROM part p2 WHERE p2.p_size > NULL)",
    "null_between_empty": "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part WHERE NOT EXISTS (SELECT 1 FROM part p2 WHERE p2.p_name BETWEEN NULL AND '')",
    "in_column_exprs": "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part WHERE p_size IN (p_partkey - 48, p_partkey + 1)",
    "alias_duplicate_cols": "SELECT p_size AS a1, p_size AS a2, p_brand AS b1, p_brand AS b2 FROM part WHERE p_partkey <= 20",
    "alias_subq_projection": "SELECT a1, b2 FROM (SELECT p_size AS a1, p_brand AS b2, p_size AS a3 FROM part WHERE p_partkey <= 30) t",
    "count_star_aliased_triple": "SELECT CAST(COUNT(*) AS BIGINT) AS c1, CAST(COUNT(*) AS BIGINT) AS c2, CAST(COUNT(*) AS BIGINT) AS c3 FROM nation GROUP BY n_regionkey",
    "count_from_literal_subq": "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT 1 AS one) t",
    "having_nonselected_agg": "SELECT p_brand, CAST(AVG(p_size) AS DOUBLE) AS av FROM part GROUP BY p_brand HAVING MAX(p_retailprice) > 1000 AND MIN(p_size) >= 1",
})



@pytest.fixture(scope="module", autouse=True)
def _spark_views(spark):
    from hyrise_spark.catalog import load_tables

    for name, df in load_tables(spark, SF_DIR, TABLES).items():
        df.createOrReplaceTempView(name)


# ---------------------------------------------------------------------------
# Round-7 ordered-pick & time-bucket family: the shared-dialect functions the
# new retrieval/time-series operators lean on — min_by/max_by (deterministic
# ordered picks on a scalar key, global + grouped + derived keys),
# date_trunc buckets in projections and predicates, and NTILE over a
# computed ordering.
# ---------------------------------------------------------------------------
CORPUS.update({
    "pick_min_by_global": "SELECT MIN_BY(o_orderkey, o_totalprice) AS k FROM orders WHERE o_orderkey <= 500",
    "pick_max_by_global": "SELECT MAX_BY(o_orderkey, o_totalprice) AS k FROM orders WHERE o_orderkey <= 500",
    "pick_min_by_group": "SELECT o_orderpriority, MIN_BY(o_orderkey, o_totalprice) AS cheapest FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority",
    "pick_max_by_group": "SELECT o_orderpriority, MAX_BY(o_orderkey, o_totalprice) AS dearest FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority",
    "pick_min_by_derived_key": "SELECT n_regionkey, MIN_BY(n_name, (n_nationkey * 7 % 11) * 100 + n_nationkey) AS pick FROM nation GROUP BY n_regionkey ORDER BY n_regionkey",
    # quantity alone has ties (integral values) and MIN_BY tie-breaking is
    # engine-specific; the declared dialect requires a UNIQUE ordering key,
    # so the key folds the picked id in (quantity steps are >= 1, orderkey
    # <= 1e5 at this SF, so the composite is collision-free and monotone).
    "pick_minmax_same_group": "SELECT l_returnflag, MIN_BY(l_orderkey, l_quantity * 100000 + l_orderkey) AS lo, MAX_BY(l_orderkey, l_quantity * 100000 + l_orderkey) AS hi FROM lineitem WHERE l_orderkey <= 300 GROUP BY l_returnflag ORDER BY l_returnflag",
    "tbucket_trunc_day_count": "SELECT CAST(COUNT(DISTINCT DATE_TRUNC('day', ts)) AS BIGINT) AS days FROM events",
    "tbucket_trunc_month_group": "SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS m, CAST(COUNT(*) AS BIGINT) AS n FROM orders WHERE o_orderkey <= 2000 GROUP BY m ORDER BY m",
    "tbucket_trunc_in_where": "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events WHERE DATE_TRUNC('day', ts) = TIMESTAMP '2024-01-05 00:00:00'",
    "tbucket_ntile_computed": "SELECT b, CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS b FROM orders WHERE o_orderkey <= 400) GROUP BY b ORDER BY b",
})

# Round-7 BY-ALL family: GROUP BY ALL / ORDER BY ALL are shared dialect
# (Spark >= 3.4 / 4.0 and DuckDB both resolve ALL positionally over the
# non-aggregate select items) — the modern shorthand a switching user types.
CORPUS.update({
    "byall_group_simple": "SELECT o_orderpriority, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n FROM orders GROUP BY ALL ORDER BY ALL",
    "byall_group_expression": "SELECT n_regionkey * 2 AS rk2, CAST(COUNT(*) AS BIGINT) AS n FROM nation GROUP BY ALL ORDER BY ALL",
    "byall_order_only": "SELECT n_name, n_regionkey FROM nation ORDER BY ALL",
    "byall_group_with_having": "SELECT l_returnflag, l_linestatus, CAST(SUM(l_quantity) AS BIGINT) AS q FROM lineitem GROUP BY ALL HAVING SUM(l_quantity) > 100 ORDER BY ALL",
    "byall_join_group": "SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY ALL ORDER BY ALL",
})

# Round-7 shared scalar-function family over real columns: split_part,
# pad/repeat/reverse/left/right, greatest/least, nullif, position, translate
# — verbatim-identical semantics verified on literals first, pinned here on
# table data (the functions a switching user's ETL expressions lean on).
CORPUS.update({
    "strfn_split_part": "SELECT n_name, split_part(n_name, '_', 2) AS num FROM nation ORDER BY n_name",
    "strfn_pad": "SELECT n_nationkey, lpad(CAST(n_nationkey AS VARCHAR(8)), 4, '0') AS padded, rpad(n_name, 12, '.') AS dotted FROM nation ORDER BY n_nationkey",
    "strfn_repeat_reverse": "SELECT r_name, repeat(left(r_name, 2), 2) AS rep, reverse(r_name) AS rev FROM region ORDER BY r_name",
    "strfn_left_right_group": "SELECT left(p_type, 6) AS fam, CAST(COUNT(*) AS BIGINT) AS n FROM part GROUP BY fam ORDER BY fam",
    "strfn_greatest_least": "SELECT o_orderkey, greatest(CAST(FLOOR(o_totalprice) AS BIGINT), o_orderkey * 100) AS g, least(CAST(FLOOR(o_totalprice) AS BIGINT), o_orderkey * 100) AS l FROM orders WHERE o_orderkey <= 50 ORDER BY o_orderkey",
    "strfn_nullif_coalesce": "SELECT n_nationkey, coalesce(nullif(n_regionkey, 0), -1) AS r FROM nation ORDER BY n_nationkey",
    "strfn_position": "SELECT n_name, position('_' IN n_name) AS us FROM nation ORDER BY n_name",
    "strfn_translate": "SELECT r_name, translate(r_name, 'AE', 'ae') AS t FROM region ORDER BY r_name",
})

# Round-7 WITHIN GROUP ordered-set aggregates — shared dialect; inputs stay
# on the integer lattice (medians of integers are exact x.0/x.5 doubles) and
# the mode groups have strict count margins, so results are deterministic.
CORPUS.update({
    "wgq_percentile_cont_group": "SELECT l_returnflag, percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity) AS med FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "wgq_percentile_disc": "SELECT CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY n_nationkey) AS BIGINT) AS q1 FROM nation",
    "wgq_mode_within_group": "SELECT l_linestatus, mode() WITHIN GROUP (ORDER BY l_returnflag) AS m FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus",
})


# -- correlated columns inside a subquery's SELECT list (corpus lines
# 385-386, 390) — verbatim shapes, engine-routed: Spark rejects the outer
# reference in a subquery projection, so these run through Engine.execute
# (the _rewrite_correlated_scalar_projection hoist); DuckDB runs the SAME
# text natively, pinning that the hoist is semantics-preserving.
ENGINE_CORPUS: dict[str, str] = {
    # line 385: SELECT (SELECT MAX(b) + id_int_int_int_100.a FROM mixed) ...
    "ecsq_outer_col_in_projection": (
        "SELECT (SELECT MAX(p_size) + nation.n_nationkey FROM part) AS foo "
        "FROM nation"
    ),
    # line 386: two outer columns inside the projection
    "ecsq_two_outer_cols_in_projection": (
        "SELECT (SELECT MAX(p_size) + nation.n_nationkey + nation.n_regionkey "
        "FROM part) AS foo FROM nation"
    ),
    # line 390: outer alias inside a WHERE-side scalar subquery projection
    "ecsq_outer_col_in_where_subquery": (
        "SELECT n_name FROM nation AS r WHERE n_nationkey + 1 = "
        "(SELECT MIN(p_size) + r.n_nationkey FROM part)"
    ),
    # subtraction leg + literal mixed with the outer term
    "ecsq_outer_col_subtracted": (
        "SELECT n_name, (SELECT MAX(p_size) - nation.n_nationkey + 1 "
        "FROM part) AS d FROM nation"
    ),
    # the subquery's own alias shadows nothing: p-qualified cols stay inside
    "ecsq_own_alias_kept_inside": (
        "SELECT (SELECT MAX(p.p_size) + nation.n_nationkey FROM part p "
        "WHERE p.p_partkey > 0) AS foo FROM nation"
    ),
    # IN-list context: the aggregate guarantees one row, so the hoisted
    # scalar keeps IN's membership semantics (x IN (e) = x = e)
    "ecsq_outer_col_in_in_list": (
        "SELECT n_name FROM nation AS r WHERE n_nationkey IN "
        "(SELECT MIN(p_size) + r.n_regionkey FROM part)"
    ),
}


def _assert_same_result(name, sdf, duck, sql):
    scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
    res = duck.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(c.lower() for c in scols) == sorted(c.lower() for c in ocols), (
        f"{name}: cols {scols} vs {ocols}"
    )
    assert len(srows) == len(orows), f"{name}: rowcount {len(srows)} vs {len(orows)}"
    sc, oc = canon([c.lower() for c in scols], srows), canon([c.lower() for c in ocols], orows)
    for a, b in zip(sc, oc):
        assert a == b, f"{name}:\n spark : {a}\n duckdb: {b}"


@pytest.mark.parametrize("name", sorted(CORPUS))
def test_sql_corpus(spark, duck, name):
    sql = CORPUS[name]
    _assert_same_result(name, spark.sql(sql), duck, sql)


@pytest.mark.parametrize("name", sorted(ENGINE_CORPUS))
def test_engine_sql_corpus(spark, duck, name):
    from hyrise_spark.engine import Engine

    sql = ENGINE_CORPUS[name]
    _assert_same_result(name, Engine(spark).execute(sql), duck, sql)
