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


@pytest.fixture(scope="module", autouse=True)
def _spark_views(spark):
    from hyrise_spark.catalog import load_tables

    for name, df in load_tables(spark, SF_DIR, TABLES).items():
        df.createOrReplaceTempView(name)


@pytest.mark.parametrize("name", sorted(CORPUS))
def test_sql_corpus(spark, duck, name):
    sql = CORPUS[name]
    sdf = spark.sql(sql)
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
