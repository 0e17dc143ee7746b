-- JOB cycle shape (job_q14): lineitem -> orders -> customer -> nation <- supplier,
-- customer and supplier in the SAME nation (join-graph cycle through nation)
SELECT CAST(MIN(l_orderkey) AS BIGINT) AS min_orderkey,
       MIN(n_name) AS min_nation,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN supplier ON s_nationkey = n_nationkey AND l_suppkey = s_suppkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_quantity > 40
