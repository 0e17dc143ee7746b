-- JOB anti-join-in-chain shape (job_q16): never-bulk-returned parts,
-- chain continuing through orders -> customer -> nation
SELECT CAST(MIN(l_orderkey) AS BIGINT) AS min_orderkey,
       MIN(p_name) AS min_part, MIN(n_name) AS min_nation,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE p_type = 'LARGE' AND p_size < 4
  AND o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
  AND NOT EXISTS (
    SELECT 1 FROM lineitem lr
    WHERE lr.l_partkey = part.p_partkey AND lr.l_returnflag = 'R'
      AND lr.l_quantity >= 48 AND lr.l_shipdate >= TIMESTAMP '1998-01-01'
  )
