-- JOB triple-alias shape (job_q19): three aliased copies of orders on one
-- customer (1996 AND 1997 AND 1998 big orders)
SELECT CAST(MIN(c_custkey) AS BIGINT) AS min_cust,
       CAST(MIN(o1.o_orderkey) AS BIGINT) AS min_o1,
       CAST(MIN(o2.o_orderkey) AS BIGINT) AS min_o2,
       CAST(MIN(o3.o_orderkey) AS BIGINT) AS min_o3
FROM customer
JOIN orders o1 ON o1.o_custkey = c_custkey
JOIN orders o2 ON o2.o_custkey = c_custkey
JOIN orders o3 ON o3.o_custkey = c_custkey
WHERE c_mktsegment = 'MACHINERY'
  AND o1.o_orderdate >= TIMESTAMP '1996-01-01' AND o1.o_orderdate < TIMESTAMP '1997-01-01'
  AND o2.o_orderdate >= TIMESTAMP '1997-01-01' AND o2.o_orderdate < TIMESTAMP '1998-01-01'
  AND o3.o_orderdate >= TIMESTAMP '1998-01-01' AND o3.o_orderdate < TIMESTAMP '1999-01-01'
  AND o1.o_totalprice > 200000 AND o2.o_totalprice > 200000 AND o3.o_totalprice > 200000
