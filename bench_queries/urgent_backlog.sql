-- open urgent orders per region
SELECT r_name, CAST(COUNT(*) AS BIGINT) AS open_urgent
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE o_orderstatus = 'O' AND o_orderpriority = '1-URGENT'
GROUP BY r_name
ORDER BY r_name
