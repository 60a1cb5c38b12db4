CREATE TABLE seg_auto AS SELECT o_orderpriority, COUNT(*) AS n, SUM(o_totalprice) AS rev FROM orders WHERE o_orderstatus = 'O' GROUP BY o_orderpriority
