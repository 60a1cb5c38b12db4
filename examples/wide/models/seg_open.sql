CREATE TABLE seg_open AS SELECT o_orderpriority, COUNT(*) AS n, SUM(o_totalprice) AS rev FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderpriority
