CREATE TABLE flag_stats AS SELECT l_returnflag, l_linestatus, COUNT(*) AS n, AVG(l_quantity) AS q FROM lineitem GROUP BY l_returnflag, l_linestatus
