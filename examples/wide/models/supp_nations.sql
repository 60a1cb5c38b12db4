CREATE TABLE supp_nations AS SELECT s_nationkey, COUNT(*) AS n FROM supplier GROUP BY s_nationkey
