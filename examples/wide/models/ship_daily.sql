CREATE TABLE ship_daily AS SELECT CAST(l_shipdate AS DATE) AS d, COUNT(*) AS n FROM lineitem GROUP BY CAST(l_shipdate AS DATE)
