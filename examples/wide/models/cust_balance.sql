CREATE TABLE cust_balance AS SELECT c_mktsegment, COUNT(*) AS n, AVG(c_acctbal) AS bal FROM customer GROUP BY c_mktsegment
