-- The reference's flagship model chain (examples/postgres/models/
-- revenue.sql:1-9) adapted to the testdata star schema: lineitem is an
-- external source table; revenue and rev_per_product are models.
CREATE VIEW revenue AS
SELECT l_partkey AS product_id,
    l_extendedprice * (1 - l_discount) AS euro
FROM lineitem;

CREATE VIEW rev_per_product AS
SELECT SUM(euro) AS rev,
    COUNT(*) AS quantity,
    product_id
FROM revenue
GROUP BY product_id;

CREATE TABLE top_products AS
SELECT product_id, rev, quantity
FROM rev_per_product
ORDER BY rev DESC, product_id
LIMIT 100;
