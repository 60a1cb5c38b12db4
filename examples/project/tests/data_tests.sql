-- Data tests for the tpch_revenue example project, written against
-- testdata-native invariants of the lineitem -> revenue ->
-- rev_per_product -> top_products model chain. Same ASSERT grammar the
-- reference supports (reference src/main.rs:167-190), original corpus.

-- Every aggregated product must trace back to a lineitem source row.
ASSERT NOT EXISTS (
    SELECT p.product_id
    FROM rev_per_product p
    WHERE p.product_id NOT IN (SELECT l_partkey FROM lineitem)
) AS 'rev_per_product keys all exist in lineitem';

-- Revenue is price * (1 - discount) with discount in [0, 1]: never
-- negative per row, and in aggregate never above the undiscounted sum.
ASSERT NOT EXISTS (
    SELECT 1
    FROM revenue
    WHERE euro < 0
) AS 'euro non-negative';

ASSERT (
    SELECT SUM(euro) FROM revenue
) <= (
    SELECT SUM(l_extendedprice) + 1e-6 FROM lineitem
) AS 'discounts never increase revenue';

-- The per-product rollup must conserve total revenue (no rows lost or
-- double-counted by the GROUP BY).
ASSERT (
    SELECT ABS(SUM(rev) - (SELECT SUM(euro) FROM revenue))
    FROM rev_per_product
) < 1e-4 AS 'rollup conserves total revenue';

-- top_products is a LIMIT 100 over the rollup: never larger than its
-- input and never larger than 100.
ASSERT (
    SELECT COUNT(*) FROM top_products
) <= 100 AS 'top_products capped at 100 rows';

-- Ranking sanity: the worst kept product still beats (or ties) the
-- best product left out of top_products.
ASSERT NOT EXISTS (
    SELECT 1
    FROM rev_per_product p
    WHERE p.product_id NOT IN (SELECT product_id FROM top_products)
        AND p.rev > (SELECT MIN(rev) FROM top_products)
) AS 'no excluded product outranks a kept one';
