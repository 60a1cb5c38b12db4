CREATE TABLE part_sizes AS SELECT p_brand, COUNT(*) AS n FROM part GROUP BY p_brand
