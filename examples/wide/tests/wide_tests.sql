ASSERT (SELECT COUNT(*) FROM summary) = 1 AS 'summary exists'
