"""SQL-surface parity operators (SURVEY.md §2.B), one module per family.

Importing this package registers every query key in the registry.
"""

from powersql_spark.operators import (  # noqa: F401
    aggregates,
    analytics,
    analytics_ext,
    asserts,
    connectors,
    extensions,
    functions,
    functions_ext,
    joins,
    projection,
    scans,
    sorts_sets,
    stats_more,
    stats_more2,
    stats_r13,
    stats_r13b,
    subqueries,
    tpch,
    tpch_more,
)
