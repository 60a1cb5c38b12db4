"""Guarded block-width cap shared by the label-blocked pairwise ops
(dedup_embedding_cosine, sim_join_topk).

A blocked self-join is quadratic in block width, so one hot block (a
dominant label / IVF cell) re-introduces the O(n^2) term at 100 TB.
The guard: blocks no wider than ``BLOCK_CAP`` are compared exactly
(all pairs); wider blocks are first split into ``ceil(width/cap)``
deterministic sub-buckets and only within-bucket pairs are compared.
That bounds candidate volume to O(n * cap) with a hard ceiling, at the
cost of missing cross-bucket pairs inside oversized blocks — the
documented trade: upstream LSH/IVF stages are the real candidate source
at scale, and this cap keeps the exact-verification tail from going
quadratic when a block degenerates.

The sub-bucket hash is a Knuth multiplicative hash of the row id —
pure integer arithmetic, so Spark and the DuckDB oracle agree
bit-for-bit (no engine-specific hash functions involved).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BLOCK_CAP = 64
_KNUTH = 2654435761  # 2^32 * golden-ratio conjugate; (id%16384)*K < 2^46


def sub_bucket(id_col: Column, width: Column, cap: int) -> Column:
    """Deterministic sub-bucket in [0, ceil(width/cap)): identically 0
    while width <= cap, i.e. the cap only engages on oversized blocks."""
    n_sub = F.floor((width + F.lit(cap - 1)) / F.lit(cap)).cast("long")
    return ((id_col % 16384) * F.lit(_KNUTH)) % n_sub


def sub_bucket_sql(id_expr: str, partition_expr: str, cap: int) -> str:
    """DuckDB twin of :func:`sub_bucket` (window count as the width)."""
    return (
        f"(({id_expr} % 16384) * {_KNUTH}) % "
        f"((COUNT(*) OVER (PARTITION BY {partition_expr}) + {cap - 1}) // {cap})"
    )
