"""LLM-data-pipeline extensions (driver north star; beyond the reference).

Importing this package registers the dedup / similarity / text /
multimodal query keys.
"""

from powersql_spark.pipeline import (  # noqa: F401
    analytics_r13,
    bpe,
    curation,
    dedup,
    embeddings,
    evalmetrics,
    graph,
    layout,
    linkage,
    multimodal,
    profiling,
    retrieval,
    similarity,
    sketches,
    text,
    text_r13,
    text_r13b,
    timeseries,
    ts_r13,
    ts_r13b,
)
