"""Embedding-column operators over the ``embeddings`` table (driver
north-star extension; NOT in the reference — its surface ends at SQL
orchestration, src/execute.rs:101).

Two primitives every vector pipeline needs before ANN search:

- ``emb_centroids``: per-label mean vector — the k-means/IVF "update"
  step and the coarse quantizer that sim_topk_ivf consumes. Computed as
  the distributed columnar reduce: posexplode to (label, pos, val),
  aggregate per (label, pos). The shuffle carries scalar partial sums
  (ncells × dim groups), never whole vectors — at 100 TB the map-side
  combine reduces each partition to ncells × dim values before the
  exchange, so the reduce is O(cells·dim·partitions) regardless of row
  count.
- ``emb_norm_quantize``: per-vector L2 norm + symmetric int8
  quantization stats (scale = 127/max|x|) — the compression pass before
  shipping vectors to an index. Map-only, no shuffle; output inherits
  the input partitioning.

Cross-engine determinism: float32 → DOUBLE is exact on both engines;
sums that feed the value hash go through DECIMAL(18,6) (order-free) and
quantized values use FLOOR (identical semantics; ``round`` half-up vs
half-even would diverge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from powersql_spark.operators.common import (
    DEC,
    sql_double_array,
    sql_jround,
    sqdist_unrolled,
)
from powersql_spark.catalog import values_df
from powersql_spark.registry import query

_DIM = 64


@query(
    "emb_centroids",
    oracle=f"""
    SELECT label,
           CAST(i - 1 AS INTEGER) AS pos,
           CAST(SUM(CAST(CAST(list_extract(embedding, i) AS DOUBLE)
                         AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
               AS centroid,
           COUNT(*) AS n_vecs
    FROM embeddings, unnest(range(1, {_DIM + 1})) AS u(i)
    GROUP BY label, i
    """,
)
def emb_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding — the centroid/coarse-quantizer update,
    emitted long-form as (label, pos, centroid) so the result is
    hash-comparable without array canonicalization.

    Scale shape: posexplode is map-side; the groupBy(label, pos) gets a
    partial HashAggregate before the exchange, so each partition ships
    at most ncells × dim partial sums — the canonical distributed
    columnar reduce. Reassembling the array (collect_list over pos) is
    a driver-cheap follow-up left to the consumer."""
    e = spark.table("embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(
            (
                F.sum(F.col("v").cast("double").cast("decimal(18,6)"))
                .cast("double")
                / F.count("*")
            ).alias("centroid"),
            F.count("*").alias("n_vecs"),
        )
    )


@query(
    "emb_norm_quantize",
    oracle="""
    WITH d AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    s AS (
        SELECT vec_id, label, v,
               sqrt(list_sum(list_transform(v, x -> x * x))) AS norm,
               list_max(list_transform(v, x -> abs(x))) AS maxabs
        FROM d
    )
    SELECT vec_id, label,
           round(norm, 4) AS l2_norm,
           CAST(list_min(list_transform(v,
                x -> CAST(floor(x * 127.0 / maxabs) AS BIGINT))) AS INTEGER)
               AS q_min,
           CAST(list_max(list_transform(v,
                x -> CAST(floor(x * 127.0 / maxabs) AS BIGINT))) AS INTEGER)
               AS q_max,
           CAST(list_sum(list_transform(v,
                x -> CAST(floor(x * 127.0 / maxabs) AS BIGINT))) AS BIGINT)
               AS q_sum
    FROM s
    """,
)
def emb_norm_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norm + symmetric int8 quantization stats: scale =
    127/max|x|, q = floor(x·scale). Emits min/max/sum of the quantized
    codes (the checksum an index-build verifies) rather than the int8
    array itself, keeping the row hashable.

    Map-only over the vector column — no shuffle, no UDF; every lambda
    runs as a codegen'd higher-order function. FLOOR (not round) keeps
    Spark and DuckDB bit-identical; float→double is exact on both."""
    e = spark.table("embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    d = e.select("vec_id", "label", v.alias("v")).select(
        "vec_id",
        "label",
        "v",
        F.sqrt(
            F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x)
        ).alias("norm"),
        F.array_max(F.transform("v", F.abs)).alias("maxabs"),
    )
    q = F.transform(
        "v",
        lambda x: F.floor(x * F.lit(127.0) / F.col("maxabs")),
    )
    return d.select(
        "vec_id",
        "label",
        F.round("norm", 4).alias("l2_norm"),
        F.array_min(q).cast("int").alias("q_min"),
        F.array_max(q).cast("int").alias("q_max"),
        F.aggregate(
            q, F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("q_sum"),
    )


_PQ_M = 8  # subspaces
_PQ_D = _DIM // _PQ_M  # dims per subspace
_PQ_K = 16  # codebook entries per subspace


# _sqdist_unrolled moved to operators.common.sqdist_unrolled (wave 13
# shares it with the pairwise-cosine family); alias kept for callers.
_sqdist_unrolled = sqdist_unrolled

@query(
    "emb_pq_encode",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
        FROM embeddings
    ),
    cb AS (
        SELECT vec_id AS k, m,
               list_slice(ve, m * {_PQ_D} + 1, m * {_PQ_D} + {_PQ_D})
                   AS cvec
        FROM v, unnest(range(0, {_PQ_M})) AS u(m)
        WHERE vec_id < {_PQ_K}
    ),
    sub AS (
        SELECT vec_id, m,
               list_slice(ve, m * {_PQ_D} + 1, m * {_PQ_D} + {_PQ_D})
                   AS svec
        FROM v, unnest(range(0, {_PQ_M})) AS u(m)
    ),
    d AS (
        SELECT s.vec_id, s.m, c.k,
               round(list_sum(list_transform(range(1, {_PQ_D + 1}),
                   i -> (list_extract(svec, i) - list_extract(cvec, i))
                      * (list_extract(svec, i) - list_extract(cvec, i)))),
                   6) AS dist
        FROM sub s JOIN cb c USING (m)
    ),
    best AS (
        SELECT vec_id, m, k, dist
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id, m ORDER BY dist, k) AS rn FROM d)
        WHERE rn = 1
    )
    SELECT b.vec_id, any_value(v.label) AS label,
           string_agg(CAST(b.k AS VARCHAR), '-' ORDER BY b.m) AS pq_code,
           CAST(round(SUM(CAST(b.dist AS DECIMAL(18,6))), 4) AS DOUBLE)
               AS recon_err
    FROM best b JOIN v USING (vec_id)
    GROUP BY b.vec_id
    """,
)
def emb_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (Jegou et al. 2011): split each vector into
    8 subspaces of 8 dims, encode each subvector as the id of its
    nearest codebook entry — 64 floats become 8 nibbles, the
    compression that makes billion-vector ANN indexes fit in RAM. The
    codebook here is the deterministic sample "vectors 0..15"
    (documented stand-in; the k-means-trained path is demonstrated by
    sim_topk_ivf_learned). Emits the code string plus reconstruction
    error (the quantity PQ training minimizes), distances rounded
    before argmin so both engines pick identical codes.

    Scale shape: the codebook is 8x16 rows — broadcast; the scan
    explodes each vector into 8 subvector rows map-side, the distance
    join is broadcast (no shuffle), and the only exchange is the final
    groupBy(vec_id) carrying (m, k, dist) triples, not vectors."""
    e = spark.table("embeddings")
    v = e.select(
        "vec_id",
        "label",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "ve"
        ),
    )
    m = F.explode(F.sequence(F.lit(0), F.lit(_PQ_M - 1))).alias("m")
    subv = F.slice(
        "ve", F.col("m") * _PQ_D + 1, F.lit(_PQ_D)
    )
    sub = (
        v.select("vec_id", "label", "ve", m)
        .select("vec_id", "label", "m", subv.alias("svec"))
    )
    cb = (
        v.where(F.col("vec_id") < _PQ_K)
        .select(F.col("vec_id").alias("k"), "ve", m)
        .select("k", "m", subv.alias("cvec"))
    )
    dist = F.round(_sqdist_unrolled("svec", "cvec", _PQ_D), 6)
    d = sub.join(F.broadcast(cb), "m").select(
        "vec_id", "label", "m", "k", dist.alias("dist")
    )
    best = d.groupBy("vec_id", "m").agg(
        F.any_value("label").alias("label"),
        F.min_by("k", F.struct("dist", "k")).alias("k"),
        F.min("dist").alias("dist"),
    )
    code = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("m", "k"))),
            lambda s: s["k"].cast("string"),
        ),
        "-",
    )
    return best.groupBy("vec_id").agg(
        F.any_value("label").alias("label"),
        code.alias("pq_code"),
        # exact decimal sum of the 6dp distances, rounded in decimal:
        # double summation could land on a half-up/half-even boundary
        F.round(F.sum(F.col("dist").cast("decimal(18,6)")), 4)
        .cast("double")
        .alias("recon_err"),
    )


@query(
    "emb_whitening",
    # The eigendecomposition has no SQL form; the replayable claim is
    # the semantic gate itself — the covariance of the distributed
    # whitened output IS the identity — emitted per row and matched
    # against the oracle's TRUE rows (banded boolean-gate pattern).
    oracle="""
    SELECT vec_id, label, TRUE AS whitening_identity_ok
    FROM embeddings
    """,
)
def emb_whitening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZCA whitening of the embedding table (the retrieval-quality
    transform: decorrelate dimensions and equalize variance so cosine
    is not dominated by a few high-variance axes — the standard fix
    for anisotropic embedding spaces).

    Scale shape — model fit then map-only apply, the MLlib pattern
    without MLlib:
    1. Sufficient statistics (n, sum vector, gram matrix X'X) via ONE
       Arrow ``mapInPandas`` pass — each batch emits its 64x64 gram as
       (i, j, partial) rows from a single numpy matmul (the documented
       4x win over interpreted HOFs, see dedup_embedding_lsh), and the
       groupBy ships at most 64^2+64+1 partials per partition
       regardless of row count.
    2. The eigendecomposition runs on the collected 64x64 matrix —
       model-parameter-sized driver work, same class as the BPE vocab
       loop and the IVF centroids.
    3. Apply returns to the executors as plan literals: per row, 64
       JVM dot products (the whitened components), whose covariance a
       second suffstats pass then checks against the identity.

    The emitted claim is semantic and hash-verified: a SECOND
    sufficient-stats pass over the distributed whitened vectors checks
    their covariance is the IDENTITY matrix (and their mean zero),
    which verifies mean, covariance, eigendecomposition and the apply
    step all at once; per-component numerics are additionally pinned
    against a numpy replay in tests/test_semantics.py."""
    import numpy as np
    import pandas as pd

    from powersql_spark.pipeline.similarity import _to_double

    dim = 64
    e = spark.table("embeddings")
    emb = e.select("vec_id", "label", _to_double("embedding").alias("x"))

    def _suffstats(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.asarray(list(pdf["x"]), dtype=np.float64)
            gram = m.T @ m
            i_idx, j_idx = np.triu_indices(dim)
            out = pd.DataFrame(
                {
                    "i": np.concatenate(
                        [i_idx, np.arange(dim), [dim]]
                    ).astype("int64"),
                    "j": np.concatenate(
                        [j_idx, np.full(dim, -1), [-1]]
                    ).astype("int64"),
                    "v": np.concatenate(
                        [gram[i_idx, j_idx], m.sum(axis=0), [len(m)]]
                    ),
                }
            )
            yield out

    partials = emb.select("x").mapInPandas(
        _suffstats, schema="i bigint, j bigint, v double"
    )
    stats = partials.groupBy("i", "j").agg(F.sum("v").alias("v")).collect()
    n_total = 0.0
    sums = np.zeros(dim)
    gram = np.zeros((dim, dim))
    for r in stats:  # <= 64^2/2 + 64 + 1 rows — model-parameter-sized
        if r["i"] == dim:
            n_total = r["v"]
        elif r["j"] == -1:
            sums[r["i"]] = r["v"]
        else:
            gram[r["i"], r["j"]] = gram[r["j"], r["i"]] = r["v"]
    if n_total < 2:
        return emb.select(
            "vec_id",
            "label",
            F.lit(False).alias("whitening_identity_ok"),
        ).limit(0)
    mu = sums / n_total
    cov = gram / n_total - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)
    evals = np.maximum(evals, 1e-12)
    wmat = evecs @ np.diag(evals**-0.5) @ evecs.T  # ZCA: W = C^(-1/2)

    # Plan-literal application, one-expr form: the old per-element
    # F.lit construction (64 + 64x64 = 4160 py4j round trips, 64
    # separate aggregate-expression trees) dominated this key's
    # build/analysis time (10-19 s in the timing sweeps; measured A/B
    # this round: 2.4-7.1 s build -> 0.3 s). One F.expr carries mu and
    # W as SQL-text literals (sql_double round-trips each IEEE double
    # exactly) and applies the same arithmetic in the same order
    # (zip_with is elementwise, aggregate folds left-to-right), so the
    # whitened values are bit-identical — verified A/B in-session and
    # by the oracle drive at sf0.01 + sf0.1.
    mu_sql = sql_double_array(mu)
    w_sql = (
        "array(" + ",".join(sql_double_array(row) for row in wmat) + ")"
    )
    comps = F.expr(
        f"transform({w_sql}, row -> aggregate("
        f"zip_with(zip_with(x, {mu_sql}, (a, b) -> a - b), row,"
        f" (a, b) -> a * b), 0.0D, (acc, v) -> acc + v))"
    )

    # Second sufficient-stats pass, this time over the DISTRIBUTED
    # whitened vectors: their covariance must be the identity. This is
    # the complete semantic gate (it verifies mean, covariance,
    # eigendecomposition AND the apply step at once), computed from
    # the executors' own output rather than a driver-side replay, and
    # emitted as the oracle-checkable claim.
    wstats = (
        emb.select(comps.alias("x"))
        .mapInPandas(_suffstats, schema="i bigint, j bigint, v double")
        .groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
        .collect()
    )
    wn = 0.0
    wsums = np.zeros(dim)
    wgram = np.zeros((dim, dim))
    for r in wstats:
        if r["i"] == dim:
            wn = r["v"]
        elif r["j"] == -1:
            wsums[r["i"]] = r["v"]
        else:
            wgram[r["i"], r["j"]] = wgram[r["j"], r["i"]] = r["v"]
    wmu = wsums / wn
    wcov = wgram / wn - np.outer(wmu, wmu)
    ok = bool(
        np.abs(wcov - np.eye(dim)).max() < 1e-6
        and np.abs(wmu).max() < 1e-6
    )
    return emb.select(
        "vec_id",
        "label",
        F.lit(ok).alias("whitening_identity_ok"),
    )


@query(
    "emb_outlier_distance",
    # Cross-engine determinism scheme: every quantity that is
    # structurally a TERMINATING decimal (the 6dp-rounded squared
    # deviations, their sum, dist^2) is computed in DECIMAL — exact and
    # engine-identical — so the only doubles that get rounded are
    # irrational (sqrt outputs, z quotients), where a half-boundary
    # landing is measure-zero. Rounding doubles that can terminate on
    # the boundary flips between engines (51 rows at sf0.1 before).
    oracle=f"""
    WITH cent AS (
        -- c is NOT rounded: the decimal-sum -> double -> division
        -- chain is bit-identical cross-engine, while rounding the
        -- rational quotient can land exactly on a 6dp half boundary
        -- (count | 2*sum*10^6) and flip between engines — one flipped
        -- centroid component shifts every distance in its label.
        SELECT label, i,
               CAST(SUM(CAST(CAST(list_extract(embedding, i)
                              AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE)
                     / COUNT(*) AS c
        FROM embeddings, unnest(range(1, {_DIM + 1})) AS u(i)
        GROUP BY label, i
    ),
    carr AS (
        SELECT label, list(c ORDER BY i) AS c FROM cent GROUP BY label
    ),
    dist AS (
        SELECT vec_id, e.label,
               round(sqrt(CAST(list_sum(
                   list_transform(range(1, {_DIM + 1}),
                       i -> CAST(round(pow(
                                CAST(list_extract(e.embedding, i)
                                     AS DOUBLE)
                                - list_extract(carr.c, i), 2), 6)
                             AS DECIMAL(18,6)))) AS DOUBLE)), 6) AS dist
        FROM embeddings e JOIN carr USING (label)
    ),
    mom AS (
        SELECT label,
               CAST(SUM(CAST(dist AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*) AS mu,
               sqrt(greatest(
                   CAST(SUM(round(CAST(dist AS DECIMAL(18,6))
                                  * CAST(dist AS DECIMAL(18,6)), 6))
                        AS DOUBLE)
                       / COUNT(*)
                   - pow(CAST(SUM(CAST(dist AS DECIMAL(18,6)))
                              AS DOUBLE) / COUNT(*), 2),
                   0.0)) AS sd
        FROM dist GROUP BY label
    )
    SELECT d.vec_id, d.label, d.dist,
           round((d.dist - m.mu) / m.sd, 4) AS z,
           round((d.dist - m.mu) / m.sd, 4) > 2.0 AS is_outlier
    FROM dist d JOIN mom m USING (label)
    """,
)
def emb_outlier_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance-to-centroid outlier scoring: each vector's L2 distance
    to its label centroid, z-scored within the label (population
    moments), outliers flagged at z > 2 — the embedding-space
    mislabel/contamination screen run before training on labeled
    vectors (outliers are candidate label errors or off-distribution
    docs).

    Spark shape: centroids come from the same columnar posexplode
    reduce as emb_centroids (shuffle carries scalar partials, never
    vectors), re-assembled to a label-keyed array and BROADCAST — the
    distance pass is then map-only over the corpus (codegen'd
    zip_with/aggregate fold in array order), and the moments are one
    tiny per-label aggregate broadcast back. Two corpus scans total
    (centroid pass + distance pass), the same two-pass bound as any
    exact mean-then-residual computation. Per-term squares round to
    6dp and fold in index order; moment sums are decimal — the z
    threshold compares identical 4dp values cross-engine."""
    e = spark.table("embeddings")
    expl = e.select(
        "label", F.posexplode("embedding").alias("i", "x")
    )
    cent = (
        expl.groupBy("label", "i")
        .agg(
            (
                F.sum(F.col("x").cast("double").cast(DEC)).cast(
                    "double"
                )
                / F.count("*")
            ).alias("c")
        )
    )
    from powersql_spark.catalog import track_persist

    # `carr` sits under BOTH corpus passes (the distance map and, via
    # `dist`, the moment aggregate + final join); uncached the plan
    # would embed the fact-sized centroid reduce once per branch. It
    # is O(labels) rows — persist it.
    carr = track_persist(
        cent.groupBy("label").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "c"))),
                lambda s: s.c,
            ).alias("c")
        )
    )
    # The squared deviations are summed in DECIMAL (exact, identical
    # in DuckDB's list_sum over decimals), so the only rounded doubles
    # downstream are sqrt outputs — irrational, never ON a boundary.
    dd = F.zip_with(
        F.transform("embedding", lambda x: x.cast("double")),
        "c",
        lambda x, c: F.round(F.pow(x - c, 2), 6).cast(DEC),
    )
    dist = e.join(F.broadcast(carr), "label").select(
        "vec_id",
        "label",
        F.round(
            F.sqrt(
                F.aggregate(
                    dd,
                    F.lit(0).cast("decimal(38,6)"),
                    lambda acc, x: acc + x,
                ).cast("double")
            ),
            6,
        ).alias("dist"),
    )
    mu = F.sum(F.col("dist").cast(DEC)).cast("double") / F.count("*")
    # dist is a 6dp decimal: its square terminates at 12dp and CAN sit
    # exactly on a 6dp half boundary — square and round in DECIMAL
    # (half-up both engines) instead of double.
    ex2 = F.sum(
        F.round(F.col("dist").cast(DEC) * F.col("dist").cast(DEC), 6)
    ).cast("double") / F.count("*")
    mom = dist.groupBy("label").agg(
        mu.alias("mu"),
        F.sqrt(F.greatest(ex2 - mu * mu, F.lit(0.0))).alias("sd"),
    )
    z = F.round((F.col("dist") - F.col("mu")) / F.col("sd"), 4)
    return (
        dist.join(F.broadcast(mom), "label")
        .select(
            "vec_id", "label", "dist", z.alias("z"),
            (z > 2.0).alias("is_outlier"),
        )
    )


# Binary quantization: sign-bit packing into two 32-bit words (two
# BIGINTs — a single 64-bit word would overflow signed arithmetic at
# bit 63), shared expression templates for both engines.
_BQ_RERANK = 20
_BQ_TOPK = 10


def _bq_word_sql(lo: int) -> str:
    """DuckDB: pack sign bits [lo, lo+32) of `v` into a BIGINT."""
    return (
        f"list_sum(list_transform(range(0, 32), i -> CASE WHEN "
        f"v[i + {lo} + 1] >= 0 THEN (CAST(1 AS BIGINT) << i) "
        f"ELSE CAST(0 AS BIGINT) END))"
    )


def _bq_word_spark(lo: int):
    """Spark twin of :func:`_bq_word_sql` (same fold, same shifts)."""
    return F.expr(
        f"aggregate(sequence(0, 31), CAST(0 AS BIGINT), (acc, i) -> "
        f"acc + IF(element_at(v, i + {lo} + 1) >= 0, "
        f"shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT)))"
    )


@query(
    "emb_binary_quantize",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    packed AS (
        SELECT vec_id, label, v,
               CAST({_bq_word_sql(0)} AS BIGINT) AS w_lo,
               CAST({_bq_word_sql(32)} AS BIGINT) AS w_hi,
               sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
        FROM e
    ),
    q AS (SELECT * FROM packed WHERE vec_id = 0),
    cand AS (
        SELECT p.vec_id, p.label, p.v, p.nrm,
               q.v AS qv, q.nrm AS qn,
               CAST(bit_count(xor(p.w_lo, q.w_lo))
                    + bit_count(xor(p.w_hi, q.w_hi)) AS INTEGER)
                   AS hamming
        FROM packed p, q WHERE p.vec_id <> 0
        ORDER BY hamming, p.vec_id
        LIMIT {_BQ_RERANK}
    )
    SELECT vec_id, label, hamming,
           round(list_reduce(list_transform(range(1, 65),
                     i -> v[i] * qv[i]), (a, b) -> a + b)
                 / (nrm * qn), 4) AS cosine
    FROM cand
    ORDER BY cosine DESC, vec_id
    LIMIT {_BQ_TOPK}
    """,
)
def emb_binary_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary (1-bit) quantization retrieval: pack each vector's sign
    bits into two 64-bit words (32x memory cut — the modern RAM-saving
    ANN trick in every vector DB), shortlist by Hamming distance with
    XOR+popcount, then rerank the top-20 shortlist by exact cosine.
    The asymmetric two-stage design is what keeps recall high while
    the index stays bit-packed.

    Scale shape: packing is map-only (each vector collapses to 2
    BIGINTs + a norm); the Hamming scan probes integers against a
    1-row broadcast query — no vector math until the rerank, which
    touches only the 20-candidate shortlist. Both cuts are
    TakeOrderedAndProject. Bit-exact across engines: sign bits and
    popcounts are integer arithmetic, and only the rerank cosine
    rounds."""
    e = spark.table("embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    packed = e.select(
        "vec_id",
        "label",
        "v",
        _bq_word_spark(0).alias("w_lo"),
        _bq_word_spark(32).alias("w_hi"),
        F.sqrt(
            F.aggregate(F.col("v"), F.lit(0.0), lambda acc, x: acc + x * x)
        ).alias("nrm"),
    )
    q = packed.where(F.col("vec_id") == 0).select(
        F.col("v").alias("qv"),
        F.col("w_lo").alias("q_lo"),
        F.col("w_hi").alias("q_hi"),
        F.col("nrm").alias("qn"),
    )
    hamming = (
        F.bit_count(F.col("w_lo").bitwiseXOR(F.col("q_lo")))
        + F.bit_count(F.col("w_hi").bitwiseXOR(F.col("q_hi")))
    ).cast("int")
    cand = (
        packed.where(F.col("vec_id") != 0)
        .join(F.broadcast(q))
        .select("vec_id", "label", "v", "nrm", "qv", "qn",
                hamming.alias("hamming"))
        .orderBy("hamming", "vec_id")
        .limit(_BQ_RERANK)
    )
    dot = F.aggregate(
        F.zip_with("v", "qv", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        cand.select(
            "vec_id",
            "label",
            "hamming",
            F.round(dot / (F.col("nrm") * F.col("qn")), 4).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(_BQ_TOPK)
    )


_ADC_SHORTLIST = 20
_ADC_TOPK = 10

# Shared CTE text with emb_pq_encode's construction (same codebook:
# the first _PQ_K corpus vectors per subspace — deterministic, no
# training loop; cited there).
_PQ_CODE_CTES = f"""
    v AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
        FROM embeddings
    ),
    cb AS (
        SELECT vec_id AS k, m,
               list_slice(ve, m * {_PQ_D} + 1, m * {_PQ_D} + {_PQ_D})
                   AS cvec
        FROM v, unnest(range(0, {_PQ_M})) AS u(m)
        WHERE vec_id < {_PQ_K}
    ),
    sub AS (
        SELECT vec_id, m,
               list_slice(ve, m * {_PQ_D} + 1, m * {_PQ_D} + {_PQ_D})
                   AS svec
        FROM v, unnest(range(0, {_PQ_M})) AS u(m)
    ),
    d AS (
        SELECT s.vec_id, s.m, c.k,
               round(list_sum(list_transform(range(1, {_PQ_D + 1}),
                   i -> (list_extract(svec, i) - list_extract(cvec, i))
                      * (list_extract(svec, i) - list_extract(cvec, i)))),
                   6) AS dist
        FROM sub s JOIN cb c USING (m)
    ),
    best AS (
        SELECT vec_id, m, k
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id, m ORDER BY dist, k) AS rn FROM d)
        WHERE rn = 1
    )
"""


@query(
    "sim_pq_adc_search",
    oracle=f"""
    WITH {_PQ_CODE_CTES},
    lut AS (
        SELECT c.m, c.k,
               round(list_sum(list_transform(range(1, {_PQ_D + 1}),
                   i -> (list_extract(q.svec, i) - list_extract(c.cvec, i))
                      * (list_extract(q.svec, i) - list_extract(c.cvec, i)))),
                   6) AS qdist
        FROM cb c JOIN (SELECT m, svec FROM sub WHERE vec_id = 0) q
          USING (m)
    ),
    adc AS (
        SELECT b.vec_id,
               CAST(SUM(CAST(l.qdist AS DECIMAL(18,6))) AS DOUBLE)
                   AS adc_dist
        FROM best b JOIN lut l ON b.m = l.m AND b.k = l.k
        WHERE b.vec_id <> 0
        GROUP BY b.vec_id
        ORDER BY adc_dist, vec_id
        LIMIT {_ADC_SHORTLIST}
    ),
    q AS (
        SELECT ve AS qv,
               sqrt(list_sum(list_transform(ve, x -> x * x))) AS qn
        FROM v WHERE vec_id = 0
    )
    SELECT a.vec_id, v.label, a.adc_dist,
           round(list_reduce(list_transform(range(1, 65),
                     i -> v.ve[i] * q.qv[i]), (x, y) -> x + y)
                 / (sqrt(list_sum(list_transform(v.ve, x -> x * x)))
                    * q.qn), 4) AS cosine
    FROM adc a JOIN v USING (vec_id), q
    ORDER BY cosine DESC, a.vec_id
    LIMIT {_ADC_TOPK}
    """,
)
def sim_pq_adc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC retrieval (the FAISS IVFADC inner
    loop): encode every vector as 8 4-bit codes against the shared
    per-subspace codebook (emb_pq_encode's deterministic first-K
    codebook), build the query's 8x16 distance lookup table, score
    candidates by SUMMED LUT entries (asymmetric distance — the query
    stays full-precision, the corpus stays 4 bytes/vector), then
    rerank the top-20 shortlist by exact cosine. Completes the
    quantized-retrieval ladder: float32 (bruteforce) → int8
    (norm_quantize) → 1-bit (binary_quantize) → PQ-ADC.

    Scale shape: encoding is a (corpus x M x K) equi-join on the
    subspace index against a constant codebook (broadcast); at scale
    codes are PRECOMPUTED at ingest and the search touches only the
    8-entry-per-vector LUT join — integer keys, no vector math until
    the 20-row rerank. LUT distances round to 6dp and the ADC sum is
    decimal-exact, so shortlists are engine-identical; both cuts are
    TakeOrderedAndProject."""
    e = spark.table("embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("ve"),
    )
    ms = F.explode(F.sequence(F.lit(0), F.lit(_PQ_M - 1))).alias("m")
    sub = e.select("vec_id", "ve", ms).select(
        "vec_id",
        "m",
        F.slice("ve", F.col("m") * _PQ_D + 1, _PQ_D).alias("svec"),
    )
    cb = (
        e.where(F.col("vec_id") < _PQ_K)
        .select(F.col("vec_id").alias("k"), "ve", ms)
        .select(
            "k",
            "m",
            F.slice("ve", F.col("m") * _PQ_D + 1, _PQ_D).alias("cvec"),
        )
    )
    sqdist = lambda a, b: _sqdist_unrolled(a, b, _PQ_D)  # noqa: E731
    d = sub.join(F.broadcast(cb), "m").select(
        "vec_id",
        "m",
        "k",
        F.round(sqdist(F.col("svec"), F.col("cvec")), 6).alias("dist"),
    )
    w = Window.partitionBy("vec_id", "m").orderBy("dist", "k")
    best = (
        d.select("*", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") == 1)
        .select("vec_id", "m", "k")
    )
    lut = (
        cb.join(
            F.broadcast(
                sub.where(F.col("vec_id") == 0).select(
                    "m", F.col("svec").alias("qsub")
                )
            ),
            "m",
        )
        .select(
            "m",
            "k",
            F.round(sqdist(F.col("qsub"), F.col("cvec")), 6).alias("qdist"),
        )
    )
    adc = (
        best.where(F.col("vec_id") != 0)
        .join(F.broadcast(lut), ["m", "k"])
        .groupBy("vec_id")
        .agg(
            F.sum(F.col("qdist").cast("decimal(18,6)"))
            .cast("double")
            .alias("adc_dist")
        )
        .orderBy("adc_dist", "vec_id")
        .limit(_ADC_SHORTLIST)
    )
    q = e.where(F.col("vec_id") == 0).select(
        F.col("ve").alias("qv"),
        F.sqrt(
            F.aggregate(
                F.col("ve"), F.lit(0.0), lambda acc, x: acc + x * x
            )
        ).alias("qn"),
    )
    dot = F.aggregate(
        F.zip_with("ve", "qv", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = F.sqrt(
        F.aggregate(F.col("ve"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return (
        adc.join(e, "vec_id")
        .join(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            "adc_dist",
            F.round(dot / (nrm * F.col("qn")), 4).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(_ADC_TOPK)
    )


@query(
    "emb_cluster_purity",
    oracle="""
    WITH e AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    assigned AS (
        SELECT vec_id, label,
               CAST(
                 (CASE WHEN v[1] >= 0 THEN 8 ELSE 0 END)
               + (CASE WHEN v[2] >= 0 THEN 4 ELSE 0 END)
               + (CASE WHEN v[3] >= 0 THEN 2 ELSE 0 END)
               + (CASE WHEN v[4] >= 0 THEN 1 ELSE 0 END) AS INTEGER)
                   AS cluster_id
        FROM e
    ),
    cl AS (
        SELECT cluster_id, label, COUNT(*) AS n
        FROM assigned GROUP BY cluster_id, label
    ),
    dom AS (
        SELECT cluster_id, label AS dominant_label, n AS n_dominant,
               n_total
        FROM (SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY cluster_id ORDER BY n DESC, label) AS rn,
                  SUM(n) OVER (PARTITION BY cluster_id) AS n_total
              FROM cl)
        WHERE rn = 1
    )
    SELECT cluster_id, CAST(n_total AS BIGINT) AS n_members,
           CAST(dominant_label AS INTEGER) AS dominant_label,
           CAST(n_dominant AS BIGINT) AS n_dominant,
           round(CAST(n_dominant AS DOUBLE) / n_total, 4) AS purity
    FROM dom
    ORDER BY cluster_id
    """,
)
def emb_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster purity evaluation: partition the corpus by a 4-bit
    sign-hash of the leading dimensions (an unsupervised LSH
    clustering) and score each cluster by the fraction its dominant
    ground-truth label holds — the standard external clustering metric
    (purity) used to validate embedding-space partitions before
    trusting them for SemDeDup-style within-cluster dedup.

    Scale shape: assignment is map-only bit arithmetic; the label
    histogram is one (cluster, label) aggregation; dominance and
    totals ride one window over that metadata-sized histogram.
    Purity is an exact integer ratio rounded once."""
    e = spark.table("embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    bit = lambda i, w: F.when(  # noqa: E731
        F.element_at("v", i) >= 0, w
    ).otherwise(0)
    assigned = e.select(
        "label",
        (bit(1, 8) + bit(2, 4) + bit(3, 2) + bit(4, 1))
        .cast("int")
        .alias("cluster_id"),
    )
    cl = assigned.groupBy("cluster_id", "label").agg(
        F.count("*").alias("n")
    )
    w_rank = Window.partitionBy("cluster_id").orderBy(
        F.desc("n"), "label"
    )
    w_tot = Window.partitionBy("cluster_id")
    dom = (
        cl.select(
            "*",
            F.row_number().over(w_rank).alias("rn"),
            F.sum("n").over(w_tot).alias("n_total"),
        )
        .where(F.col("rn") == 1)
    )
    return dom.select(
        "cluster_id",
        F.col("n_total").cast("bigint").alias("n_members"),
        F.col("label").cast("int").alias("dominant_label"),
        F.col("n").cast("bigint").alias("n_dominant"),
        F.round(F.col("n").cast("double") / F.col("n_total"), 4).alias(
            "purity"
        ),
    ).orderBy("cluster_id")


@query(
    "sample_hard_negatives",
    oracle="""
    WITH e AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    cells AS (
        SELECT vec_id, label, v,
               CAST(
                 (CASE WHEN v[1] >= 0 THEN 8 ELSE 0 END)
               + (CASE WHEN v[2] >= 0 THEN 4 ELSE 0 END)
               + (CASE WHEN v[3] >= 0 THEN 2 ELSE 0 END)
               + (CASE WHEN v[4] >= 0 THEN 1 ELSE 0 END) AS INTEGER)
                   AS cell,
               sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
        FROM e
    ),
    pairs AS (
        SELECT a.vec_id AS anchor, b.vec_id AS negative,
               a.label AS anchor_label, b.label AS negative_label,
               round(list_reduce(list_transform(range(1, 65),
                         i -> a.v[i] * b.v[i]), (x, y) -> x + y)
                     / (a.nrm * b.nrm), 4) AS cosine
        FROM cells a JOIN cells b
          ON a.cell = b.cell AND a.label <> b.label
    )
    SELECT anchor, negative, anchor_label, negative_label, cosine,
           CAST(neg_rank AS INTEGER) AS neg_rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor
              ORDER BY cosine DESC, negative) AS neg_rank
          FROM pairs)
    WHERE neg_rank <= 3
    ORDER BY anchor, neg_rank
    """,
)
def sample_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor,
    the 3 most-similar vectors with a DIFFERENT label from within the
    anchor's hash cell — semantically close but wrong-class examples,
    the negatives that actually move an embedding model (random
    negatives are trivially separable; hard ones define the margin).
    Cells are the same 4-bit sign-hash partition emb_cluster_purity
    evaluates, so the purity report doubles as this miner's
    block-quality audit.

    Scale shape: candidates come from the cell EQUI-join (never
    all-pairs; cells bound the quadratic term exactly like the kNN
    graph); norms precompute before the join; the per-anchor top-3 is
    a rank window on the join's own partitioning. Cosines round at
    4dp so rankings are engine-identical."""
    e = spark.table("embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    bit = lambda i, w: F.when(  # noqa: E731
        F.element_at("v", i) >= 0, w
    ).otherwise(0)
    cells = e.select(
        "vec_id",
        "label",
        "v",
        (bit(1, 8) + bit(2, 4) + bit(3, 2) + bit(4, 1))
        .cast("int")
        .alias("cell"),
        F.sqrt(
            F.aggregate(F.col("v"), F.lit(0.0), lambda acc, x: acc + x * x)
        ).alias("nrm"),
    )
    a, b = cells.alias("a"), cells.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = a.join(
        b,
        (F.col("a.cell") == F.col("b.cell"))
        & (F.col("a.label") != F.col("b.label")),
    ).select(
        F.col("a.vec_id").alias("anchor"),
        F.col("b.vec_id").alias("negative"),
        F.col("a.label").alias("anchor_label"),
        F.col("b.label").alias("negative_label"),
        F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), 4).alias("cosine"),
    )
    w = Window.partitionBy("anchor").orderBy(F.desc("cosine"), "negative")
    return (
        pairs.select(
            "*", F.row_number().over(w).cast("int").alias("neg_rank")
        )
        .where(F.col("neg_rank") <= 3)
        .orderBy("anchor", "neg_rank")
    )


@query(
    "emb_dim_variance",
    oracle=f"""
    WITH d AS (
        SELECT CAST(i - 1 AS INTEGER) AS dim,
               COUNT(*) AS n,
               CAST(SUM(CAST(CAST(list_extract(embedding, i) AS DOUBLE)
                    AS DECIMAL(28,8))) AS DOUBLE) AS s,
               CAST(SUM(CAST(CAST(list_extract(embedding, i) AS DOUBLE)
                    * CAST(list_extract(embedding, i) AS DOUBLE)
                    AS DECIMAL(28,8))) AS DOUBLE) AS q
        FROM embeddings, unnest(range(1, {_DIM + 1})) AS u(i)
        GROUP BY i
    ),
    v AS (
        SELECT dim, round((q - s * s / n) / (n - 1), 8) AS variance
        FROM d WHERE n > 1
    ),
    ranked AS (
        SELECT dim, variance,
               ROW_NUMBER() OVER (ORDER BY variance DESC, dim)
                   AS var_rank,
               CAST(SUM(CAST(variance AS DECIMAL(28,8))) OVER (
                    ORDER BY variance DESC, dim
                    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_var,
               CAST(SUM(CAST(variance AS DECIMAL(28,8))) OVER ()
                    AS DOUBLE) AS tot_var
        FROM v
    )
    SELECT dim, variance, CAST(var_rank AS INTEGER) AS var_rank,
           round(cum_var / tot_var, 4) AS cum_var_share
    FROM ranked
    ORDER BY var_rank
    """,
)
def emb_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension variance ranking of the embedding space, with
    the cumulative variance share along the ranking — the diagnostic
    BEFORE dimension-reduction decisions (how many dims carry the
    signal?) and the axis-aligned precursor to PCA/whitening
    (emb_whitening rotates; this key just measures). If the top-16
    dims hold most of the variance, Matryoshka-style truncation
    (sim_matryoshka_recall) is nearly free.

    Scale shape: the distributed columnar reduce (posexplode to
    (dim, value), decimal power sums per dim — ncells x dim partial
    state, map-side combined); ranking and the cumulative share run
    on the 64-row variance table, decimal-summed so shares are
    bit-stable."""
    e = spark.table("embeddings")
    dec = "decimal(28,8)"
    d = (
        e.select(F.posexplode("embedding").alias("dim", "x"))
        .select("dim", F.col("x").cast("double").alias("x"))
        .groupBy("dim")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("x").cast(dec)).cast("double").alias("s"),
            F.sum((F.col("x") * F.col("x")).cast(dec))
            .cast("double")
            .alias("q"),
        )
    )
    v = d.where(F.col("n") > 1).select(
        "dim",
        F.round(
            (F.col("q") - F.col("s") * F.col("s") / F.col("n"))
            / (F.col("n") - 1),
            8,
        ).alias("variance"),
    )
    w_rank = Window.orderBy(F.desc("variance"), "dim")
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    ranked = v.select(
        "dim",
        "variance",
        F.row_number().over(w_rank).cast("int").alias("var_rank"),
        F.sum(F.col("variance").cast(dec))
        .over(w_cum)
        .cast("double")
        .alias("cum_var"),
        F.sum(F.col("variance").cast(dec))
        .over(w_all)
        .cast("double")
        .alias("tot_var"),
    )
    return ranked.select(
        "dim",
        "variance",
        "var_rank",
        F.round(F.col("cum_var") / F.col("tot_var"), 4).alias(
            "cum_var_share"
        ),
    ).orderBy("var_rank")


_RP_OUT_DIMS = 32
_RP_IN_DIMS = 64
_RP_PAIRS = 10


def _rp_sign(i: int, j: int) -> int:
    """±1 from md5("rp:i:j") — reproducible in SQL as
    substr(md5(...),1,1) < '8'."""
    import hashlib

    h = hashlib.md5(f"rp:{i}:{j}".encode()).hexdigest()
    return 1 if h[0] < "8" else -1


@query(
    "emb_random_projection",
    oracle=f"""
    WITH picked AS (
        SELECT vec_id, embedding,
               ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
        FROM (SELECT * FROM embeddings ORDER BY vec_id
              LIMIT {2 * _RP_PAIRS})
    ),
    expl AS (
        SELECT vec_id, rn,
               generate_subscripts(embedding, 1) - 1 AS i,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM picked
    ),
    signs AS (
        SELECT i.range AS i, j.range AS j,
               CASE WHEN substr(md5('rp:' || CAST(i.range AS VARCHAR)
                    || ':' || CAST(j.range AS VARCHAR)), 1, 1) < '8'
                    THEN 1 ELSE -1 END AS s
        FROM range({_RP_IN_DIMS}) i, range({_RP_OUT_DIMS}) j
    ),
    proj AS (
        SELECT e.vec_id, e.rn, s.j,
               CAST(SUM(CAST(e.x * s.s AS DECIMAL(28,12)))
                    AS DOUBLE) AS c
        FROM expl e JOIN signs s ON s.i = e.i
        GROUP BY e.vec_id, e.rn, s.j
    ),
    pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               (a.rn + 1) // 2 AS pair_id
        FROM picked a JOIN picked b
          ON b.rn = a.rn + 1 AND a.rn % 2 = 1
    ),
    exact AS (
        SELECT p.pair_id,
               CAST(SUM(CAST(ea.x * eb.x AS DECIMAL(28,12)))
                    AS DOUBLE) AS dot,
               CAST(SUM(CAST(ea.x * ea.x AS DECIMAL(28,12)))
                    AS DOUBLE) AS na,
               CAST(SUM(CAST(eb.x * eb.x AS DECIMAL(28,12)))
                    AS DOUBLE) AS nb
        FROM pairs p
        JOIN expl ea ON ea.vec_id = p.vec_a
        JOIN expl eb ON eb.vec_id = p.vec_b AND eb.i = ea.i
        GROUP BY p.pair_id
    ),
    projc AS (
        SELECT p.pair_id,
               CAST(SUM(CAST(pa.c * pb.c AS DECIMAL(28,6)))
                    AS DOUBLE) AS dot,
               CAST(SUM(CAST(pa.c * pa.c AS DECIMAL(28,6)))
                    AS DOUBLE) AS na,
               CAST(SUM(CAST(pb.c * pb.c AS DECIMAL(28,6)))
                    AS DOUBLE) AS nb
        FROM pairs p
        JOIN proj pa ON pa.vec_id = p.vec_a
        JOIN proj pb ON pb.vec_id = p.vec_b AND pb.j = pa.j
        GROUP BY p.pair_id
    )
    SELECT p.pair_id, p.vec_a, p.vec_b,
           {sql_jround("e.dot / sqrt(e.na * e.nb)", 6)} AS cos_exact,
           {sql_jround("pc.dot / sqrt(pc.na * pc.nb)", 6)} AS cos_proj,
           {sql_jround(
               "abs(e.dot / sqrt(e.na * e.nb)"
               " - pc.dot / sqrt(pc.na * pc.nb))", 6)} AS abs_err,
           abs(e.dot / sqrt(e.na * e.nb)
               - pc.dot / sqrt(pc.na * pc.nb)) <= 0.5 AS within_tol
    FROM pairs p
    JOIN exact e ON e.pair_id = p.pair_id
    JOIN projc pc ON pc.pair_id = p.pair_id
    ORDER BY p.pair_id
    """,
)
def emb_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64 -> 32 dims with a
    deterministic ±1 (Achlioptas) sign matrix derived from md5, and
    the distortion audit that justifies it: for ten fixed vector
    pairs, exact 64-d cosine vs projected 32-d cosine and their
    absolute error — the dimensionality-reduction step that cuts ANN
    index cost 2x while bounding similarity distortion.

    Scale shape: the projection is a posexplode + broadcast join
    against the 2048-row sign matrix + a decimal partial-aggregate
    per (vector, output-dim) — map-side combinable, one pass over
    the embedding corpus, no driver-side matrix state (the signs are
    plan literals, like the learned-IVF centroids). The audit pairs
    are a 20-row rank pick. Decimal sums make both cosines
    order-independent, so the oracle replays them exactly."""
    em = spark.table("embeddings")
    picked = (
        em.orderBy("vec_id")
        .limit(2 * _RP_PAIRS)
        .select(
            "vec_id",
            "embedding",
            F.row_number()
            .over(Window.orderBy("vec_id"))
            .alias("rn"),
        )
    )
    from powersql_spark.catalog import track_persist

    picked = track_persist(picked)
    expl = picked.select(
        "vec_id",
        "rn",
        F.posexplode("embedding").alias("i", "x"),
    ).select("vec_id", "rn", "i", F.col("x").cast("double").alias("x"))
    signs = values_df(
        spark,
        [
            (i, j, _rp_sign(i, j))
            for i in range(_RP_IN_DIMS)
            for j in range(_RP_OUT_DIMS)
        ],
        "i int, j int, s int",
    )
    proj = (
        expl.join(F.broadcast(signs), "i")
        .groupBy("vec_id", "rn", "j")
        .agg(
            F.sum((F.col("x") * F.col("s")).cast("decimal(28,12)"))
            .cast("double")
            .alias("c")
        )
    )
    a = picked.select(
        F.col("vec_id").alias("vec_a"), F.col("rn").alias("rn_a")
    )
    b = picked.select(
        F.col("vec_id").alias("vec_b"), F.col("rn").alias("rn_b")
    )
    pairs = (
        a.join(
            b,
            (F.col("rn_b") == F.col("rn_a") + 1)
            & (F.col("rn_a") % 2 == 1),
        )
        .select(
            "vec_a",
            "vec_b",
            ((F.col("rn_a") + 1) / 2).cast("long").alias("pair_id"),
        )
    )
    ea = expl.select(
        F.col("vec_id").alias("vec_a"), F.col("i").alias("ia"),
        F.col("x").alias("xa"),
    )
    eb = expl.select(
        F.col("vec_id").alias("eb_vec"), F.col("i").alias("ib"),
        F.col("x").alias("xb"),
    )
    exact = (
        pairs.join(ea, "vec_a")
        .join(
            eb,
            (F.col("vec_b") == F.col("eb_vec"))
            & (F.col("ib") == F.col("ia")),
        )
        .groupBy("pair_id")
        .agg(
            F.sum((F.col("xa") * F.col("xb")).cast("decimal(28,12)"))
            .cast("double")
            .alias("dot"),
            F.sum((F.col("xa") * F.col("xa")).cast("decimal(28,12)"))
            .cast("double")
            .alias("na"),
            F.sum((F.col("xb") * F.col("xb")).cast("decimal(28,12)"))
            .cast("double")
            .alias("nb"),
        )
    )
    pa = proj.select(
        F.col("vec_id").alias("vec_a"), F.col("j").alias("ja"),
        F.col("c").alias("ca"),
    )
    pb = proj.select(
        F.col("vec_id").alias("pb_vec"), F.col("j").alias("jb"),
        F.col("c").alias("cb"),
    )
    projc = (
        pairs.join(pa, "vec_a")
        .join(
            pb,
            (F.col("vec_b") == F.col("pb_vec"))
            & (F.col("jb") == F.col("ja")),
        )
        .groupBy("pair_id")
        .agg(
            F.sum((F.col("ca") * F.col("cb")).cast("decimal(28,6)"))
            .cast("double")
            .alias("pdot"),
            F.sum((F.col("ca") * F.col("ca")).cast("decimal(28,6)"))
            .cast("double")
            .alias("pna"),
            F.sum((F.col("cb") * F.col("cb")).cast("decimal(28,6)"))
            .cast("double")
            .alias("pnb"),
        )
    )
    ce = F.col("dot") / F.sqrt(F.col("na") * F.col("nb"))
    cp = F.col("pdot") / F.sqrt(F.col("pna") * F.col("pnb"))
    return (
        pairs.join(exact, "pair_id")
        .join(projc, "pair_id")
        .select(
            "pair_id",
            "vec_a",
            "vec_b",
            F.round(ce, 6).alias("cos_exact"),
            F.round(cp, 6).alias("cos_proj"),
            F.round(F.abs(ce - cp), 6).alias("abs_err"),
            (F.abs(ce - cp) <= 0.5).alias("within_tol"),
        )
        .orderBy("pair_id")
    )


_TRIPLET_ANCHORS = 20


@query(
    "emb_triplet_accuracy",
    oracle=f"""
    WITH anchors AS (
        SELECT vec_id AS a_id, label AS a_label
        FROM embeddings ORDER BY vec_id LIMIT {_TRIPLET_ANCHORS}
    ),
    cand AS (
        SELECT an.a_id, an.a_label, e.vec_id, e.label
        FROM anchors an JOIN embeddings e ON e.vec_id > an.a_id
    ),
    picks AS (
        SELECT a_id, a_label,
               MIN(CASE WHEN label = a_label THEN vec_id END) AS pos_id,
               MIN(CASE WHEN label <> a_label THEN vec_id END) AS neg_id
        FROM cand GROUP BY a_id, a_label
    ),
    trip AS (
        SELECT a_id, pos_id, neg_id FROM picks
        WHERE pos_id IS NOT NULL AND neg_id IS NOT NULL
    ),
    expl AS (
        SELECT vec_id,
               generate_subscripts(embedding, 1) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings
        WHERE vec_id IN (SELECT a_id FROM trip)
           OR vec_id IN (SELECT pos_id FROM trip)
           OR vec_id IN (SELECT neg_id FROM trip)
    ),
    dots AS (
        SELECT t.a_id,
               CAST(SUM(CAST(ea.x * ep.x AS DECIMAL(28,12)))
                    AS DOUBLE) AS dot_p,
               CAST(SUM(CAST(ea.x * en.x AS DECIMAL(28,12)))
                    AS DOUBLE) AS dot_n,
               CAST(SUM(CAST(ea.x * ea.x AS DECIMAL(28,12)))
                    AS DOUBLE) AS na,
               CAST(SUM(CAST(ep.x * ep.x AS DECIMAL(28,12)))
                    AS DOUBLE) AS np,
               CAST(SUM(CAST(en.x * en.x AS DECIMAL(28,12)))
                    AS DOUBLE) AS nn
        FROM trip t
        JOIN expl ea ON ea.vec_id = t.a_id
        JOIN expl ep ON ep.vec_id = t.pos_id AND ep.i = ea.i
        JOIN expl en ON en.vec_id = t.neg_id AND en.i = ea.i
        GROUP BY t.a_id
    ),
    verdicts AS (
        SELECT a_id,
               dot_p / sqrt(na * np) > dot_n / sqrt(na * nn)
                   AS correct
        FROM dots
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triplets,
           CAST(COUNT(CASE WHEN correct THEN 1 END) AS BIGINT)
               AS n_correct,
           CAST(round(CAST(CAST(
                CAST(COUNT(CASE WHEN correct THEN 1 END) AS DOUBLE)
                / COUNT(*) AS VARCHAR) AS DECIMAL(38,18)), 4)
                AS DOUBLE) AS accuracy,
           2 * COUNT(CASE WHEN correct THEN 1 END) > COUNT(*)
               AS majority_correct
    FROM verdicts
    """,
)
def emb_triplet_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triplet accuracy of the embedding space against its labels:
    for 20 fixed anchors, pick the next same-label vector (positive)
    and next different-label vector (negative) by id, and score the
    fraction of triplets where cos(anchor, positive) >
    cos(anchor, negative) — the representation-quality gate run
    before trusting embeddings for dedup/retrieval (random vectors
    score ~0.5; a usable space scores well above).

    Scale shape: candidate selection joins the 20 BROADCAST anchors
    against the corpus with partial MIN aggregation (map-side
    combinable — per partition at most 2 ids per anchor shuffle);
    cosines run on the <= 60 selected vectors via the decimal
    posexplode pattern (order-independent, oracle replays exactly).
    The verdict is one four-integer row."""
    em = spark.table("embeddings")
    anchors = (
        em.orderBy("vec_id")
        .limit(_TRIPLET_ANCHORS)
        .select(
            F.col("vec_id").alias("a_id"),
            F.col("label").alias("a_label"),
        )
    )
    cand = em.select("vec_id", "label", "embedding").join(
        F.broadcast(anchors), F.col("vec_id") > F.col("a_id")
    )
    picks = cand.groupBy("a_id", "a_label").agg(
        F.min(
            F.when(F.col("label") == F.col("a_label"), F.col("vec_id"))
        ).alias("pos_id"),
        F.min(
            F.when(F.col("label") != F.col("a_label"), F.col("vec_id"))
        ).alias("neg_id"),
    )
    trip = picks.where(
        F.col("pos_id").isNotNull() & F.col("neg_id").isNotNull()
    ).select("a_id", "pos_id", "neg_id")
    from powersql_spark.catalog import track_persist

    trip = track_persist(trip)
    ids = (
        trip.select(F.col("a_id").alias("vec_id"))
        .unionAll(trip.select(F.col("pos_id")))
        .unionAll(trip.select(F.col("neg_id")))
        .distinct()
    )
    expl = (
        em.join(F.broadcast(ids), "vec_id", "semi")
        .select(
            "vec_id", F.posexplode("embedding").alias("i", "x")
        )
        .select("vec_id", "i", F.col("x").cast("double").alias("x"))
    )
    expl = track_persist(expl)

    def leg(alias_id, alias_x):
        return expl.select(
            F.col("vec_id").alias(alias_id),
            F.col("i").alias(f"i_{alias_x}"),
            F.col("x").alias(alias_x),
        )

    dots = (
        trip.join(leg("ja", "xa"), F.col("a_id") == F.col("ja"))
        .join(
            leg("jp", "xp"),
            (F.col("pos_id") == F.col("jp"))
            & (F.col("i_xp") == F.col("i_xa")),
        )
        .join(
            leg("jn", "xn"),
            (F.col("neg_id") == F.col("jn"))
            & (F.col("i_xn") == F.col("i_xa")),
        )
        .groupBy("a_id")
        .agg(
            F.sum((F.col("xa") * F.col("xp")).cast("decimal(28,12)"))
            .cast("double")
            .alias("dot_p"),
            F.sum((F.col("xa") * F.col("xn")).cast("decimal(28,12)"))
            .cast("double")
            .alias("dot_n"),
            F.sum((F.col("xa") * F.col("xa")).cast("decimal(28,12)"))
            .cast("double")
            .alias("na"),
            F.sum((F.col("xp") * F.col("xp")).cast("decimal(28,12)"))
            .cast("double")
            .alias("np"),
            F.sum((F.col("xn") * F.col("xn")).cast("decimal(28,12)"))
            .cast("double")
            .alias("nn"),
        )
    )
    correct = (
        F.col("dot_p") / F.sqrt(F.col("na") * F.col("np"))
        > F.col("dot_n") / F.sqrt(F.col("na") * F.col("nn"))
    )
    return dots.select(correct.alias("correct")).agg(
        F.count("*").cast("bigint").alias("n_triplets"),
        F.count(F.when(F.col("correct"), 1))
        .cast("bigint")
        .alias("n_correct"),
        F.when(
            F.count("*") > 0,
            F.round(
                F.count(F.when(F.col("correct"), 1)).cast("double")
                / F.count("*"),
                4,
            ),
        ).alias("accuracy"),
        (
            2 * F.count(F.when(F.col("correct"), 1)) > F.count("*")
        ).alias("majority_correct"),
    )


@query(
    "emb_centroid_drift",
    oracle=f"""
    WITH halves AS (
        SELECT label, vec_id % 2 AS half,
               generate_subscripts(embedding, 1) - 1 AS dim,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings
    ),
    cent AS (
        SELECT label, half, dim,
               CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE)
                   / COUNT(*) AS c,
               COUNT(*) AS n
        FROM halves GROUP BY label, half, dim
    ),
    paired AS (
        SELECT a.label, a.dim, a.c AS c0, b.c AS c1,
               a.n AS n0, b.n AS n1
        FROM cent a JOIN cent b
          ON b.label = a.label AND b.dim = a.dim
         AND a.half = 0 AND b.half = 1
    ),
    drift AS (
        SELECT label,
               CAST(SUM(CAST((c1 - c0) * (c1 - c0)
                    AS DECIMAL(28,12))) AS DOUBLE) AS d2,
               CAST(SUM(CAST(c0 * c0 AS DECIMAL(28,12)))
                    AS DOUBLE) AS m0,
               ANY_VALUE(n0) AS n0_vecs,
               ANY_VALUE(n1) AS n1_vecs
        FROM paired GROUP BY label
    )
    SELECT label,
           CAST(n0_vecs AS BIGINT) AS n_half0,
           CAST(n1_vecs AS BIGINT) AS n_half1,
           {sql_jround("sqrt(d2)", 6)} AS centroid_l2_drift,
           CASE WHEN m0 > 0 THEN
               {sql_jround("sqrt(d2) / sqrt(m0)", 6)} END
               AS relative_drift
    FROM drift
    ORDER BY label
    """,
)
def emb_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid drift between two deterministic halves of
    the embedding corpus (vec_id parity standing in for
    batch-1 vs batch-2): L2 distance between the half-centroids,
    absolute and relative to the centroid norm — the embedding-space
    counterpart of profile_psi_drift's scalar screen, and the check
    run before merging a new embedding batch into an ANN index built
    on the old distribution (re-train centroids when drift is
    material).

    Scale shape: ONE posexplode pass collapses to (label, half, dim)
    decimal-mean cells — map-side combinable, cell count = labels ×
    2 × 64 regardless of corpus size; the pairing and drift rollup
    run on that constant-sized table. Decimal sums keep the
    centroids order-independent so the oracle replays exactly."""
    halves = spark.table("embeddings").select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("dim", "x"),
    ).select(
        "label", "half", "dim", F.col("x").cast("double").alias("x")
    )
    from powersql_spark.catalog import track_persist

    # labels x 2 x 64 cells feed both half-filters below.
    cent = track_persist(
        halves.groupBy("label", "half", "dim").agg(
            (
                F.sum(F.col("x").cast("decimal(28,12)")).cast("double")
                / F.count("*")
            ).alias("c"),
            F.count("*").alias("n"),
        )
    )
    a = cent.where(F.col("half") == 0).select(
        "label",
        "dim",
        F.col("c").alias("c0"),
        F.col("n").alias("n0"),
    )
    b = cent.where(F.col("half") == 1).select(
        F.col("label").alias("lb"),
        F.col("dim").alias("db"),
        F.col("c").alias("c1"),
        F.col("n").alias("n1"),
    )
    paired = a.join(
        b, (F.col("lb") == F.col("label")) & (F.col("db") == F.col("dim"))
    )
    drift = paired.groupBy("label").agg(
        F.sum(
            ((F.col("c1") - F.col("c0")) * (F.col("c1") - F.col("c0")))
            .cast("decimal(28,12)")
        )
        .cast("double")
        .alias("d2"),
        F.sum((F.col("c0") * F.col("c0")).cast("decimal(28,12)"))
        .cast("double")
        .alias("m0"),
        F.first("n0").alias("n0_vecs"),
        F.first("n1").alias("n1_vecs"),
    )
    return drift.select(
        "label",
        F.col("n0_vecs").cast("bigint").alias("n_half0"),
        F.col("n1_vecs").cast("bigint").alias("n_half1"),
        F.round(F.sqrt(F.col("d2")), 6).alias("centroid_l2_drift"),
        F.when(
            F.col("m0") > 0,
            F.round(F.sqrt(F.col("d2")) / F.sqrt(F.col("m0")), 6),
        ).alias("relative_drift"),
    ).orderBy("label")


# ---------------------------------------------------------------------------
# TwoNN intrinsic dimension (Facco et al. 2017): d = n / sum ln(r2/r1)
# over each point's two nearest neighbors. THE geometry diagnostic for
# embedding spaces — if the intrinsic dimension is far below the
# ambient 64, aggressive PQ/dim-reduction is safe; if close, it isn't.
# ---------------------------------------------------------------------------


@query(
    "emb_intrinsic_dimension",
    oracle="""
    WITH e AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    pairs AS (
        SELECT a.vec_id AS src, a.label,
               round(sqrt(list_sum(list_transform(range(1, 65),
                         i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i])))),
                     4) AS dist,
               b.vec_id AS dst
        FROM e a JOIN e b
          ON a.label = b.label AND a.vec_id <> b.vec_id
    ),
    nn2 AS (
        SELECT src, label,
               MIN(CASE WHEN r = 1 THEN dist END) AS r1,
               MIN(CASE WHEN r = 2 THEN dist END) AS r2
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY src
                            ORDER BY dist, dst) AS r
              FROM pairs)
        WHERE r <= 2
        GROUP BY src, label
    ),
    terms AS (
        SELECT label, round(ln(r2 / r1), 6) AS t
        FROM nn2 WHERE r1 > 0 AND r2 > r1
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(ROUND(COUNT(*) / CAST(SUM(CAST(t AS DECIMAL(18,12)))
                                      AS DOUBLE), 4) AS DOUBLE)
               AS intrinsic_dim
    FROM terms
    GROUP BY label
    ORDER BY label
    """,
)
def emb_intrinsic_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TwoNN intrinsic-dimension estimate per embedding cell:
    d = n / sum ln(r2/r1) from each point's nearest and second-nearest
    Euclidean neighbors — the manifold-dimension diagnostic that says
    how much of the ambient 64 dimensions the data actually uses
    (low intrinsic dim => PQ codes and aggressive projections are
    safe; near-ambient => they aren't). Points with tied rounded
    neighbor distances (r2 = r1) are excluded per the estimator.

    Scale shape: the same cell equi-join candidate discipline as
    emb_knn_graph (quadratic only within cells), a rank-2 cut on the
    join's own partitioning, and a per-cell aggregation of
    6dp-rounded log-ratio terms decimal-summed for order
    independence. Distances round at 4dp so neighbor order is
    engine-independent."""
    e = spark.table("embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    a, b = e.alias("a"), e.alias("b")
    dist = F.round(
        F.sqrt(
            F.aggregate(
                F.zip_with(
                    F.col("a.v"),
                    F.col("b.v"),
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
        4,
    )
    pairs = a.join(
        b,
        (F.col("a.label") == F.col("b.label"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("src"),
        F.col("a.label").alias("label"),
        dist.alias("dist"),
        F.col("b.vec_id").alias("dst"),
    )
    w = Window.partitionBy("src").orderBy("dist", "dst")
    nn2 = (
        pairs.select(
            "src", "label", "dist", F.row_number().over(w).alias("r")
        )
        .where(F.col("r") <= 2)
        .groupBy("src", "label")
        .agg(
            F.min(F.when(F.col("r") == 1, F.col("dist"))).alias("r1"),
            F.min(F.when(F.col("r") == 2, F.col("dist"))).alias("r2"),
        )
    )
    terms = nn2.where(
        (F.col("r1") > 0) & (F.col("r2") > F.col("r1"))
    ).select(
        "label", F.round(F.log(F.col("r2") / F.col("r1")), 6).alias("t")
    )
    return (
        terms.groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n_points"),
            F.round(
                F.count("*")
                / F.sum(F.col("t").cast("decimal(18,12)")).cast("double"),
                4,
            ).alias("intrinsic_dim"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# Alignment / uniformity (Wang & Isola 2020): the two-number quality
# readout for contrastive embedding spaces. Alignment over same-label
# (positive) pairs from the cell equi-join; uniformity over a
# deterministic 50x50 sampled cross-pair panel (documented bounded
# product — sampling is how the estimator is defined at any scale).
# ---------------------------------------------------------------------------


@query(
    "emb_alignment_uniformity",
    oracle="""
    WITH e AS (
        SELECT vec_id, label,
               list_transform(embedding,
                   x -> CAST(x AS DOUBLE)
                        / sqrt(list_sum(list_transform(embedding,
                              y -> CAST(y AS DOUBLE)
                                   * CAST(y AS DOUBLE))))) AS v
        FROM embeddings
    ),
    pos AS (
        SELECT list_sum(list_transform(range(1, 65),
                   i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i]))) AS d2
        FROM e a JOIN e b
          ON a.label = b.label AND a.vec_id < b.vec_id
    ),
    unif AS (
        SELECT round(exp(-2 * list_sum(list_transform(range(1, 65),
                   i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i])))), 10)
                   AS t
        FROM e a JOIN e b
          ON a.vec_id % 10 = 0 AND b.vec_id % 10 = 3
    ),
    astat AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_pos,
               CAST(SUM(CAST(d2 AS DECIMAL(38,12))) AS DOUBLE)
                   / COUNT(*) AS alignment
        FROM pos
    ),
    ustat AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_unif,
               ln(CAST(SUM(CAST(t AS DECIMAL(28,12))) AS DOUBLE)
                  / COUNT(*)) AS uniformity
        FROM unif
    )
    SELECT n_pos AS n_pos_pairs, n_unif AS n_unif_pairs,
           round(alignment, 4) AS alignment,
           round(uniformity, 4) AS uniformity
    FROM astat, ustat
    """,
)
def emb_alignment_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wang-Isola embedding-quality readout on the L2-normalized
    corpus: ALIGNMENT = mean squared distance over same-label
    (positive) pairs — lower means positives cluster — and
    UNIFORMITY = ln mean exp(-2 d^2) over a sampled cross panel —
    lower means the space spreads over the hypersphere instead of
    collapsing. Together they predict contrastive-retrieval quality
    before any downstream eval.

    Scale shape: positives come from the cell equi-join (bounded per
    cell, never all-pairs); uniformity uses a DETERMINISTIC 50x50
    id-sampled pair panel (a broadcast product of two 1/10 subsets —
    bounded by construction; the estimator is defined on sampled
    pairs at any corpus size). exp terms round at 10dp and
    decimal-sum, so the single ln is taken of an identical double."""
    e = spark.table("embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    nrm = F.sqrt(
        F.aggregate(F.col("v"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    e = e.select(
        "vec_id",
        "label",
        F.transform(F.col("v"), lambda x: x / nrm).alias("v"),
    )
    from powersql_spark.catalog import track_persist

    e = track_persist(e)

    def d2(a, b):
        # Codegen'd unrolled form — identical fold order to the HOF
        # (operators.common.sqdist_unrolled), compiled not interpreted.
        return sqdist_unrolled(a, b, _DIM)

    a, b = e.alias("a"), e.alias("b")
    pos = a.join(
        b,
        (F.col("a.label") == F.col("b.label"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(d2(F.col("a.v"), F.col("b.v")).alias("d2"))
    astat = pos.agg(
        F.count("*").cast("bigint").alias("n_pos"),
        (
            F.sum(F.col("d2").cast("decimal(38,12)")).cast("double")
            / F.count("*")
        ).alias("alignment"),
    )
    ua = e.where(F.col("vec_id") % 10 == 0).select(
        F.col("v").alias("va")
    )
    ub = e.where(F.col("vec_id") % 10 == 3).select(
        F.col("v").alias("vb")
    )
    unif = ua.join(F.broadcast(ub)).select(
        F.round(
            F.exp(-2 * d2(F.col("va"), F.col("vb"))), 10
        ).alias("t")
    )
    ustat = unif.agg(
        F.count("*").cast("bigint").alias("n_unif"),
        F.log(
            F.sum(F.col("t").cast("decimal(28,12)")).cast("double")
            / F.count("*")
        ).alias("uniformity"),
    )
    return astat.join(F.broadcast(ustat)).select(
        F.col("n_pos").alias("n_pos_pairs"),
        F.col("n_unif").alias("n_unif_pairs"),
        F.round("alignment", 4).alias("alignment"),
        F.round("uniformity", 4).alias("uniformity"),
    )


@query(
    "emb_separation_histogram",
    oracle="""
    WITH e AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings
    ),
    within AS (
        SELECT 'within_label' AS pair_type,
               round(list_sum(list_transform(range(1, 65),
                         i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 4)
                   AS cos
        FROM e a JOIN e b
          ON a.label = b.label AND a.vec_id < b.vec_id
    ),
    cross_s AS (
        SELECT 'cross_label' AS pair_type,
               round(list_sum(list_transform(range(1, 65),
                         i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 4)
                   AS cos
        FROM e a JOIN e b
          ON a.vec_id % 10 = 0 AND b.vec_id % 10 = 3
             AND a.label <> b.label
    ),
    pairs AS (
        SELECT * FROM within UNION ALL SELECT * FROM cross_s
    ),
    hist AS (
        SELECT pair_type,
               CAST(FLOOR(cos * 10) AS BIGINT) AS cos_bucket,
               COUNT(*) AS n_pairs,
               SUM(COUNT(*)) OVER (PARTITION BY pair_type) AS tot
        FROM pairs GROUP BY pair_type, FLOOR(cos * 10)
    )
    SELECT pair_type, cos_bucket,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(ROUND(n_pairs / CAST(tot AS DOUBLE), 6) AS DOUBLE)
               AS pair_share
    FROM hist
    ORDER BY pair_type, cos_bucket
    """,
)
def emb_separation_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-separability histogram: the distribution of pairwise
    cosines for SAME-label pairs vs a sampled CROSS-label panel,
    bucketed at 0.1 — if the two histograms overlap heavily, no
    similarity threshold separates classes and both SemDeDup-style
    dedup and label-cell ANN will bleed across labels (the
    distributional view behind emb_cluster_purity's single number).

    Scale shape: within-label pairs from the cell equi-join (bounded
    per cell); cross-label pairs from the deterministic 1/10 x 1/10
    id-sampled panel (the emb_alignment_uniformity discipline);
    histogram is a bucket-bounded rollup with per-type window
    totals. Cosines at 4dp, FLOOR bucketing (no rounding-mode
    divergence)."""
    e = spark.table("embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    e = e.select(
        "vec_id",
        "label",
        "v",
        F.sqrt(
            F.aggregate(F.col("v"), F.lit(0.0), lambda acc, x: acc + x * x)
        ).alias("nrm"),
    )
    from powersql_spark.catalog import track_persist

    e = track_persist(e)

    def cos(a, b, an, bn):
        # Deliberately the HOF form, NOT operators.common.dot_unrolled:
        # the cross-label arm is a BroadcastNestedLoopJoin (no equi
        # keys), whose output projection evaluates interpreted —
        # walking a 64-dim unrolled expression tree per pair row
        # measured 2.2/3.3 -> 6.5/6.7 s across two alternating A/B
        # rounds (the q28 pair_cos lesson: unrolled wins only in
        # codegen'd Project contexts like emb_alignment_uniformity's).
        return F.round(
            F.aggregate(
                F.zip_with(a, b, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / (an * bn),
            4,
        )

    a, b = e.alias("a"), e.alias("b")
    within = a.join(
        b,
        (F.col("a.label") == F.col("b.label"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.lit("within_label").alias("pair_type"),
        cos(
            F.col("a.v"), F.col("b.v"), F.col("a.nrm"), F.col("b.nrm")
        ).alias("cos"),
    )
    ua = e.where(F.col("vec_id") % 10 == 0).select(
        F.col("label").alias("la"), F.col("v").alias("va"),
        F.col("nrm").alias("na")
    )
    ub = e.where(F.col("vec_id") % 10 == 3).select(
        F.col("label").alias("lb"), F.col("v").alias("vb"),
        F.col("nrm").alias("nb")
    )
    cross = (
        ua.join(F.broadcast(ub))
        .where(F.col("la") != F.col("lb"))
        .select(
            F.lit("cross_label").alias("pair_type"),
            cos(
                F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
            ).alias("cos"),
        )
    )
    pairs = within.unionAll(cross)
    hist = pairs.groupBy(
        "pair_type",
        F.floor(F.col("cos") * 10).cast("bigint").alias("cos_bucket"),
    ).agg(F.count("*").alias("n_pairs"))
    wt = Window.partitionBy("pair_type")
    return hist.select(
        "pair_type",
        "cos_bucket",
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        F.round(
            F.col("n_pairs") / F.sum("n_pairs").over(wt).cast("double"),
            6,
        ).alias("pair_share"),
    ).orderBy("pair_type", "cos_bucket")


# ---------------------------------------------------------------------------
# Simplified silhouette over sign-hash cells.
#
# The INTERNAL clustering-quality metric beside emb_cluster_purity's
# external one: a(i) = distance to own cell centroid, b(i) = distance
# to the nearest OTHER cell centroid, s = (b - a) / max(a, b). The
# "simplified silhouette" (centroid distances instead of all-pairs
# mean distances) is the form that scales — O(n * k) instead of
# O(n^2) — and is what production clustering evaluation actually runs.
# ---------------------------------------------------------------------------


@query(
    "emb_silhouette_simplified",
    # Same determinism scheme as emb_outlier_distance: decimal-exact
    # centroid sums, 6dp-rounded squared deviations folded in DECIMAL,
    # sqrt outputs rounded at 6dp (irrational — never on a boundary),
    # final ratio jrounded. The oracle evaluates via an explicit
    # (vector x cell) join — a different strategy from Spark's
    # map-only array fold, same rounded arithmetic.
    oracle=f"""
    WITH e AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    asg AS (
        SELECT vec_id, v,
               CAST((CASE WHEN v[1] >= 0 THEN 8 ELSE 0 END)
                  + (CASE WHEN v[2] >= 0 THEN 4 ELSE 0 END)
                  + (CASE WHEN v[3] >= 0 THEN 2 ELSE 0 END)
                  + (CASE WHEN v[4] >= 0 THEN 1 ELSE 0 END) AS INTEGER)
                   AS cell
        FROM e
    ),
    cent AS (
        SELECT cell, i,
               CAST(SUM(CAST(list_extract(v, i) AS DECIMAL(18,6)))
                    AS DOUBLE) / COUNT(*) AS c
        FROM asg, unnest(range(1, {_DIM + 1})) AS u(i)
        GROUP BY cell, i
    ),
    carr AS (
        SELECT cell, list(c ORDER BY i) AS c FROM cent GROUP BY cell
    ),
    dist AS (
        SELECT a.vec_id, a.cell, r.cell AS other_cell,
               round(sqrt(CAST(list_sum(
                   list_transform(range(1, {_DIM + 1}),
                       i -> CAST(round(pow(
                                list_extract(a.v, i)
                                - list_extract(r.c, i), 2), 6)
                             AS DECIMAL(18,6)))) AS DOUBLE)), 6) AS d
        FROM asg a CROSS JOIN carr r
    ),
    ab AS (
        SELECT vec_id, cell,
               MIN(CASE WHEN other_cell = cell THEN d END) AS a_dist,
               MIN(CASE WHEN other_cell <> cell THEN d END) AS b_dist
        FROM dist GROUP BY vec_id, cell
    )
    SELECT vec_id, cell, a_dist, b_dist,
           CASE WHEN b_dist IS NOT NULL
                     AND greatest(a_dist, b_dist) > 0 THEN
               {sql_jround(
                   "(b_dist - a_dist) / greatest(a_dist, b_dist)", 4)}
               WHEN b_dist IS NOT NULL THEN 0.0 END AS silhouette
    FROM ab
    """,
)
def emb_silhouette_simplified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette score per vector over the 16 sign-hash
    cells: a = L2 distance to the OWN cell centroid, b = distance to
    the nearest OTHER populated cell's centroid,
    s = (b - a) / max(a, b) in [-1, 1] (negative = probably
    mis-clustered; the within-cell-dedup trust gate beside
    emb_cluster_purity's label-based purity). Centroid distances
    instead of all-pairs — the O(n*k) form that scales.

    Spark shape: cell assignment is map-only bit arithmetic; the
    centroid reduce ships scalar partials (posexplode, never whole
    vectors); the 16 centroid arrays collapse to ONE row broadcast
    against the corpus, so the scoring pass is map-only higher-order
    folds — no row multiplication, no second exchange. The oracle
    replays via an explicit vector-x-cell join: same rounded
    arithmetic, independently different plan."""
    e = spark.table("embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    bit = lambda i, w: F.when(  # noqa: E731
        F.element_at("v", i) >= 0, w
    ).otherwise(0)
    asg = e.select(
        "vec_id",
        "v",
        (bit(1, 8) + bit(2, 4) + bit(3, 2) + bit(4, 1))
        .cast("int")
        .alias("cell"),
    )
    from powersql_spark.catalog import track_persist

    asg = track_persist(asg)
    cent = (
        asg.select("cell", F.posexplode("v").alias("i", "x"))
        .groupBy("cell", "i")
        .agg(
            (
                F.sum(F.col("x").cast(DEC)).cast("double") / F.count("*")
            ).alias("c")
        )
    )
    carr = cent.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "c"))),
            lambda s: s.c,
        ).alias("c")
    )
    allc = carr.agg(
        F.collect_list(F.struct("cell", "c")).alias("cents")
    )
    d_of = lambda cv: F.round(  # noqa: E731
        F.sqrt(
            F.aggregate(
                F.zip_with(
                    F.col("v"),
                    cv,
                    lambda x, c: F.round(F.pow(x - c, 2), 6).cast(DEC),
                ),
                F.lit(0).cast("decimal(38,6)"),
                lambda acc, x: acc + x,
            ).cast("double")
        ),
        6,
    )
    dists = F.transform(
        F.col("cents"),
        lambda s: F.struct(s.cell.alias("cell"), d_of(s.c).alias("d")),
    )
    own = F.filter(dists, lambda s: s.cell == F.col("cell"))
    others = F.filter(dists, lambda s: s.cell != F.col("cell"))
    a_d = F.element_at(own, 1).d
    b_d = F.array_min(F.transform(others, lambda s: s.d))
    s_val = F.when(
        b_d.isNotNull() & (F.greatest(a_d, b_d) > 0),
        F.round((b_d - a_d) / F.greatest(a_d, b_d), 4),
    ).when(b_d.isNotNull(), F.lit(0.0))
    return asg.crossJoin(F.broadcast(allc)).select(
        "vec_id",
        "cell",
        a_d.alias("a_dist"),
        b_d.alias("b_dist"),
        s_val.alias("silhouette"),
    )


@query(
    "emb_mahalanobis_outlier",
    oracle=f"""
    WITH dims AS (
        SELECT vec_id, label,
               unnest(embedding) AS x,
               unnest(range(len(embedding))) AS d
        FROM embeddings
    ),
    mom AS (
        SELECT label, d,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(round(CAST(x AS DOUBLE), 8)
                    AS DECIMAL(38,8))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(round(CAST(x AS DOUBLE)
                    * CAST(x AS DOUBLE), 8) AS DECIMAL(38,8)))
                    AS DOUBLE) AS sxx
        FROM dims GROUP BY label, d
    ),
    var_ AS (
        SELECT label, d, sx / n AS mu,
               (sxx - sx * sx / n) / n + 1e-9 AS v
        FROM mom
    ),
    md AS (
        SELECT dm.vec_id, dm.label,
               CAST(SUM(CAST(round(
                   pow(CAST(dm.x AS DOUBLE) - v.mu, 2) / v.v, 8)
                   AS DECIMAL(38,8))) AS DOUBLE) AS md2
        FROM dims dm JOIN var_ v
          ON v.label = dm.label AND v.d = dm.d
        GROUP BY dm.vec_id, dm.label
    )
    SELECT vec_id, label, {sql_jround("md2", 4)} AS md2,
           round(sqrt(md2), 4) AS mahalanobis_d
    FROM md
    ORDER BY md2 DESC, vec_id
    LIMIT 10
    """,
)
def emb_mahalanobis_outlier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Diagonal-covariance Mahalanobis outlier scoring per label:
    each vector's variance-whitened squared distance to its label's
    per-dimension mean, sum_d (x_d - mu_d)^2 / sigma_d^2 — unlike
    emb_outlier_distance's raw L2-to-centroid, a dimension with 10x
    the spread no longer dominates the score, so outliers in LOW
    variance dimensions (the subtle mislabels) surface. Top-10
    reported with deterministic tie-break.

    Scale shape: one positional explode to (vec, dim) rows; moments
    collapse to the (label x dim) grid (constant-sized); scoring
    joins that grid back map-side and decimal-sums 8dp-rounded
    whitened terms per vector (order-independent); the top-10 is a
    TakeOrderedAndProject."""
    dims = spark.table("embeddings").select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding")).alias("d", "x"),
    )
    dec8 = lambda c: F.sum(F.round(c, 8).cast("decimal(38,8)")).cast(
        "double"
    )
    xd = F.col("x").cast("double")
    mom = dims.groupBy("label", "d").agg(
        F.count("*").cast("bigint").alias("n"),
        dec8(xd).alias("sx"),
        dec8(xd * xd).alias("sxx"),
    )
    var_ = mom.select(
        "label",
        "d",
        (F.col("sx") / F.col("n")).alias("mu"),
        (
            (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
            / F.col("n")
            + 1e-9
        ).alias("v"),
    )
    md = (
        dims.join(F.broadcast(var_), ["label", "d"])
        .groupBy("vec_id", "label")
        .agg(
            dec8(
                F.pow(F.col("x").cast("double") - F.col("mu"), 2)
                / F.col("v")
            ).alias("md2")
        )
    )
    return (
        md.orderBy(F.col("md2").desc(), "vec_id")
        .limit(10)
        .select(
            "vec_id",
            "label",
            F.round("md2", 4).alias("md2"),
            F.round(F.sqrt("md2"), 4).alias("mahalanobis_d"),
        )
    )


# ---------------------------------------------------------------------------
# Round-12 widening: anisotropy (mean pairwise cosine WITHOUT pairs)
# and linear CKA between the two halves of the embedding space.
# ---------------------------------------------------------------------------


@query(
    "emb_anisotropy",
    oracle=f"""
    WITH u AS (  -- L2-normalized coordinates, 8dp-rounded
        SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS dim,
               round(CAST(unnest(embedding) AS DOUBLE)
                     / sqrt(list_sum(list_transform(embedding,
                            x -> CAST(x AS DOUBLE) * x))), 8) AS ud
        FROM embeddings
    ),
    per_dim AS (
        SELECT dim,
               CAST(SUM(CAST(ud AS DECIMAL(38,8))) AS DOUBLE) AS s_d,
               CAST(SUM(CAST(round(ud * ud, 10) AS DECIMAL(38,10)))
                    AS DOUBLE) AS q_d
        FROM u GROUP BY dim
    ),
    tot AS (
        SELECT CAST(SUM(CAST(round(s_d * s_d, 8) AS DECIMAL(38,8)))
                    AS DOUBLE) AS s2,
               CAST(SUM(CAST(round(q_d, 8) AS DECIMAL(38,8)))
                    AS DOUBLE) AS q,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings) AS n
        FROM per_dim
    )
    SELECT n,
           {sql_jround("(s2 - q) / (n * 1e0 * (n - 1))", 6)}
               AS mean_cosine,
           {sql_jround("s2 / n", 6)} AS partition_norm
    FROM tot
    """,
)
def emb_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anisotropy of the embedding space: the mean pairwise cosine
    over ALL vector pairs, computed WITHOUT enumerating any pair via
    the identity sum_(i != j) cos(u_i, u_j) = ||sum u||^2 - sum
    ||u||^2 on the normalized vectors — the Ethayarajh/Mu-Viswanath
    "cone" diagnostic: isotropic spaces score near 0, degenerate
    spaces (all vectors sharing a dominant direction) near 1, and
    high anisotropy is why raw similarity scores bunch together
    (emb_hubness measures the symptom; this measures the cause).

    Scale shape: normalization is a per-row fold (codegen
    higher-order, no UDF); the identity reduces the quadratic pair
    sum to one posexplode -> per-dim decimal sums -> one 64-row
    aggregation. Strictly linear in rows at any scale."""
    e = spark.table("embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    u = (
        e.select(
            F.transform(
                v, lambda x: F.round(x / norm, 8)
            ).alias("u")
        )
        .select(F.posexplode("u").alias("dim", "ud"))
    )
    per_dim = u.groupBy("dim").agg(
        F.sum(F.col("ud").cast("decimal(38,8)"))
        .cast("double")
        .alias("s_d"),
        F.sum(
            F.round(F.col("ud") * F.col("ud"), 10).cast(
                "decimal(38,10)"
            )
        )
        .cast("double")
        .alias("q_d"),
    )
    n_row = e.agg(F.count("*").cast("bigint").alias("n"))
    tot = per_dim.agg(
        F.sum(
            F.round(F.col("s_d") * F.col("s_d"), 8).cast(
                "decimal(38,8)"
            )
        )
        .cast("double")
        .alias("s2"),
        F.sum(F.round(F.col("q_d"), 8).cast("decimal(38,8)"))
        .cast("double")
        .alias("q"),
    ).crossJoin(F.broadcast(n_row))
    n = F.col("n")
    return tot.select(
        "n",
        F.round(
            (F.col("s2") - F.col("q")) / (n * 1.0 * (n - 1)), 6
        ).alias("mean_cosine"),
        F.round(F.col("s2") / n, 6).alias("partition_norm"),
    )


_CKA_HALF = 32  # first/second 32 of the 64 dims


@query(
    "emb_cka_halves",
    oracle=f"""
    WITH x AS (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
               CAST(unnest(embedding) AS DOUBLE) AS val
        FROM embeddings
    ),
    mu AS (
        SELECT dim,
               CAST(SUM(CAST(round(val, 8) AS DECIMAL(38,8)))
                    AS DOUBLE)
                   / COUNT(*) AS m
        FROM x GROUP BY dim
    ),
    c AS (  -- centered coordinates, 8dp-rounded
        SELECT x.vec_id, x.dim, round(x.val - mu.m, 8) AS cv
        FROM x JOIN mu ON mu.dim = x.dim
    ),
    cross_m AS (  -- C_ij = sum_n xi yi over (first-half, second-half)
        SELECT a.dim AS i, b.dim AS j,
               CAST(SUM(CAST(round(a.cv * b.cv, 8)
                             AS DECIMAL(38,8))) AS DOUBLE) AS cij
        FROM c a JOIN c b ON b.vec_id = a.vec_id
        WHERE a.dim < {_CKA_HALF} AND b.dim >= {_CKA_HALF}
        GROUP BY a.dim, b.dim
    ),
    xx_m AS (
        SELECT a.dim AS i, b.dim AS j,
               CAST(SUM(CAST(round(a.cv * b.cv, 8)
                             AS DECIMAL(38,8))) AS DOUBLE) AS cij
        FROM c a JOIN c b ON b.vec_id = a.vec_id
        WHERE a.dim < {_CKA_HALF} AND b.dim < {_CKA_HALF}
        GROUP BY a.dim, b.dim
    ),
    yy_m AS (
        SELECT a.dim AS i, b.dim AS j,
               CAST(SUM(CAST(round(a.cv * b.cv, 8)
                             AS DECIMAL(38,8))) AS DOUBLE) AS cij
        FROM c a JOIN c b ON b.vec_id = a.vec_id
        WHERE a.dim >= {_CKA_HALF} AND b.dim >= {_CKA_HALF}
        GROUP BY a.dim, b.dim
    ),
    fro AS (
        SELECT
            (SELECT CAST(SUM(CAST(round(cij * cij, 6)
                 AS DECIMAL(38,6))) AS DOUBLE) FROM cross_m) AS hxy,
            (SELECT CAST(SUM(CAST(round(cij * cij, 6)
                 AS DECIMAL(38,6))) AS DOUBLE) FROM xx_m) AS hxx,
            (SELECT CAST(SUM(CAST(round(cij * cij, 6)
                 AS DECIMAL(38,6))) AS DOUBLE) FROM yy_m) AS hyy
    )
    SELECT CAST({_CKA_HALF} AS BIGINT) AS half_dim,
           {sql_jround("hxy", 4)} AS hsic_xy,
           {sql_jround("hxy / sqrt(hxx * hyy)", 6)} AS linear_cka
    FROM fro WHERE hxx > 0 AND hyy > 0
    """,
)
def emb_cka_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear CKA (centered kernel alignment, Kornblith et al. 2019)
    between the two 32-dim halves of the embedding space:
    CKA = ||X^T Y||_F^2 / (||X^T X||_F ||Y^T Y||_F) on
    column-centered halves — THE standard representation-similarity
    metric (are the two halves encoding the same structure, i.e. is
    the second half redundant for retrieval?), directly actionable
    for Matryoshka-style truncation (high CKA -> drop a half).

    Spark shape: never materializes a Gram matrix over rows —
    centered coordinates explode to (vec_id, dim, value) and each
    Frobenius term is an equi-join on vec_id grouped to the
    (dim x dim) moment grid (<= 64^2 cells), i.e. cross-moment
    sufficient statistics, linear in rows with a constant d^2
    fan-out. Products are 8dp-rounded decimal sums at every level,
    so the statistic is partition-order independent."""
    e = spark.table("embeddings")
    x = e.select(
        "vec_id", F.posexplode("embedding").alias("dim", "valf")
    ).select("vec_id", "dim", F.col("valf").cast("double").alias("val"))
    mu = x.groupBy("dim").agg(
        (
            F.sum(F.round(F.col("val"), 8).cast("decimal(38,8)"))
            .cast("double")
            / F.count("*")
        ).alias("m")
    )
    c = x.join(F.broadcast(mu), "dim").select(
        "vec_id",
        "dim",
        F.round(F.col("val") - F.col("m"), 8).alias("cv"),
    )
    from powersql_spark.catalog import track_persist

    c = track_persist(c)
    a = c.alias("a")
    b = c.alias("b")

    # Deliberately THREE region-filtered self-joins, not one full-grid
    # join + conditional sums: the half predicates (a.dim < 32 etc.)
    # push down to the join INPUTS, so each moment joins two 32-dim
    # halves (1024 products per vector); a single-join grid form was
    # A/B'd live and generated the full 64x64 fan-out before any
    # filter could apply — 9.7-12 s warm vs 3.8-4.2 s for this form.
    def moment(pred_a, pred_b):
        return (
            a.join(b, F.col("b.vec_id") == F.col("a.vec_id"))
            .where(pred_a & pred_b)
            .groupBy(
                F.col("a.dim").alias("i"), F.col("b.dim").alias("j")
            )
            .agg(
                F.sum(
                    F.round(
                        F.col("a.cv") * F.col("b.cv"), 8
                    ).cast("decimal(38,8)")
                )
                .cast("double")
                .alias("cij")
            )
            .agg(
                F.sum(
                    F.round(
                        F.col("cij") * F.col("cij"), 6
                    ).cast("decimal(38,6)")
                )
                .cast("double")
                .alias("h")
            )
        )

    lo_a = F.col("a.dim") < _CKA_HALF
    hi_a = F.col("a.dim") >= _CKA_HALF
    lo_b = F.col("b.dim") < _CKA_HALF
    hi_b = F.col("b.dim") >= _CKA_HALF
    hxy = moment(lo_a, hi_b).withColumnRenamed("h", "hxy")
    hxx = moment(lo_a, lo_b).withColumnRenamed("h", "hxx")
    hyy = moment(hi_a, hi_b).withColumnRenamed("h", "hyy")
    fro = hxy.crossJoin(F.broadcast(hxx)).crossJoin(
        F.broadcast(hyy)
    )
    return (
        fro.where((F.col("hxx") > 0) & (F.col("hyy") > 0))
        .select(
            F.lit(_CKA_HALF).cast("bigint").alias("half_dim"),
            F.round(F.col("hxy"), 4).alias("hsic_xy"),
            F.round(
                F.col("hxy")
                / F.sqrt(F.col("hxx") * F.col("hyy")),
                6,
            ).alias("linear_cka"),
        )
    )


@query(
    "emb_participation_ratio",
    oracle=f"""
    WITH d AS (
        SELECT CAST(i - 1 AS INTEGER) AS dim,
               COUNT(*) AS n,
               CAST(SUM(CAST(CAST(list_extract(embedding, i) AS DOUBLE)
                    AS DECIMAL(28,8))) AS DOUBLE) AS s,
               CAST(SUM(CAST(round(CAST(list_extract(embedding, i)
                                        AS DOUBLE)
                    * CAST(list_extract(embedding, i) AS DOUBLE), 8)
                    AS DECIMAL(28,8))) AS DOUBLE) AS q
        FROM embeddings, unnest(range(1, {_DIM + 1})) AS u(i)
        GROUP BY i
    ),
    v AS (
        SELECT dim, round((q - s * s / n) / (n - 1), 8) AS var_d
        FROM d WHERE n > 1
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_dims,
               CAST(SUM(CAST(var_d AS DECIMAL(38,8))) AS DOUBLE)
                   AS sv,
               CAST(SUM(CAST(round(var_d * var_d, 10)
                             AS DECIMAL(38,10))) AS DOUBLE) AS svv
        FROM v
    )
    SELECT n_dims,
           {sql_jround("sv * sv / svv", 4)} AS participation_ratio,
           {sql_jround("sv * sv / svv / n_dims", 6)}
               AS effective_dim_fraction
    FROM s WHERE svv > 0
    """,
)
def emb_participation_ratio(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Participation ratio of the embedding variance spectrum:
    PR = (sum var_d)^2 / sum var_d^2 — the "effective number of
    dimensions" (PR = d for isotropic spaces, 1 for rank-one
    collapse), the single-number readout that emb_dim_variance's
    full ranking feeds into and the axis-aligned screen run before
    paying for emb_intrinsic_dimension's neighbor-based estimate.
    PR/d near 1 says Matryoshka truncation will cost recall; near 0
    says most dims are dead weight.

    Scale shape: the same distributed columnar reduce as
    emb_dim_variance (posexplode to per-dim decimal power sums);
    the PR is closed-form over the 64-row variance table."""
    e = spark.table("embeddings")
    d = (
        e.select(F.posexplode("embedding").alias("dim", "xf"))
        .select("dim", F.col("xf").cast("double").alias("x"))
        .groupBy("dim")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("x").cast("decimal(28,8)"))
            .cast("double")
            .alias("s"),
            F.sum(
                F.round(F.col("x") * F.col("x"), 8).cast(
                    "decimal(28,8)"
                )
            )
            .cast("double")
            .alias("q"),
        )
    )
    var_d = F.round(
        (F.col("q") - F.col("s") * F.col("s") / F.col("n"))
        / (F.col("n") - 1),
        8,
    )
    v = d.where(F.col("n") > 1).select(var_d.alias("var_d"))
    s = v.agg(
        F.count("*").cast("bigint").alias("n_dims"),
        F.sum(F.col("var_d").cast("decimal(38,8)"))
        .cast("double")
        .alias("sv"),
        F.sum(
            F.round(F.col("var_d") * F.col("var_d"), 10).cast(
                "decimal(38,10)"
            )
        )
        .cast("double")
        .alias("svv"),
    )
    pr = F.col("sv") * F.col("sv") / F.col("svv")
    return s.where(F.col("svv") > 0).select(
        "n_dims",
        F.round(pr, 4).alias("participation_ratio"),
        F.round(pr / F.col("n_dims"), 6).alias(
            "effective_dim_fraction"
        ),
    )
