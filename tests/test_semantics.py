"""Semantic property tests for the rows-only keys (no DuckDB oracle —
engine-specific hash families / ANN). The driver can only count their
rows; these tests are where their CLAIMS get verified:

- approx distinct lands within 5% of exact;
- every MinHash-LSH pair really is a near-duplicate (verification is
  exact), and LSH recalls the strong near-dups the exact blocked scan
  finds;
- SimHash finds every exact duplicate (identical text -> identical
  signature -> hamming 0) and only emits pairs within the hamming bound;
- IVF top-k recalls most of the exact brute-force top-k.

All deterministic on the fixed testdata (seeded hashes, no rand()).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from powersql_spark.registry import all_specs

SPECS = all_specs()


def test_approx_distinct_within_5pct(spark, sf_dir):
    """The registered query now emits the 5%-of-exact gate itself (so
    the driver hash-verifies the accuracy claim); assert it holds."""
    rows = SPECS["agg_approx_distinct"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["parts_within_5pct"] is True, r


def test_minhash_pairs_are_real_near_dups(spark, sf_dir):
    """Precision is exact by construction (candidates are re-verified
    with true Jaccard); assert the output honors the threshold."""
    pairs = SPECS["dedup_minhash_lsh"].fn(spark, sf_dir).collect()
    assert len(pairs) > 0
    for r in pairs:
        assert r["jaccard"] >= 0.30
        assert r["doc_a"] < r["doc_b"]


def test_minhash_recalls_strong_ngram_pairs(spark, sf_dir):
    """LSH banding (16 hashes, 4x4) catches strong near-dups with high
    probability; on the fixed testdata the seeded hashes are
    deterministic, so recall is a stable number — gate it."""
    strong = {
        (r["doc_a"], r["doc_b"])
        for r in SPECS["dedup_ngram_jaccard"].fn(spark, sf_dir).collect()
        if r["jaccard"] >= 0.6
    }
    found = {
        (r["doc_a"], r["doc_b"])
        for r in SPECS["dedup_minhash_lsh"].fn(spark, sf_dir).collect()
    }
    if strong:
        recall = len(strong & found) / len(strong)
        assert recall >= 0.6, f"LSH recall {recall:.2f} on strong pairs"


def test_simhash_finds_exact_duplicates(spark, sf_dir):
    """Identical text -> identical 64-bit signature -> hamming 0, so
    every exact-duplicate pair must appear; and nothing past the
    hamming<=3 bound may appear."""
    dup_groups = [
        r
        for r in SPECS["dedup_exact"].fn(spark, sf_dir).collect()
        if r["n_copies"] > 1
    ]
    sim = SPECS["dedup_simhash"].fn(spark, sf_dir).collect()
    sim_pairs = {(r["doc_a"], r["doc_b"]) for r in sim}
    for r in sim:
        assert r["hamming"] <= 3
    # Reconstruct exact-dup pairs from fingerprint groups.
    d = spark.table("documents")
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    by_fp = (
        d.select(F.md5(norm).alias("f"), "doc_id")
        .groupBy("f")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .where(F.size("ids") > 1)
        .collect()
    )
    assert len(by_fp) == len(dup_groups)
    for row in by_fp:
        ids = row["ids"]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                assert (ids[i], ids[j]) in sim_pairs, (
                    f"exact dup pair {ids[i]},{ids[j]} missed by simhash"
                )


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    exact = {
        r["vec_id"]
        for r in SPECS["sim_topk_bruteforce"].fn(spark, sf_dir).collect()
    }
    ivf = {
        r["vec_id"] for r in SPECS["sim_topk_ivf"].fn(spark, sf_dir).collect()
    }
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.5, f"IVF recall {recall:.2f} vs brute force"


def test_split_assignment_stable_under_corpus_growth(spark, sf_dir):
    """The curation split is a pure function of the row: computing it
    on a 10% subset must give every doc the same split as on the full
    corpus (no rand(), no corpus-relative state). This is the property
    that keeps test docs out of train across dataset versions."""
    from powersql_spark.pipeline.curation import _bucket

    d = spark.table("documents")
    b = _bucket(F.col("doc_id"), ":split")
    split = F.when(b < "cd", "train").when(b < "e6", "val").otherwise("test")
    full = {r["doc_id"]: r["s"] for r in d.select("doc_id", split.alias("s")).collect()}
    sub = d.where(F.col("doc_id") % 10 == 0).select("doc_id", split.alias("s"))
    for r in sub.collect():
        assert full[r["doc_id"]] == r["s"]
    # All three splits are populated and roughly 80/10/10.
    from collections import Counter

    c = Counter(full.values())
    n = sum(c.values())
    assert 0.70 <= c["train"] / n <= 0.90
    assert c["val"] > 0 and c["test"] > 0


def test_approx_percentile_within_2pct(spark, sf_dir):
    """The registered query now emits the 2%-of-exact gate itself (so
    the driver hash-verifies the accuracy claim); assert it holds."""
    rows = SPECS["agg_approx_percentile"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["median_within_2pct"] is True, r
        assert r["p90_within_2pct"] is True, r
