"""Distributed BPE merge learning — tokenizer *training* on Spark
(driver north-star extension; the reference has no analog — its surface
ends at SQL orchestration, src/execute.rs:101).

Classic BPE (Sennrich et al. 2016) never iterates over the corpus: it
iterates over the (word, frequency) table, which is vocabulary-sized.
That factoring is exactly what makes the algorithm distributable:

- ONE corpus pass aggregates to (word, freq) — the only shuffle that
  scales with data size; at 100 TB this is a word-count.
- Each merge round then runs on the vocab table: explode adjacent
  symbol pairs weighted by freq, take the argmax pair (a 1-row
  aggregate — the learned model parameter, legitimately driver-side),
  and apply the merge to every word's symbol array map-side.

The merge application is a left-to-right greedy fold over the symbol
array (F.aggregate), matching the reference algorithm's semantics for
overlapping pairs ("aaa" + merge(a,a) -> ["aa","a"]).

SQL oracle: the merge loop is bounded (N_MERGES), so it unrolls into
N_MERGES chained CTEs, each computing one argmax pair over the
previous vocabulary and applying it. The greedy fold has an exact SQL
form once each word's symbol sequence is encoded as a delimited string
``(s1)(s2)...(sn)``: merging (l, r) is ``replace(sym, '(l)(r)',
'(lr)')`` — SQL ``replace`` scans left-to-right non-overlapping, which
IS the greedy semantics ("(a)(a)(a)" -> "(aa)(a)", "(a)(a)(a)(a)" ->
"(aa)(aa)"), and the wrappers make a symbol boundary unambiguous so no
match can start mid-symbol. The corpus is lowercase ASCII (charset
checked in tests), so '(' / ')' never collide with symbol characters.
tests/test_semantics.py additionally replays the algorithm in pure
Python and asserts the merge sequence is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from powersql_spark.catalog import values_df
from powersql_spark.registry import query

N_MERGES = 8


def _bpe_vocab_ctes(n_merges: int) -> str:
    """DuckDB CTE chain v0..v{n}: the word-frequency vocabulary after
    each successive merge, with symbols encoded as '(s1)(s2)...'.

    p{k} is step k's argmax pair over v{k-1} (weighted by word freq,
    ties broken lexicographically — the exact ORDER BY learn_merges
    uses); v{k} applies it via the wrapped-symbol replace. When the
    best pair's frequency drops below 2, p{k} is empty, which empties
    every later CTE — replicating the Spark loop's break."""
    parts = [
        r"""v0 AS (
        SELECT word, freq,
               '(' || array_to_string(string_split(word, ''), ')(') || ')'
                   AS sym
        FROM (
            SELECT word, COUNT(*) AS freq
            FROM (
                SELECT unnest(regexp_split_to_array(trim(text), '\s+'))
                           AS word
                FROM documents
            )
            GROUP BY word
        )
    )"""
    ]
    for k in range(1, n_merges + 1):
        parts.append(
            f"""p{k} AS (
        SELECT l, r, n FROM (
            SELECT z[1] AS l, z[2] AS r, CAST(SUM(freq) AS BIGINT) AS n
            FROM (
                SELECT freq,
                       unnest(list_zip(
                           parts[1:len(parts) - 1], parts[2:len(parts)]
                       )) AS z
                FROM (
                    SELECT freq,
                           string_split(
                               sym[2:length(sym) - 1], ')('
                           ) AS parts
                    FROM v{k - 1}
                )
            )
            GROUP BY l, r
        )
        WHERE n >= 2
        ORDER BY n DESC, l, r
        LIMIT 1
    ),
    v{k} AS (
        -- LEFT JOIN ON TRUE: when p{k} is empty (merge loop stopped),
        -- the vocabulary passes through unchanged, as in learn_merges.
        SELECT v.word, v.freq,
               CASE WHEN p.l IS NULL THEN v.sym
                    ELSE replace(v.sym, '(' || p.l || ')(' || p.r || ')',
                                 '(' || p.l || p.r || ')')
               END AS sym
        FROM v{k - 1} v LEFT JOIN p{k} p ON TRUE
    )"""
        )
    return ",\n    ".join(parts)


def _learn_merges_oracle(n_merges: int = N_MERGES) -> str:
    steps = "\n        UNION ALL ".join(
        f"SELECT CAST({k - 1} AS INTEGER) AS step, l, r, n FROM p{k}"
        for k in range(1, n_merges + 1)
    )
    return f"""
    WITH {_bpe_vocab_ctes(n_merges)}
    SELECT step, l AS "left", r AS "right", l || r AS merged,
           n AS pair_freq
    FROM ({steps})
    ORDER BY step
    """


def _apply_tokenize_oracle(n_merges: int = N_MERGES) -> str:
    return f"""
    WITH {_bpe_vocab_ctes(n_merges)},
    seg AS (
        SELECT word,
               CAST(len(string_split(sym[2:length(sym) - 1], ')('))
                    AS BIGINT) AS n_sub
        FROM v{n_merges}
    ),
    w AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
        FROM documents
    )
    SELECT w.doc_id,
           COUNT(*) AS n_words,
           CAST(SUM(s.n_sub) AS BIGINT) AS n_subwords,
           CAST(SUM(length(w.word)) AS DOUBLE)
               / CAST(SUM(s.n_sub) AS DOUBLE) AS chars_per_subword
    FROM w JOIN seg s USING (word)
    GROUP BY w.doc_id
    """


def word_freq(spark: SparkSession) -> DataFrame:
    """The corpus word-frequency table BPE actually trains on."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return (
        spark.table("documents")
        .select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _apply_merge(sym_col, left: str, right: str):
    """Greedy left-to-right merge of adjacent (left, right) symbol
    pairs inside one symbol array."""
    merged = left + right
    return F.aggregate(
        sym_col,
        F.array().cast("array<string>"),
        # try_element_at: NULL on the empty accumulator (first element),
        # which fails the equality and falls through to append.
        lambda acc, x: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def learn_merges(spark: SparkSession, n_merges: int = N_MERGES):
    """Run the merge loop; returns [(step, left, right, pair_freq)].

    Each round touches only the vocab table (persisted between rounds);
    the argmax collect moves ONE row to the driver — the model update,
    not data."""
    vocab = word_freq(spark).select(
        "freq", F.split(F.col("word"), "(?!$)").alias("sym")
    ).persist()
    rules: list[tuple[int, str, str, int]] = []
    for step in range(n_merges):
        pairs = vocab.select(
            "freq",
            F.explode(
                F.zip_with(
                    F.slice("sym", 1, F.size("sym") - 1),
                    F.slice("sym", 2, F.size("sym") - 1),
                    lambda a, b: F.struct(
                        a.alias("left"), b.alias("right")
                    ),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.left", "p.right")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), "left", "right")
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < 2:
            break
        left, right, n = top[0]["left"], top[0]["right"], top[0]["n"]
        rules.append((step, left, right, int(n)))
        nxt = vocab.select(
            "freq", _apply_merge(F.col("sym"), left, right).alias("sym")
        ).persist()
        nxt.count()  # materialize before dropping the parent
        vocab.unpersist()
        vocab = nxt
    vocab.unpersist()
    return rules


def segment_vocab(spark: SparkSession, rules) -> DataFrame:
    """Apply a learned merge sequence to the DISTINCT-WORD table:
    (word, sym array) after all merges. This is the other half of the
    BPE factoring — segmentation is a pure function of the word, so it
    is computed once per vocabulary entry, never per corpus token."""
    vocab = word_freq(spark).select(
        "word", F.split(F.col("word"), "(?!$)").alias("sym")
    )
    for (_, left, right, _) in rules:
        vocab = vocab.select(
            "word", _apply_merge(F.col("sym"), left, right).alias("sym")
        )
    return vocab


@query("bpe_apply_tokenize", oracle=_apply_tokenize_oracle())
def bpe_apply_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with the learned BPE merges — the *apply*
    half that turns ``bpe_learn_merges`` into a usable tokenizer: per
    document, the subword token count and compression ratio a packing /
    budgeting stage consumes.

    Scale shape: merges never touch the corpus — they run on the
    vocabulary table (``segment_vocab``); the corpus pass is one word
    explode plus a broadcast hash join of the (word, n_subwords)
    segmentation (vocab is orders of magnitude smaller than the corpus;
    were it to outgrow broadcast, the same plan downgrades to a shuffle
    join on the word key). Per-doc rollup shuffles doc_id only."""
    rules = learn_merges(spark)
    seg = segment_vocab(spark, rules).select(
        "word", F.size("sym").cast("bigint").alias("n_sub")
    )
    words = (
        spark.table("documents")
        .select(
            "doc_id",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word"),
        )
    )
    return (
        words.join(F.broadcast(seg), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sub").alias("n_subwords"),
            (
                F.sum(F.length("word"))
                / F.sum("n_sub").cast("double")
            ).alias("chars_per_subword"),
        )
        .select("doc_id", "n_words", "n_subwords", "chars_per_subword")
    )


@query("bpe_learn_merges", oracle=_learn_merges_oracle())
def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first N_MERGES learned BPE merge rules over the corpus, with
    the weighted pair frequency each was chosen at. Deterministic:
    ties break lexicographically, so the merge sequence is a pure
    function of the corpus."""
    rules = learn_merges(spark)
    ddl = "step int, left string, right string, merged string, pair_freq bigint"
    rows = [(s, left, right, left + right, n) for (s, left, right, n) in rules]
    return (
        values_df(spark, rows, ddl)
        if rows
        else spark.createDataFrame([], ddl)
    )
