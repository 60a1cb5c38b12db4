-- The LLM training-data funnel as orchestrated models: the same
-- operators the engine exposes as registry keys, here driven by the
-- PowerSQL-style model DAG (documents is an external source table).

CREATE VIEW scored_docs AS
SELECT doc_id, text, lang,
       size(split(trim(text), '\\s+')) AS n_tokens,
       md5(lower(regexp_replace(trim(text), '\\s+', ' '))) AS fingerprint
FROM documents
WHERE lang = 'en';

CREATE VIEW kept_docs AS
SELECT doc_id, text, n_tokens, fingerprint
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY fingerprint ORDER BY doc_id
    ) AS rn
    FROM scored_docs
    WHERE n_tokens >= 10
)
WHERE rn = 1;

CREATE TABLE doc_chunks AS
SELECT doc_id,
       pos * 48 AS chunk_start,
       array_join(slice(split(trim(text), '\\s+'), pos * 48 + 1, 64), ' ') AS chunk_text
FROM kept_docs
LATERAL VIEW posexplode(sequence(0, int(greatest(n_tokens - 1, 0) / 48))) t AS pos, x;
