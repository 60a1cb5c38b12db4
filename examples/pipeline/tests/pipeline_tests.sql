ASSERT NOT EXISTS(
    SELECT 1 FROM kept_docs
    GROUP BY fingerprint HAVING COUNT(*) > 1
) AS 'kept_docs has one document per fingerprint';

ASSERT NOT EXISTS(
    SELECT 1 FROM doc_chunks WHERE length(chunk_text) = 0
) AS 'no empty chunks';

ASSERT (SELECT COUNT(*) FROM doc_chunks) >=
       (SELECT COUNT(*) FROM kept_docs)
    AS 'every kept doc produced at least one chunk';

ASSERT NOT EXISTS(
    SELECT 1 FROM kept_docs WHERE n_tokens < 10
) AS 'length gate applied';
