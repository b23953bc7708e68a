"""Corpus-internal duplicated-n-gram fraction (Dolma/Gopher-style).

Training-data quality filters score each document by how much of its text
is duplicated *elsewhere in the corpus* (the "duplicate n-gram fraction"
signal used alongside near-dup removal): a gram is duplicated when it
occurs in ≥ 2 distinct documents, and a doc's score is the fraction of its
distinct grams that are duplicated. The reference's analog is its
content-hash upsert hygiene (one live doc per identity,
`/root/reference/harvester/core/models/datatypes/document.py:131-139`);
this operator is the sub-document-granularity generalization a 100 TB
pipeline needs to catch boilerplate that exact/near-dup dedup misses.

Scale shape: unlike decontamination (`ops/decontam.py`), the "duplicated
gram" set is corpus-sized — it can NOT be broadcast. So the whole operator
is ONE all-to-all exchange of distinct (gram_hash, doc_id) pairs, hashed
into ``n_partitions`` coarse buckets (the `minhash_lsh_candidates` idiom):
every pair of a given gram lands in one bucket, so each bucket computes
exact per-doc partial counts (grams seen, grams duplicated) with one
vectorized run-length pass — no per-gram Python, no driver state. A final
doc-cardinality ``groupby(doc_id).sum`` folds the partials. Shingle
hashing reuses the near-dup path (`ops/dedup.py:_batch_shingles`), so the
engine and the string-based SQL oracle share one n-gram definition; 64-bit
collisions are the standard accepted error.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import analyzer
from .dedup import _batch_shingles, _dedup_doc_shingles


def dup_ngram_fraction(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 5,
    n_partitions: int = 64,
):
    """Per-doc (doc_id, n_ngrams, n_dup, dup_frac) over distinct word
    n-grams; ``dup_frac`` rounded to 6 decimals (CLAUDE.md ratio rule).

    Docs whose text yields zero grams (empty after normalization) produce
    no output row — mirroring the oracle's inner join through the gram
    table.
    """
    from ray.data.aggregate import Sum

    def explode(batch: pa.Table) -> pa.Table:
        text = analyzer.normalize_text(batch[text_col])
        ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        sh_doc, sh_h = _dedup_doc_shingles(*_batch_shingles(text, shingle_n))
        return pa.table(
            {
                "h": pa.array(sh_h.view(np.int64), pa.int64()),
                "doc_id": pa.array(ids[sh_doc], pa.int64()),
                "bucket": pa.array(
                    (sh_h % np.uint64(n_partitions)).astype(np.int32)
                ),
            }
        )

    pairs = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_partials(group: pd.DataFrame) -> pa.Table:
        h = group["h"].to_numpy()
        d = group["doc_id"].to_numpy()
        order = np.argsort(h, kind="stable")
        h, d = h[order], d[order]
        starts = np.ones(h.size, bool)
        starts[1:] = h[1:] != h[:-1]
        run_id = np.cumsum(starts) - 1
        run_len = np.bincount(run_id)
        dup = run_len[run_id] >= 2  # gram occurs in ≥2 docs (pairs are per-doc distinct)
        docs, inv = np.unique(d, return_inverse=True)
        n_tot = np.bincount(inv, minlength=docs.size)
        n_dup = np.bincount(inv[dup], minlength=docs.size)
        return pa.table(
            {
                "doc_id": pa.array(docs, pa.int64()),
                "n_ngrams": pa.array(n_tot.astype(np.int64), pa.int64()),
                "n_dup": pa.array(n_dup.astype(np.int64), pa.int64()),
            }
        )

    partials = pairs.groupby("bucket").map_groups(bucket_partials, batch_format="pandas")
    totals = partials.groupby("doc_id").aggregate(
        Sum("n_ngrams", alias_name="n_ngrams"), Sum("n_dup", alias_name="n_dup")
    )

    def finish(batch: pa.Table) -> pa.Table:
        tot = np.asarray(batch["n_ngrams"].combine_chunks().cast(pa.int64()))
        dup = np.asarray(batch["n_dup"].combine_chunks().cast(pa.int64()))
        frac = np.round(dup / np.maximum(tot, 1), 6)
        return pa.table(
            {
                "doc_id": batch["doc_id"].combine_chunks().cast(pa.int64()),
                "n_ngrams": pa.array(tot, pa.int64()),
                "n_dup": pa.array(dup, pa.int64()),
                "dup_frac": pa.array(frac, pa.float64()),
            }
        )

    return totals.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def dup_ngram_fraction_sql(
    table: str = "documents",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 5,
) -> str:
    """Oracle: identical semantics by gram *string* equality (no hashing)."""
    tok = analyzer.sql_tokenize_expr(text_col)
    n = shingle_n
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, {tok} AS ts FROM {table}
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(ts) = 0 THEN []
              WHEN len(ts) < {n} THEN [array_to_string(ts, ' ')]
              ELSE list_distinct([array_to_string(ts[i : i + {n} - 1], ' ')
                                 for i in range(1, len(ts) - {n} + 2)])
         END AS shingles
  FROM toks
),
expl AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
cnt AS (SELECT s, count(*) AS nd FROM expl GROUP BY s)
SELECT e.doc_id,
       count(*) AS n_ngrams,
       CAST(sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       round(sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS dup_frac
FROM expl e JOIN cnt c ON e.s = c.s
GROUP BY e.doc_id
ORDER BY e.doc_id
""".strip()
