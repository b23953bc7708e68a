"""Per-source distinct-n-gram diversity (the distinct-1/distinct-2 metric
of Li et al., "A Diversity-Promoting Objective Function for Neural
Conversation Models", NAACL 2016).

Corpus-curation signal: a source whose n-gram stream is dominated by a few
templates (low distinct ratio) is boilerplate-heavy and gets down-weighted
in mixture construction (`ops/sampling.source_mixture`).  The reference's
analog is its per-source metadata aggregation discipline
(`/root/reference/harvester/core/models/document.py` per-collection
counts); this is the content-granularity variant a training-data pipeline
needs.

Scale shape: the distinct-gram set is corpus-sized, so nothing is
broadcast.  One all-to-all of per-batch-distinct (gram_hash, source,
partial_count) triples hashed into ``n_partitions`` coarse buckets (every
occurrence of a gram lands in one bucket, so bucket-local distinct counts
sum exactly); per-bucket reduction is one lexsort + run-length pass; a
final tiny groupby(source) folds O(sources × buckets) partial rows.
Gram hashing reuses the near-dup shingle path (`ops/dedup._batch_shingles`)
so the engine and the string-based oracle share one n-gram definition;
64-bit collisions are the standard accepted error.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import analyzer
from .dedup import _batch_shingles


def distinct_ngrams(
    ds,
    *,
    text_col: str = "text",
    source_col: str = "source",
    shingle_n: int = 2,
    n_partitions: int = 64,
):
    """Per-source (source, n_total, n_distinct, distinct_ratio) over word
    n-grams WITH multiplicity (total) vs distinct; ratio quantized to 1e-6
    by the exact integer half-up rule.  Docs with 0 < tokens < n contribute
    one whole-doc gram (the `_batch_shingles` fallback, mirrored in SQL);
    empty docs contribute nothing.
    """
    from ray.data.aggregate import Sum

    def explode(batch: pa.Table) -> pa.Table:
        text = analyzer.normalize_text(batch[text_col])
        src = batch[source_col].combine_chunks()
        sh_doc, sh_h = _batch_shingles(text, shingle_n)
        if sh_h.size == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int32()),
                    "h": pa.array([], pa.int64()),
                    "source": pa.array([], pa.string()),
                    "c": pa.array([], pa.int64()),
                }
            )
        src_codes = src.dictionary_encode()
        codes = np.asarray(src_codes.indices)[sh_doc]
        # batch-local (source, gram) partial counts: lexsort + run-length
        order = np.lexsort((sh_h, codes))
        h, cd = sh_h[order], codes[order]
        first = np.r_[True, (h[1:] != h[:-1]) | (cd[1:] != cd[:-1])]
        run_id = np.cumsum(first) - 1
        cnt = np.bincount(run_id).astype(np.int64)
        h, cd = h[first], cd[first]
        dictionary = src_codes.dictionary
        return pa.table(
            {
                "bucket": pa.array((h % np.uint64(n_partitions)).astype(np.int32)),
                "h": pa.array(h.view(np.int64), pa.int64()),
                "source": dictionary.take(pa.array(cd, pa.int32())),
                "c": pa.array(cnt, pa.int64()),
            }
        )

    triples = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_partials(group: pd.DataFrame) -> pa.Table:
        h = group["h"].to_numpy()
        src, codes = np.unique(group["source"].to_numpy(), return_inverse=True)
        c = group["c"].to_numpy()
        order = np.lexsort((h, codes))
        h, codes, c = h[order], codes[order], c[order]
        first = np.r_[True, (h[1:] != h[:-1]) | (codes[1:] != codes[:-1])]
        n_total = np.bincount(codes, weights=c, minlength=src.size).astype(np.int64)
        n_distinct = np.bincount(codes[first], minlength=src.size).astype(np.int64)
        return pa.table(
            {
                "source": pa.array(src, pa.string()),
                "n_total": pa.array(n_total, pa.int64()),
                "n_distinct": pa.array(n_distinct, pa.int64()),
            }
        )

    partials = triples.groupby("bucket").map_groups(bucket_partials, batch_format="pandas")
    totals = partials.groupby("source").aggregate(
        Sum("n_total", alias_name="n_total"), Sum("n_distinct", alias_name="n_distinct")
    )

    def finish(batch: pa.Table) -> pa.Table:
        tot = np.asarray(batch["n_total"].combine_chunks().cast(pa.int64()))
        dis = np.asarray(batch["n_distinct"].combine_chunks().cast(pa.int64()))
        ratio = ((dis * 2_000_000 + tot) // (2 * tot)) / 1e6
        return pa.table(
            {
                "source": batch["source"].combine_chunks(),
                "n_total": pa.array(tot, pa.int64()),
                "n_distinct": pa.array(dis, pa.int64()),
                "distinct_ratio": pa.array(ratio, pa.float64()),
            }
        )

    return totals.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def distinct_ngrams_sql(
    table: str = "documents",
    *,
    text_col: str = "text",
    source_col: str = "source",
    shingle_n: int = 2,
) -> str:
    """Oracle: identical semantics by gram *string* equality (multiplicity
    kept — no list_distinct, unlike the dup_ngrams oracle)."""
    tok = analyzer.sql_tokenize_expr(text_col)
    n = shingle_n
    return f"""
WITH toks AS (
  SELECT {source_col} AS source, {tok} AS ts FROM {table}
),
sh AS (
  SELECT source,
         CASE WHEN len(ts) = 0 THEN []
              WHEN len(ts) < {n} THEN [array_to_string(ts, ' ')]
              ELSE [array_to_string(ts[i : i + {n} - 1], ' ')
                    for i in range(1, len(ts) - {n} + 2)]
         END AS grams
  FROM toks
),
expl AS (SELECT source, unnest(grams) AS g FROM sh)
SELECT source,
       count(*) AS n_total,
       count(DISTINCT g) AS n_distinct,
       ((count(DISTINCT g) * 2000000 + count(*)) // (2 * count(*))) / 1000000.0 AS distinct_ratio
FROM expl
GROUP BY source
ORDER BY source
""".strip()
