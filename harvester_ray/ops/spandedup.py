"""Corpus-wide exact span deduplication (paragraph-dedup analog).

Large-scale curation pipelines (Dolma, RefinedWeb, FineWeb) remove
*duplicated paragraphs* across the whole corpus — each paragraph is kept
only at its first occurrence and dropped everywhere else, then documents
are reassembled from their surviving paragraphs. The reference's analog is
its whole-document content-hash upsert
(`/root/reference/harvester/core/models/datatypes/document.py:131-139`);
this operator is the sub-document-granularity version that strips shared
boilerplate which whole-doc and near-dup dedup both miss.

The test corpora have no newline structure, so the "paragraph" unit here
is a fixed-size window of ``span_words`` analyzer tokens (non-overlapping,
last span may be short) — the same tokenizer as every other gate
(`analyzer.sql_tokenize_expr`), so engine and oracle share one span
definition. First occurrence = lexicographically smallest ``(doc_id,
span_index)``, exactly DuckDB's ``row_number() OVER (PARTITION BY span
ORDER BY doc_id, cidx)``.

Scale shape (three exchanges, none carrying more than it must):

1. explode: one all-to-all of ``(span_hash u64, doc_id, cidx)`` triples —
   never the span text — hashed into ``n_partitions`` coarse buckets, so
   every occurrence of a span lands in one bucket and winner selection is
   a single vectorized lexsort + run-boundary pass per bucket.
2. drops: buckets emit only the LOSING occurrences ``(doc_id, cidx)``;
   for the common low-duplication corpus this is a small fraction of the
   span stream (corpus-sized in the worst case — never broadcast).
3. reassemble: documents and drop rows are co-partitioned by
   ``doc_id % n_partitions`` (the `jaccard_verify_pairs` union idiom) and
   each bucket rebuilds its docs' texts with one vectorized keep-mask +
   ``ListArray``/``binary_join`` pass — document text crosses the wire
   exactly once.

Span hashing is positional: token u64 hashes weighted by an odd per-slot
multiplier and wrap-summed, so equal token windows always collide and
unequal ones collide with standard 64-bit probability (the accepted error
shared with `ops/dupgrams.py`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .. import analyzer
from .dedup import _vocab_hash64

_MASK64 = (1 << 64) - 1


def _span_multipliers(k: int) -> np.ndarray:
    """k deterministic odd u64 constants (splitmix-style), one per in-span
    slot; computed in Python ints to avoid numpy scalar overflow warnings."""
    out = []
    v = 1
    for _ in range(k):
        v = (v * 0x9E3779B97F4A7C15 + 0xD1B54A32D192ED03) & _MASK64
        out.append(v | 1)
    return np.array(out, dtype=np.uint64)


def span_dedup(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_words: int = 3,
    n_partitions: int = 64,
):
    """Per-doc ``(doc_id, text_dedup, n_spans, n_dropped)`` after corpus-wide
    first-occurrence span dedup.

    ``text_dedup`` is the space-joined surviving tokens (NULL when every
    span of a doc was dropped, mirroring SQL ``string_agg`` over an empty
    set); docs whose text yields zero tokens produce no output row
    (mirroring the oracle's unnest through the token table).
    """
    k = span_words
    mult = _span_multipliers(k)
    nb = np.uint64(n_partitions)

    def explode(batch: pa.Table) -> pa.Table:
        text = analyzer.normalize_text(batch[text_col])
        ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        row_ids, codes, dictionary = analyzer.tokenize_flat(text)
        if codes.size == 0:
            return pa.table(
                {
                    "h": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "cidx": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int32()),
                }
            )
        tok_h = _vocab_hash64(dictionary)[codes]
        pos = analyzer.token_positions(row_ids)
        cidx = pos // k
        with np.errstate(over="ignore"):
            term = tok_h * mult[pos - cidx * k]
        starts = np.ones(term.size, dtype=bool)
        starts[1:] = (row_ids[1:] != row_ids[:-1]) | (cidx[1:] != cidx[:-1])
        bnd = np.flatnonzero(starts)
        with np.errstate(over="ignore"):
            h = np.add.reduceat(term, bnd)
        return pa.table(
            {
                "h": pa.array(h.view(np.int64), pa.int64()),
                "doc_id": pa.array(ids[row_ids[bnd]], pa.int64()),
                "cidx": pa.array(cidx[bnd].astype(np.int64), pa.int64()),
                "bucket": pa.array((h % nb).astype(np.int32), pa.int32()),
            }
        )

    spans = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_drops(group: pd.DataFrame) -> pa.Table:
        h = group["h"].to_numpy()
        d = group["doc_id"].to_numpy()
        c = group["cidx"].to_numpy()
        order = np.lexsort((c, d, h))
        h, d, c = h[order], d[order], c[order]
        keep_first = np.ones(h.size, dtype=bool)
        keep_first[1:] = h[1:] != h[:-1]
        drop = ~keep_first
        return pa.table(
            {
                "dbucket": pa.array(
                    (d[drop] % n_partitions).astype(np.int32), pa.int32()
                ),
                "doc_id": pa.array(d[drop], pa.int64()),
                "cidx": pa.array(c[drop], pa.int64()),
                "text": pa.nulls(int(drop.sum()), pa.string()),
            }
        )

    drops = spans.groupby("bucket").map_groups(bucket_drops, batch_format="pandas")

    def doc_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        return pa.table(
            {
                "dbucket": pa.array((ids % n_partitions).astype(np.int32), pa.int32()),
                "doc_id": pa.array(ids, pa.int64()),
                "cidx": pa.array(np.full(ids.size, -1, np.int64), pa.int64()),
                "text": batch[text_col].combine_chunks().cast(pa.string()),
            }
        )

    docs_tagged = ds.map_batches(doc_rows, batch_format="pyarrow", zero_copy_batch=True)

    def rebuild(group: pd.DataFrame) -> pa.Table:
        is_doc = group["cidx"].to_numpy() == -1
        dg = group[is_doc]
        ids = dg["doc_id"].to_numpy()
        if ids.size == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "text_dedup": pa.array([], pa.string()),
                    "n_spans": pa.array([], pa.int64()),
                    "n_dropped": pa.array([], pa.int64()),
                }
            )
        text = analyzer.normalize_text(pa.array(dg["text"].tolist(), pa.string()))
        row_ids, codes, dictionary = analyzer.tokenize_flat(text)
        ntok = np.bincount(row_ids, minlength=ids.size) if codes.size else np.zeros(ids.size, np.int64)
        # map drop rows to local doc index (drops are co-bucketed with docs)
        dr_doc = group["doc_id"].to_numpy()[~is_doc]
        dr_cidx = group["cidx"].to_numpy()[~is_doc]
        order = np.argsort(ids, kind="stable")
        dr_local = order[np.searchsorted(ids[order], dr_doc)]
        pos = analyzer.token_positions(row_ids) if codes.size else np.array([], np.int64)
        cidx = pos // k
        shift = np.int64(1) << np.int64(32)  # cidx < 2^32 for any real doc
        keep = ~np.isin(row_ids.astype(np.int64) * shift + cidx, dr_local * shift + dr_cidx)
        kept_tok = pc.take(dictionary, pa.array(codes[keep].astype(np.int64)))
        kept_cnt = np.bincount(row_ids[keep], minlength=ids.size)
        offsets = np.zeros(ids.size + 1, np.int32)
        np.cumsum(kept_cnt, out=offsets[1:])
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), kept_tok),
            pa.scalar(" "),
        )
        # SQL string_agg over zero kept spans is NULL, not ''
        joined = pc.if_else(pa.array(kept_cnt > 0), joined, pa.nulls(ids.size, pa.string()))
        n_spans = (ntok + k - 1) // k
        n_dropped = np.bincount(dr_local, minlength=ids.size)
        has_tokens = ntok > 0  # zero-token docs are absent from the oracle
        return pa.table(
            {
                "doc_id": pa.array(ids[has_tokens], pa.int64()),
                "text_dedup": joined.filter(pa.array(has_tokens)),
                "n_spans": pa.array(n_spans[has_tokens].astype(np.int64), pa.int64()),
                "n_dropped": pa.array(n_dropped[has_tokens].astype(np.int64), pa.int64()),
            }
        )

    return (
        docs_tagged.union(drops)
        .groupby("dbucket")
        .map_groups(rebuild, batch_format="pandas")
    )


def span_dedup_sql(
    table: str = "documents",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_words: int = 3,
) -> str:
    """Oracle: identical semantics by span *string* equality (no hashing)."""
    tok = analyzer.sql_tokenize_expr(text_col)
    k = span_words
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, {tok} AS ts FROM {table}
),
w AS (
  SELECT doc_id, unnest(ts) AS w, generate_subscripts(ts, 1) AS i FROM toks
),
chunks AS (
  SELECT doc_id, CAST((i - 1) // {k} AS BIGINT) AS cidx,
         string_agg(w, ' ' ORDER BY i) AS p
  FROM w GROUP BY doc_id, (i - 1) // {k}
),
ranked AS (
  SELECT doc_id, cidx, p,
         row_number() OVER (PARTITION BY p ORDER BY doc_id, cidx) AS rn
  FROM chunks
)
SELECT doc_id,
       string_agg(CASE WHEN rn = 1 THEN p END, ' ' ORDER BY cidx) AS text_dedup,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM ranked
GROUP BY doc_id
ORDER BY doc_id
""".strip()
