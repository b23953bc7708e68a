"""Per-source boilerplate-span removal (frequent-line stripping).

Web-scale curation pipelines (CCNet, Gopher, RefinedWeb) strip *boilerplate
lines* — nav bars, cookie banners, license footers — detected as lines that
recur across many documents of the same source/domain. The reference's
analog is its per-source normalization sweep (each source's extractor strips
known site furniture before `Document.build`,
`/root/reference/harvester/products/sources/*.py`); this operator is the
data-driven generalization: no hand-written per-site rules, the corpus
itself votes on what is furniture.

The test corpora have no newline structure, so the "line" unit is the same
fixed window of ``span_words`` analyzer tokens as `ops/spandedup.py`
(non-overlapping, last span may be short) — one span definition shared by
engine, oracle, and the sibling span-dedup op. A span is boilerplate for
source S iff it occurs in at least ``min_docs`` distinct docs of S AND in at
least ``pct``% of S's docs (both integer comparisons → exact parity):
``df >= min_docs AND df * 100 >= pct * n_docs(S)``. Unlike span_dedup
(first occurrence survives), boilerplate spans are stripped EVERYWHERE —
the first copy is furniture too.

Scale shape (one bounded exchange; document text never crosses the wire):

1. count: per-batch distinct ``(span_hash u64, source)`` pairs per doc —
   docs are rows, so a doc's spans never split across batches and per-batch
   dedup ≡ global distinct-doc counting. One all-to-all of (h, source)
   pairs hashed into ``n_buckets`` groups; each bucket counts df per
   (source, span) vectorized and emits ONLY the spans crossing the
   threshold.
2. broadcast: the surviving boilerplate set is tiny by construction (a
   span must recur in ≥pct% of a source's docs); it is collected once and
   broadcast via ``ray.put`` as per-source sorted hash arrays.
3. strip: a second streaming pass re-derives each doc's spans locally,
   drops members of its source's set (vectorized ``searchsorted``), and
   rebuilds the text with one ListArray/binary_join pass — no shuffle.

Span hashing is positional (the spandedup multipliers); 64-bit collisions
are the standard accepted error shared with `ops/dupgrams.py`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .. import analyzer
from .dedup import _vocab_hash64
from .spandedup import _span_multipliers

_MASK64 = (1 << 64) - 1


def _batch_spans(batch: pa.Table, text_col: str, k: int, mult: np.ndarray):
    """Tokenize a batch and return ``(row_ids, codes, dictionary, bnd, h)``
    where ``bnd`` indexes each span occurrence's first token and ``h`` is
    its positional u64 hash (empty arrays when the batch has no tokens)."""
    text = analyzer.normalize_text(batch[text_col])
    row_ids, codes, dictionary = analyzer.tokenize_flat(text)
    if codes.size == 0:
        e = np.array([], np.int64)
        return e, e, dictionary, e, np.array([], np.uint64)
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
    return row_ids, codes, dictionary, bnd, h


def boilerplate_strip(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    span_words: int = 3,
    pct: int = 20,
    min_docs: int = 2,
    n_buckets: int = 64,
):
    """Per-doc ``(doc_id, text_clean, n_spans, n_stripped)`` after stripping
    every occurrence of each source's boilerplate spans.

    ``text_clean`` is the space-joined surviving tokens (NULL when every
    span was stripped, mirroring SQL ``string_agg`` over an empty set);
    docs whose text yields zero tokens produce no output row (mirroring the
    oracle's unnest through the token table).
    """
    import ray

    k = span_words
    mult = _span_multipliers(k)
    nb = np.uint64(n_buckets)

    # tiny pre-pass: docs per source (ALL docs, token-bearing or not)
    def src_counts(batch: pa.Table) -> pa.Table:
        return batch.select([source_col]).group_by(source_col).aggregate(
            [(source_col, "count")]
        )

    parts = ds.map_batches(src_counts, batch_format="pyarrow").to_pandas()
    n_docs = (
        parts.groupby(source_col)[f"{source_col}_count"].sum().to_dict()
        if len(parts)
        else {}
    )

    def span_pairs(batch: pa.Table) -> pa.Table:
        row_ids, _codes, _dic, bnd, h = _batch_spans(batch, text_col, k, mult)
        if bnd.size == 0:
            return pa.table(
                {
                    "h": pa.array([], pa.int64()),
                    "source": pa.array([], pa.string()),
                    "bucket": pa.array([], pa.int32()),
                }
            )
        src = batch[source_col].to_pandas().to_numpy(dtype=object)
        occ_row = row_ids[bnd]
        # distinct (h, doc) within the batch ≡ global distinct-doc pairs
        key = pd.DataFrame({"h": h.view(np.int64), "r": occ_row})
        dedup = ~key.duplicated().to_numpy()
        h_d = h[dedup]
        return pa.table(
            {
                "h": pa.array(h_d.view(np.int64), pa.int64()),
                "source": pa.array(src[occ_row[dedup]], pa.string()),
                "bucket": pa.array((h_d % nb).astype(np.int32), pa.int32()),
            }
        )

    pairs = ds.map_batches(span_pairs, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_boiler(group: pd.DataFrame) -> pa.Table:
        df = group.groupby(["source", "h"], sort=False).size().reset_index(name="df")
        nd = df["source"].map(n_docs).to_numpy(np.int64)
        dfv = df["df"].to_numpy(np.int64)
        keep = (dfv >= min_docs) & (dfv * 100 >= pct * nd)
        kept = df.loc[keep]
        return pa.table(
            {
                "source": pa.array(kept["source"].to_numpy(dtype=object), pa.string()),
                "h": pa.array(kept["h"].to_numpy(np.int64), pa.int64()),
                "df": pa.array(kept["df"].to_numpy(np.int64), pa.int64()),
            }
        )

    boiler = (
        pairs.groupby("bucket").map_groups(bucket_boiler, batch_format="pandas")
    ).to_pandas()
    bset = {
        s: np.sort(g["h"].to_numpy().view(np.uint64))
        for s, g in boiler.groupby("source")
    } if len(boiler) else {}
    bref = ray.put(bset)

    def strip(batch: pa.Table) -> pa.Table:
        sets = ray.get(bref)
        ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        n = batch.num_rows
        row_ids, codes, dictionary, bnd, h = _batch_spans(batch, text_col, k, mult)
        if bnd.size == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "text_clean": pa.array([], pa.string()),
                    "n_spans": pa.array([], pa.int64()),
                    "n_stripped": pa.array([], pa.int64()),
                }
            )
        src = batch[source_col].to_pandas().to_numpy(dtype=object)
        occ_row = row_ids[bnd]
        drop_occ = np.zeros(bnd.size, dtype=bool)
        for s in pd.unique(src[occ_row]):
            arr = sets.get(s)
            if arr is None or arr.size == 0:
                continue
            m = src[occ_row] == s
            pos = np.searchsorted(arr, h[m])
            pos_c = np.clip(pos, 0, arr.size - 1)
            drop_occ[m] = arr[pos_c] == h[m]
        span_sizes = np.diff(np.append(bnd, row_ids.size))
        keep_tok = np.repeat(~drop_occ, span_sizes)
        kept_tok = pc.take(dictionary, pa.array(codes[keep_tok].astype(np.int64)))
        kept_cnt = np.bincount(row_ids[keep_tok], minlength=n)
        offsets = np.zeros(n + 1, np.int32)
        np.cumsum(kept_cnt, out=offsets[1:])
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), kept_tok),
            pa.scalar(" "),
        )
        joined = pc.if_else(
            pa.array(kept_cnt > 0), joined, pa.nulls(n, pa.string())
        )
        n_spans = np.bincount(occ_row, minlength=n)
        n_stripped = np.bincount(occ_row[drop_occ], minlength=n)
        has_tokens = n_spans > 0
        return pa.table(
            {
                "doc_id": pa.array(ids[has_tokens], pa.int64()),
                "text_clean": joined.filter(pa.array(has_tokens)),
                "n_spans": pa.array(n_spans[has_tokens].astype(np.int64), pa.int64()),
                "n_stripped": pa.array(
                    n_stripped[has_tokens].astype(np.int64), pa.int64()
                ),
            }
        )

    return ds.map_batches(strip, batch_format="pyarrow", zero_copy_batch=True)


def boilerplate_strip_sql(
    table: str = "documents",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    span_words: int = 3,
    pct: int = 20,
    min_docs: int = 2,
) -> str:
    """Oracle: identical semantics by span *string* equality (no hashing)."""
    tok = analyzer.sql_tokenize_expr(text_col)
    k = span_words
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, {source_col} AS source, {tok} AS ts FROM {table}
),
w AS (
  SELECT doc_id, source, unnest(ts) AS w, generate_subscripts(ts, 1) AS i
  FROM toks
),
chunks AS (
  SELECT doc_id, source, CAST((i - 1) // {k} AS BIGINT) AS cidx,
         string_agg(w, ' ' ORDER BY i) AS p
  FROM w GROUP BY doc_id, source, (i - 1) // {k}
),
nd AS (
  SELECT {source_col} AS source, CAST(count(*) AS BIGINT) AS n_docs
  FROM {table} GROUP BY 1
),
df AS (
  SELECT source, p, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM chunks GROUP BY source, p
),
boiler AS (
  SELECT df.source, df.p
  FROM df JOIN nd USING (source)
  WHERE df.df >= {min_docs} AND df.df * 100 >= {pct} * nd.n_docs
),
marked AS (
  SELECT c.doc_id, c.cidx, c.p, (b.p IS NOT NULL) AS is_b
  FROM chunks c
  LEFT JOIN boiler b ON b.source = c.source AND b.p = c.p
)
SELECT doc_id,
       string_agg(CASE WHEN NOT is_b THEN p END, ' ' ORDER BY cidx) AS text_clean,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(CASE WHEN is_b THEN 1 ELSE 0 END) AS BIGINT) AS n_stripped
FROM marked
GROUP BY doc_id
ORDER BY doc_id
""".strip()
