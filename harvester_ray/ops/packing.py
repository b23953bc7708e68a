"""Sequence packing: assign documents to fixed-capacity token bins.

Training-data pipelines concatenate documents into fixed-length model
contexts ("packing"); the deterministic, partition-independent variant is
virtual-concatenation packing — lay all docs end-to-end in doc_id order
and cut every ``capacity`` tokens: doc d starts at the exclusive prefix
sum of token counts before it, and its bin is ``start // capacity``. The
reference's analog is its fixed-size batch dispatch (100-doc index
batches, /root/reference/harvester/search/tasks/index.py:36-42); packing
is the token-budgeted generalization.

The interesting distributed primitive is the GLOBAL PREFIX SUM, which
``Dataset`` has no native operator for. Classic two-phase scan:

1. one streaming pass computes per-doc token counts and per-RANGE-BUCKET
   subtotals (doc_id hashed into ordered range buckets from a min/max
   pre-pass — ranges, not hashes, so bucket order == doc order);
2. the P subtotals (P rows, driver-side exclusive scan — O(P), never the
   data) become per-bucket base offsets; a bucketed shuffle then sorts
   each bucket locally and cumsums within it, adding its base.

Token counts are integers, so every sum is order-independent and the SQL
window-function oracle matches exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import analyzer


def pack_sequences(
    ds,
    *,
    capacity: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_partitions: int = 64,
):
    """(doc_id, n_tok, start_tok, bin) per doc: exclusive global prefix sum
    of token counts in doc_id order, bin = start_tok // capacity."""
    lo = ds.min(id_col)
    hi = ds.max(id_col)
    span = max(hi - lo + 1, 1)

    def counts(t: pa.Table) -> pa.Table:
        text = analyzer.normalize_text(t[text_col])
        rows, _, _ = analyzer.tokenize_flat(text)
        n = np.bincount(rows, minlength=len(text)).astype(np.int64)
        ids = np.asarray(t[id_col].combine_chunks().cast(pa.int64()))
        bucket = ((ids - lo) * n_partitions // span).astype(np.int32)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tok": pa.array(n, pa.int64()),
                "bucket": pa.array(bucket),
            }
        )

    counted = ds.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True)
    counted = counted.materialize()  # two consumers: subtotals + the scan

    from ray.data.aggregate import Sum

    subtotals = counted.groupby("bucket").aggregate(Sum("n_tok", alias_name="s")).to_pandas()
    base = np.zeros(n_partitions, dtype=np.int64)
    if len(subtotals):
        base[subtotals["bucket"].to_numpy()] = subtotals["s"].to_numpy(dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(base)[:-1]])  # exclusive scan

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        ntok = g["n_tok"].to_numpy(dtype=np.int64)
        start = offsets[int(g["bucket"].iloc[0])] + np.concatenate(
            [[0], np.cumsum(ntok)[:-1]]
        )
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"],
                "n_tok": ntok,
                "start_tok": start,
                "bin": start // capacity,
            }
        )

    return counted.groupby("bucket").map_groups(scan, batch_format="pandas")


def pack_sequences_sql(
    table: str = "documents",
    *,
    capacity: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Oracle: identical packing via a window-function prefix sum."""
    tok = analyzer.sql_tokenize_expr(text_col)
    return f"""
WITH c AS (
  SELECT {id_col} AS doc_id, len({tok}) AS n_tok FROM {table}
),
s AS (
  SELECT doc_id, n_tok,
         coalesce(sum(n_tok) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
  FROM c
)
SELECT doc_id, n_tok, CAST(start_tok AS BIGINT) AS start_tok,
       CAST(start_tok // {capacity} AS BIGINT) AS bin
FROM s ORDER BY doc_id
""".strip()
