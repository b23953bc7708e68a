"""Document chunking: split long documents into overlapping token windows.

The training-example construction step every LLM data pipeline runs before
tokenized packing (`ops/packing.py` packs the result): windows of
``chunk_size`` tokens advancing by ``stride`` (stride < chunk_size ⇒
overlap). The reference's closest analog is its ≥1M-char truncation rule
(`/root/reference/harvester/files/models/datatypes/file.py:183-185`) —
truncation throws text away; chunking keeps it as multiple examples.

Shape: a pure flat-map expansion — one ``map_batches`` pass, no shuffle,
output rows ≈ input tokens / stride. The chunk text is assembled with
Arrow kernels (list gather + ``binary_join``), no per-chunk Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .. import analyzer


def chunk_documents(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 32,
    stride: int = 16,
    collect: bool = True,
):
    """Overlapping token windows per document: chunk ``k`` covers tokens
    ``[k·stride, k·stride + chunk_size)``; chunks exist for every start
    < n_tokens (so a doc with 1..chunk_size tokens yields exactly one).
    Token-less docs yield none. Returns
    ``(doc_id, chunk_idx, n_tokens, chunk_text)`` sorted by (doc_id,
    chunk_idx); ``collect=False`` returns the streaming Dataset."""

    def expand(batch: pa.Table) -> pa.Table:
        text = analyzer.normalize_text(batch[text_col])
        rows, codes, dictionary = analyzer.tokenize_flat(text)
        nrows = batch.num_rows
        counts = np.bincount(rows, minlength=nrows).astype(np.int64) if rows.size else np.zeros(nrows, np.int64)
        n_chunks = np.where(counts > 0, (counts - 1) // stride + 1, 0)
        total = int(n_chunks.sum())
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        if total == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], batch[id_col].type),
                    "chunk_idx": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "chunk_text": pa.array([], pa.string()),
                }
            )
        doc_of_chunk = np.repeat(np.arange(nrows), n_chunks)
        chunk_idx = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(n_chunks)[:-1])), n_chunks
        )
        row_off = np.concatenate(([0], np.cumsum(counts)))
        start = chunk_idx * stride
        length = np.minimum(chunk_size, counts[doc_of_chunk] - start)
        # flat gather indices: for chunk c, row_off[doc] + start .. + length
        chunk_off = np.concatenate(([0], np.cumsum(length)))
        flat_idx = (
            np.arange(int(chunk_off[-1]), dtype=np.int64)
            - np.repeat(chunk_off[:-1], length)
            + np.repeat(row_off[doc_of_chunk] + start, length)
        )
        # token strings for the flat stream, gathered per chunk
        toks = dictionary.take(pa.array(codes[flat_idx], pa.int32()))
        lists = pa.ListArray.from_arrays(pa.array(chunk_off, pa.int32()), toks)
        chunk_text = pc.binary_join(lists, " ")
        return pa.table(
            {
                "doc_id": pa.array(ids[doc_of_chunk], batch[id_col].type),
                "chunk_idx": pa.array(chunk_idx, pa.int64()),
                "n_tokens": pa.array(length, pa.int64()),
                "chunk_text": chunk_text.cast(pa.string()),
            }
        )

    res = ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)
    if not collect:
        return res
    out = res.to_pandas()
    cols = ["doc_id", "chunk_idx", "n_tokens", "chunk_text"]
    if out.empty:
        return pd.DataFrame(columns=cols)
    return out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)[cols]


def chunk_documents_sql(
    table: str = "documents",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 32,
    stride: int = 16,
) -> str:
    tok = analyzer.sql_tokenize_expr(text_col)
    c, s = chunk_size, stride
    return f"""
WITH toks AS (SELECT {id_col} AS doc_id, {tok} AS ts FROM {table}),
chunks AS (
  SELECT doc_id,
         unnest(range(0, (len(ts) - 1) // {s} + 1)) AS chunk_idx,
         ts
  FROM toks WHERE len(ts) > 0
)
SELECT doc_id, chunk_idx,
       CAST(least({c}, len(ts) - chunk_idx * {s}) AS BIGINT) AS n_tokens,
       array_to_string(ts[chunk_idx * {s} + 1 : chunk_idx * {s} + {c}], ' ') AS chunk_text
FROM chunks ORDER BY doc_id, chunk_idx
""".strip()


def chunk_dedup_stats(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 32,
    stride: int = 16,
) -> pd.DataFrame:
    """Composition gate: chunk the corpus, then measure chunk-level
    duplication (overlapping windows + repeated boilerplate make chunk
    dedup the step that actually shrinks a training set). Counting
    distincts streams md5 partials through one groupby — the chunk text
    itself never shuffles. Returns one row
    ``(n_chunks, n_distinct, dup_fraction)`` (fraction fixed-point /1e6).
    """
    import hashlib

    from ray.data.aggregate import Count

    chunks = chunk_documents(
        ds, id_col=id_col, text_col=text_col,
        chunk_size=chunk_size, stride=stride, collect=False,
    )

    def hash_chunks(t: pa.Table) -> pa.Table:
        texts = t["chunk_text"].combine_chunks().to_pylist()
        return pa.table(
            {"h": pa.array([hashlib.md5(x.encode()).hexdigest() for x in texts], pa.string())}
        )

    hashed = chunks.map_batches(hash_chunks, batch_format="pyarrow", zero_copy_batch=True)
    per_hash = hashed.groupby("h").aggregate(Count(alias_name="n")).to_pandas()
    n_distinct = len(per_hash)
    n_chunks = int(per_hash["n"].sum()) if n_distinct else 0
    dup = (
        float(np.floor((n_chunks - n_distinct) * 1e6 / n_chunks + 0.5) / 1e6)
        if n_chunks
        else 0.0
    )
    return pd.DataFrame(
        {
            "n_chunks": np.array([n_chunks], np.int64),
            "n_distinct": np.array([n_distinct], np.int64),
            "dup_fraction": [dup],
        }
    )


def chunk_dedup_stats_sql(
    table: str = "documents",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 32,
    stride: int = 16,
) -> str:
    inner = chunk_documents_sql(
        table, id_col=id_col, text_col=text_col,
        chunk_size=chunk_size, stride=stride,
    )
    return f"""
WITH chunks AS ({inner}),
c AS (
  SELECT CAST(count(*) AS BIGINT) AS n_chunks,
         CAST(count(DISTINCT md5(chunk_text)) AS BIGINT) AS n_distinct
  FROM chunks
)
SELECT n_chunks, n_distinct,
       CASE WHEN n_chunks = 0 THEN 0.0
            ELSE floor((n_chunks - n_distinct) * 1e6 / n_chunks + 0.5) / 1e6
       END AS dup_fraction
FROM c
""".strip()
