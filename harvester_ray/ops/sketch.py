"""Distinct-count sketching: KMV (k-minimum-values) over a column.

At 100 TB, exact ``count(DISTINCT …)`` over a high-cardinality column
(users, terms, doc hashes) is a full shuffle of every distinct value; a KMV
sketch answers it with a fixed-size state: keep the k smallest 64-bit
hashes ever seen — then ``(k-1) / (kth_min / 2^64)`` estimates the
cardinality (Bar-Yossef et al. 2002, "Counting distinct elements in a data
stream"). Sketches merge by unioning and re-taking the k smallest, so the
whole computation is one streaming map pass plus an O(k·blocks) merge —
no shuffle of the data.

Unlike HyperLogLog, KMV is *exactly reproducible in SQL*: the hash is the
first 16 hex chars of md5 (DuckDB: ``('0x' || substr(md5(v), 1, 16))
::UBIGINT``), so the driver gate verifies the sketch state itself — kth
minimum, retained-hash count, and the derived estimate — value-identically,
not just approximately. The reference's analog surface is its count-based
integrity/reporting layer (`/root/reference/harvester/core/logging.py:90-133`).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TWO64 = float(1 << 64)


def _md5_64(values: list[str]) -> np.ndarray:
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        out[i] = int(hashlib.md5(v.encode()).hexdigest()[:16], 16)
    return out


def kmv_distinct(ds, col: str, *, k: int = 256):
    """KMV distinct-count sketch → 1-row Dataset-compatible DataFrame.

    Returns (n_kept, kth_min, estimate): retained hash count (= k unless
    the true cardinality is smaller — then the count IS exact), the kth
    minimum hash, and the cardinality estimate. ``estimate`` equals
    ``n_kept`` exactly when fewer than k distinct values exist.
    """
    import pandas as pd

    def batch_mins(t: pa.Table) -> pa.Table:
        vals = pc.drop_null(t[col].combine_chunks().cast(pa.string())).unique()
        h = np.unique(_md5_64(vals.to_pylist()))
        if h.size > k:
            h = h[:k]  # np.unique output is sorted — smallest k
        return pa.table({"h": pa.array(h.view(np.int64), pa.int64())})

    parts = ds.map_batches(
        batch_mins, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    merged = np.unique(parts["h"].to_numpy().view(np.uint64)) if len(parts) else np.empty(0, np.uint64)
    if merged.size > k:
        merged = merged[:k]
    n_kept = int(merged.size)
    if n_kept == 0:
        return pd.DataFrame({"n_kept": [0], "kth_min": [0], "estimate": [0.0]})
    kth = int(merged[-1])
    estimate = (
        float(n_kept)
        if n_kept < k
        else round((k - 1) / (float(merged[k - 1]) / _TWO64), 4)
    )
    return pd.DataFrame(
        {
            "n_kept": [n_kept],
            "kth_min": np.array([kth], dtype=np.uint64).view(np.int64),
            "estimate": [estimate],
        }
    )


def kmv_distinct_sql(table: str, col: str, *, k: int = 256) -> str:
    """Oracle: identical sketch state + estimate in SQL."""
    return f"""
WITH hashes AS (
  SELECT DISTINCT CAST(('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 16)) AS UBIGINT) AS h
  FROM {table} WHERE {col} IS NOT NULL
),
mins AS (SELECT h FROM hashes ORDER BY h LIMIT {k}),
st AS (
  SELECT count(*) AS n_kept, max(h) AS kth FROM mins
)
SELECT CAST(n_kept AS BIGINT) AS n_kept,
       CAST(CASE WHEN kth >= CAST(9223372036854775808 AS UBIGINT)
                 THEN CAST(kth AS HUGEINT) - CAST(18446744073709551616 AS HUGEINT)
                 ELSE CAST(kth AS HUGEINT) END AS BIGINT) AS kth_min,
       CASE WHEN n_kept < {k} THEN n_kept * 1.0
            ELSE round(({k} - 1) / (kth / 18446744073709551616.0), 4)
       END AS estimate
FROM st
""".strip()
