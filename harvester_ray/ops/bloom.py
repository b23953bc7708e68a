"""Bloom-filter semi-join: broadcast an m-bit filter of the build side's
keys, pre-filter the probe side, count survivors vs true matches.

At 100 TB a large-large join's dominant cost is shuffling probe rows that
can never match. The standard fix is a Bloom-filter pushdown: build a
compact bit array from the (much smaller) build-side key set, broadcast it
once (`ray.put`, ~KBs–MBs regardless of probe size), and drop non-matching
probe rows before any exchange. The reference leans on OpenSearch for its
joins, but its set-integrity/reconciliation logic does the same
"small-key-set membership" dance in Python
(`/root/reference/harvester/core/tasks/harvest/set.py:99-126`).

Determinism for the oracle: bit positions come from md5 double hashing —
``h1, h2`` are the two 64-bit halves of ``md5(str(key))`` (the same
construction as ops/sketch.py), ``pos_i = (h1 % m + i·(h2 % m)) % m`` —
reproducible exactly in DuckDB with UBIGINT arithmetic (no wrap-around
overflow: both operands are already reduced mod m). False positives are
therefore identical on both sides and part of the verified output.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _md5_pair(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    h1 = np.empty(values.size, dtype=np.uint64)
    h2 = np.empty(values.size, dtype=np.uint64)
    for i, v in enumerate(values):
        d = hashlib.md5(str(v).encode()).hexdigest()
        h1[i] = int(d[:16], 16)
        h2[i] = int(d[16:32], 16)
    return h1, h2


def _positions(keys: np.ndarray, m: int, k: int) -> np.ndarray:
    """(n, k) bit positions by double hashing, reduced mod m before the
    multiply so engine and SQL share one overflow-free expression."""
    h1, h2 = _md5_pair(keys)
    i = np.arange(k, dtype=np.uint64)
    return ((h1 % np.uint64(m))[:, None] + i[None, :] * (h2 % np.uint64(m))[:, None]) % np.uint64(m)


def bloom_semijoin_stats(
    probe_ds,
    build_ds,
    *,
    probe_key: str,
    build_key: str,
    m: int = 16384,
    k: int = 2,
) -> pd.DataFrame:
    """Build an m-bit Bloom filter over the build side's distinct keys,
    probe every probe-side row, and return one summary row:
    ``(n_build_keys, n_probe, n_pass, n_true, n_false_pos)`` where n_pass
    counts probe rows surviving the filter and n_true counts rows whose key
    really is in the build set (n_false_pos = n_pass − n_true)."""

    def build_bits(t: pa.Table) -> pa.Table:
        vals = t[build_key].combine_chunks().unique().to_numpy(zero_copy_only=False)
        pos = np.unique(_positions(vals, m, k))
        # per-batch partial: the distinct positions + the distinct keys
        # (keys needed for the exact-membership comparison; build side is
        # the SMALL side by contract, same bound as any broadcast join)
        return pa.table(
            {
                "kind": pa.array(
                    np.concatenate([np.zeros(pos.size, np.int8), np.ones(vals.size, np.int8)])
                ),
                "v": pa.array(
                    np.concatenate([pos.astype(np.int64), vals.astype(np.int64)]), pa.int64()
                ),
            }
        )

    parts = [
        b.to_pandas()
        for b in build_ds.map_batches(
            build_bits, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow")
    ]
    folded = (
        pd.concat(parts, ignore_index=True).drop_duplicates()
        if parts
        else pd.DataFrame({"kind": pd.Series([], dtype=np.int8), "v": pd.Series([], dtype=np.int64)})
    )
    positions = np.unique(folded.loc[folded["kind"] == 0, "v"].to_numpy(np.int64))
    build_keys = np.unique(folded.loc[folded["kind"] == 1, "v"].to_numpy(np.int64))
    bits = np.zeros(m, dtype=bool)
    bits[positions] = True
    ref = ray.put((bits, build_keys))

    def probe(t: pa.Table) -> pa.Table:
        bit_arr, keys_sorted = ray.get(ref)
        vals = t[probe_key].combine_chunks().to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(vals, return_inverse=True)
        pos = _positions(uniq, m, k)
        member = bit_arr[pos.astype(np.int64)].all(axis=1)
        idx = np.searchsorted(keys_sorted, uniq)
        true_m = (
            (keys_sorted[np.clip(idx, 0, max(keys_sorted.size - 1, 0))] == uniq)
            if keys_sorted.size
            else np.zeros(uniq.size, bool)
        )
        return pa.table(
            {
                "n_probe": pa.array([len(t)], pa.int64()),
                "n_pass": pa.array([int(member[inv].sum())], pa.int64()),
                "n_true": pa.array([int(true_m[inv].sum())], pa.int64()),
            }
        )

    agg = probe_ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    n_probe = int(agg["n_probe"].sum()) if len(agg) else 0
    n_pass = int(agg["n_pass"].sum()) if len(agg) else 0
    n_true = int(agg["n_true"].sum()) if len(agg) else 0
    return pd.DataFrame(
        {
            "n_build_keys": np.array([build_keys.size], np.int64),
            "n_probe": np.array([n_probe], np.int64),
            "n_pass": np.array([n_pass], np.int64),
            "n_true": np.array([n_true], np.int64),
            "n_false_pos": np.array([n_pass - n_true], np.int64),
        }
    )


def bloom_semijoin_sql(
    probe_table: str,
    build_expr: str,
    *,
    probe_key: str,
    build_key: str,
    m: int = 16384,
    k: int = 2,
) -> str:
    """Oracle: identical bit positions via DuckDB md5 + UBIGINT arithmetic.
    ``build_expr`` is a table name or a parenthesized subquery."""

    def pos_cte(name: str, src: str, key: str) -> str:
        return f"""
{name}_h AS (
  SELECT key,
         CAST(('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 16)) AS UBIGINT) % {m} AS h1,
         CAST(('0x' || substr(md5(CAST(key AS VARCHAR)), 17, 16)) AS UBIGINT) % {m} AS h2
  FROM (SELECT DISTINCT {key} AS key FROM {src})
),
{name}_pos AS (
  SELECT key, (h1 + i * h2) % {m} AS pos
  FROM {name}_h CROSS JOIN range({k}) t(i)
)"""

    return f"""
WITH {pos_cte("b", build_expr, build_key)},
bits AS (SELECT DISTINCT pos FROM b_pos),
{pos_cte("p", probe_table, probe_key)},
member AS (
  SELECT pp.key
  FROM p_pos pp LEFT JOIN bits ON pp.pos = bits.pos
  GROUP BY pp.key HAVING count(bits.pos) = {k}
),
truth AS (SELECT DISTINCT {build_key} AS key FROM {build_expr}),
probe_rows AS (SELECT {probe_key} AS key FROM {probe_table})
SELECT (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_build_keys,
       (SELECT CAST(count(*) AS BIGINT) FROM probe_rows) AS n_probe,
       (SELECT CAST(count(*) AS BIGINT) FROM probe_rows pr JOIN member mm ON pr.key = mm.key) AS n_pass,
       (SELECT CAST(count(*) AS BIGINT) FROM probe_rows pr JOIN truth tt ON pr.key = tt.key) AS n_true,
       (SELECT CAST(count(*) AS BIGINT) FROM probe_rows pr JOIN member mm ON pr.key = mm.key)
       - (SELECT CAST(count(*) AS BIGINT) FROM probe_rows pr JOIN truth tt ON pr.key = tt.key) AS n_false_pos
""".strip()
