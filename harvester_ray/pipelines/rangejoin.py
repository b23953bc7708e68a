"""Range (interval) join — match point rows to interval rows containing them.

The second join shape Ray Data lacks natively (with `pipelines/asof.py`):
left rows carry a point value, right rows carry [lo, hi] intervals, output
is the inner join on lo <= v <= hi. The reference's closest analog is its
date-window filtering of harvest sets (`since`/`purge_time` comparisons,
/root/reference/harvester/core/models/datatypes/dataset.py); the general
operator is what windowed enrichment (price bands, time ranges, numeric
taxonomies) needs at corpus scale.

Scale shape: the VALUE DOMAIN is range-partitioned into ``n_partitions``
equal-width buckets (domain bounds from a cheap min/max pre-pass over the
left's single value column, or passed explicitly). Points land in exactly
one bucket; each interval is REPLICATED to the buckets it overlaps — one
shuffle of each side, no broadcast, no all-pairs. Within a bucket, matching
is a chunked vectorized rectangle test (point-chunk × bucket-intervals
boolean mask → nonzero), memory-bounded by the chunk size.

Partitioning assumption: intervals-per-bucket stays bounded (interval width
comparable to bucket width). A single interval spanning the whole domain
replicates everywhere — callers with such skew should split fat intervals
first (the same discipline as salting hot keys).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_POINT_CHUNK = 8192


def range_join(
    left_ds,
    right_ds,
    *,
    value_col: str,
    lo_col: str,
    hi_col: str,
    left_cols: list[str],
    right_cols: list[str],
    n_partitions: int = 64,
    domain: tuple[float, float] | None = None,
):
    """Inner join: left rows (point ``value_col``) × right rows (interval
    [``lo_col``, ``hi_col``], inclusive both ends). Returns ``left_cols`` +
    ``right_cols``; NULL points/bounds never match."""
    if domain is None:
        lo_d = left_ds.min(value_col)
        hi_d = left_ds.max(value_col)
    else:
        lo_d, hi_d = domain
    width = max((hi_d - lo_d) / n_partitions, 1e-12)

    lnames = list(dict.fromkeys(left_cols + [value_col]))
    rnames = list(dict.fromkeys(right_cols + [lo_col, hi_col]))
    out_cols = left_cols + right_cols

    def bucket_of(v: np.ndarray) -> np.ndarray:
        return np.clip(((v - lo_d) / width).astype(np.int64), 0, n_partitions - 1)

    def pad_left(t: pa.Table) -> pa.Table:
        t = t.select([c for c in lnames if c in t.column_names])
        v = np.asarray(t[value_col].combine_chunks().cast(pa.float64()))
        ok = ~np.isnan(v)
        t = t.filter(pa.array(ok))
        cols = {f"l_{c}": t[c] for c in lnames}
        cols["_bucket"] = pa.array(bucket_of(v[ok]).astype(np.int32))
        cols["_side"] = pa.array(np.zeros(t.num_rows, np.int8))
        return pa.table(cols)

    def pad_right(t: pa.Table) -> pa.Table:
        t = t.select([c for c in rnames if c in t.column_names])
        lo = np.asarray(t[lo_col].combine_chunks().cast(pa.float64()))
        hi = np.asarray(t[hi_col].combine_chunks().cast(pa.float64()))
        ok = ~(np.isnan(lo) | np.isnan(hi)) & (lo <= hi)
        t = t.filter(pa.array(ok))
        lo, hi = lo[ok], hi[ok]
        b0, b1 = bucket_of(lo), bucket_of(hi)
        reps = (b1 - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(t.num_rows), reps)
        # bucket sequence b0[i]..b1[i] per interval, fully vectorized
        offs = np.concatenate([np.zeros(1, np.int64), np.cumsum(reps)])
        seq = np.arange(offs[-1]) - np.repeat(offs[:-1], reps) + np.repeat(b0, reps)
        rt = t.take(pa.array(idx))
        cols = {f"r_{c}": rt[c] for c in rnames}
        cols["_bucket"] = pa.array(seq.astype(np.int32))
        cols["_side"] = pa.array(np.ones(len(idx), np.int8))
        return pa.table(cols)

    lsch = left_ds.schema().base_schema
    rsch = right_ds.schema().base_schema
    fields = [(f"l_{c}", lsch.field(c).type) for c in lnames]
    fields += [(f"r_{c}", rsch.field(c).type) for c in rnames]

    def unify(run):
        # union requires identical schemas: pad the other side's columns
        def go(t: pa.Table) -> pa.Table:
            part = run(t)
            n = part.num_rows
            cols = {}
            for name, typ in fields:
                cols[name] = part[name] if name in part.column_names else pa.nulls(n, typ)
            cols["_bucket"] = part["_bucket"]
            cols["_side"] = part["_side"]
            return pa.table(cols)

        return go

    def match(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["_side"] == 0]
        right = g[g["_side"] == 1]
        empty = {c: pd.Series(dtype=g[("l_" if c in lnames else "r_") + c].dtype) for c in out_cols}
        if left.empty or right.empty:
            return pd.DataFrame(empty)
        v = left[f"l_{value_col}"].to_numpy(dtype=np.float64)
        lo = right[f"r_{lo_col}"].to_numpy(dtype=np.float64)
        hi = right[f"r_{hi_col}"].to_numpy(dtype=np.float64)
        li_parts, ri_parts = [], []
        for s in range(0, v.size, _POINT_CHUNK):
            vc = v[s : s + _POINT_CHUNK]
            m = (vc[:, None] >= lo[None, :]) & (vc[:, None] <= hi[None, :])
            pi, ii = np.nonzero(m)
            li_parts.append(pi + s)
            ri_parts.append(ii)
        li = np.concatenate(li_parts)
        ri = np.concatenate(ri_parts)
        if li.size == 0:
            return pd.DataFrame(empty)
        out = {}
        for c in out_cols:
            if c in left_cols:
                out[c] = left[f"l_{c}"].to_numpy()[li]
            else:
                out[c] = right[f"r_{c}"].to_numpy()[ri]
        return pd.DataFrame(out)

    tagged = left_ds.map_batches(unify(pad_left), batch_format="pyarrow").union(
        right_ds.map_batches(unify(pad_right), batch_format="pyarrow")
    )
    return tagged.groupby("_bucket").map_groups(match, batch_format="pandas")
