"""As-of join — for each left row, the latest right row at or before it.

The reference has no as-of operator (its closest analog is the
carry-forward upsert, core/models/harvest.py:56-84, which is "as of the
previous harvest"); this is one of the training-data-pipeline operators Ray
Data lacks natively, composed from the primitives the engine already uses:

- both sides are co-partitioned into coarse hash buckets of the join key
  (same key -> same bucket, one shuffle of each side, no broadcast),
- within a bucket the match is one vectorized ``pd.merge_asof`` (sorted
  backward search, C kernel — no per-row Python).

Partitioning assumption: a key's rows all land in one bucket (guaranteed by
the hash), so buckets are independent; skewed keys cost only their own
bucket. Right-side ties on (key, ts) are resolved deterministically by
``tiebreak`` columns (the max under ascending order wins).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def asof_join(
    left_ds,
    right_ds,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreak: list[str] | None = None,
    n_partitions: int = 64,
):
    """Left as-of join: every left row gains ``value_cols`` from the latest
    right row with the same ``on`` key and ``right_ts`` <= ``left_ts``
    (NULLs when no match). ``on`` must be integral; the two ts columns must
    be mutually comparable dtypes and differently named; ``tiebreak``
    columns must be listed in ``value_cols`` (they ride along in the
    output). Returns left's columns + right's (ts, value) columns."""
    lsch = left_ds.schema().base_schema
    rsch = right_ds.schema().base_schema
    lnames = list(lsch.names)
    rnames = [on, right_ts] + [c for c in value_cols if c not in (on, right_ts)]
    extra_right = [c for c in rnames if c not in lnames]
    out_cols = lnames + extra_right
    # union schema: left fields + right-only fields, typed from their side
    fields = [(n, lsch.field(n).type) for n in lnames]
    fields += [(n, rsch.field(n).type) for n in extra_right]

    def pad(side: int, keep: list[str]):
        def run(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {
                name: (t[name] if name in keep and name in t.column_names else pa.nulls(n, typ))
                for name, typ in fields
            }
            k = np.asarray(t[on].combine_chunks().cast(pa.int64()))
            cols["_bucket"] = pa.array((k % n_partitions).astype(np.int32))
            cols["_side"] = pa.array(np.full(n, side, np.int8))
            return pa.table(cols)

        return run

    # left columns are never null on left rows, but the union pads them with
    # nulls on right rows, so pandas floats them inside the group — restore
    left_np_dtypes = {n: lsch.field(n).type.to_pandas_dtype() for n in lnames}

    def restore(df: pd.DataFrame) -> pd.DataFrame:
        for c, dt in left_np_dtypes.items():
            try:
                df[c] = df[c].astype(dt)
            except (ValueError, TypeError):
                pass  # genuinely-null left column: leave promoted
        return df

    def process(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["_side"] == 0][lnames]
        right = g[g["_side"] == 1][rnames].dropna(subset=[right_ts])
        if left.empty:
            return pd.DataFrame({c: pd.Series(dtype=g[c].dtype) for c in out_cols})
        if right.empty:
            out = left.copy()
            for c in extra_right:
                out[c] = pd.Series([None] * len(out), dtype=g[c].dtype, index=out.index)
            return restore(out[out_cols])
        right = right.sort_values([on, right_ts] + (tiebreak or []), kind="mergesort")
        right = right.drop_duplicates(subset=[on, right_ts], keep="last")
        left = left.sort_values(left_ts, kind="mergesort")
        right = right.sort_values(right_ts, kind="mergesort")
        merged = pd.merge_asof(
            left, right, left_on=left_ts, right_on=right_ts, by=on, direction="backward"
        )
        return restore(merged[out_cols])

    tagged = left_ds.map_batches(pad(0, lnames), batch_format="pyarrow").union(
        right_ds.map_batches(pad(1, rnames), batch_format="pyarrow")
    )
    return tagged.groupby("_bucket").map_groups(process, batch_format="pandas")
