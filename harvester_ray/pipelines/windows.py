"""Event-time windowed aggregates over the events stream table.

Ray Data has no native event-time windows; these operators implement the
standard trio the streaming-shaped parts of the reference imply (Matomo
sessionization: harvester/core/analysis/matomo.py; incremental watermarks:
harvester/core/models/harvest.py:24-28) as batch transforms:

- tumbling:  window key computed per row inside map_batches (no shuffle
  beyond the final grouped aggregate) — relational.events_hourly_window.
- sliding:   each event expands to the ``size/step`` windows containing it
  (vectorized repeat inside map_batches), then one grouped aggregate.
- session:   per-key gap-based sessions in groupby(key).map_groups with an
  explicit in-group (ts, id) sort — relational.sessionize.

Ordering assumption: none for tumbling/sliding (commutative aggregates);
session windows sort within each key's group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def sliding_window_counts(
    ds,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    size_hours: int = 2,
    step_hours: int = 1,
):
    """Per (key, window_start) count+sum for sliding windows of
    ``size_hours`` advancing every ``step_hours``."""
    from ray.data.aggregate import Count, Sum

    n_windows = size_hours // step_hours
    step_us = step_hours * 3_600_000_000

    def expand(t: pa.Table) -> pa.Table:
        ts = np.asarray(t[ts_col].combine_chunks()).astype("datetime64[us]").astype(np.int64)
        keys = np.asarray(t[key_col].combine_chunks())
        vals = np.asarray(t[value_col].combine_chunks())
        base = (ts // step_us) * step_us  # floor to step
        # windows [base - i*step, …) for i in 0..n_windows-1 contain the event
        offsets = np.arange(n_windows, dtype=np.int64) * step_us
        ws = (base[:, None] - offsets[None, :]).ravel()
        rep_keys = np.repeat(keys, n_windows)
        rep_vals = np.repeat(vals, n_windows)
        return pa.table(
            {
                key_col: pa.array(rep_keys),
                "window_start": pa.array(ws.astype("datetime64[us]")),
                value_col: pa.array(rep_vals),
            }
        )

    out = (
        ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key_col, "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum(value_col, alias_name="sum_value"))
    )
    return out


def sliding_window_sql(
    table: str = "events",
    *,
    size_hours: int = 2,
    step_hours: int = 1,
) -> str:
    n = size_hours // step_hours
    parts = ", ".join(
        f"date_trunc('hour', ts) - INTERVAL {i * step_hours} HOUR" for i in range(n)
    )
    return f"""
SELECT user_id, window_start,
       count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM (
  SELECT user_id, value, unnest([{parts}]) AS window_start FROM {table}
)
GROUP BY user_id, window_start
ORDER BY user_id, window_start
""".strip()


def session_windows(
    ds,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    id_col: str = "event_id",
    gap_minutes: int = 30,
):
    """Per-key session windows (ordered gap scan inside map_groups):
    one row per session with start/end/count."""
    gap = np.timedelta64(gap_minutes * 60, "s")

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col], kind="mergesort")
        ts = g[ts_col].to_numpy()
        new = np.ones(len(g), dtype=np.int64)
        if len(g) > 1:
            new[1:] = (np.diff(ts) > gap).astype(np.int64)
        sess = np.cumsum(new) - 1
        out = (
            pd.DataFrame({"sess": sess, "ts": ts})
            .groupby("sess")["ts"]
            .agg(["min", "max", "count"])
            .reset_index()
        )
        out[key_col] = g[key_col].iloc[0]
        out = out.rename(columns={"min": "session_start", "max": "session_end", "count": "n_events"})
        return out[[key_col, "session_start", "session_end", "n_events"]]

    return ds.groupby(key_col).map_groups(sessions, batch_format="pandas")
