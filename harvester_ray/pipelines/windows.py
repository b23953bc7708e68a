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


def late_arrivals(
    files: list[str] | str,
    *,
    interval_us: int = 3_600_000_000,
    allowed_lateness_us: int = 3_600_000_000,
    ts_col: str = "ts",
    seq_col: str = "event_id",
    seq_scramble: bool = False,
) -> pd.DataFrame:
    """Watermark / allowed-lateness accounting (the Flink/Beam late-data
    contract Ray Data lacks natively): processing events in ARRIVAL order
    (``seq_col``), the watermark after each event is
    ``running_max(ts) − allowed_lateness``; an event is LATE if its event
    time is already behind the watermark when it arrives. Returns per
    tumbling window ``(bucket_us, n_events, n_late)``.

    Distributed shape (the classic two-phase prefix scan, zero shuffle):
    arrival logs are append-ordered — files in name order, rows in seq
    order within a file — so phase 1 reads each fragment once and returns
    only its max event time (bytes ∝ #files); the driver computes the
    exclusive prefix max per file (#files values); phase 2 re-reads each
    fragment with its prefix, flags lateness against
    ``max(prefix, local running max)`` and folds per-window partials
    locally. Only (bucket, counts) partials leave the workers.
    """
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    if isinstance(files, str):
        files = sorted(
            os.path.join(files, f) for f in os.listdir(files)
            if f.endswith(".parquet")
        )
    files = sorted(files)
    if seq_scramble and len(files) > 1:
        raise ValueError("seq_scramble requires a single fragment")

    @ray.remote
    def file_max(f: str):
        t = pq.read_table(f, columns=[ts_col])
        if t.num_rows == 0:
            return None
        return int(
            pc.max(t[ts_col].cast(pa.timestamp("us")).cast(pa.int64())).as_py()
        )

    maxima = ray.get([file_max.remote(f) for f in files])
    prefix: list[int | None] = []
    cur: int | None = None
    for m in maxima:
        prefix.append(cur)
        if m is not None:
            cur = m if cur is None else max(cur, m)

    @ray.remote
    def score(f: str, pre: int | None):
        t = pq.read_table(f, columns=[seq_col, ts_col])
        if t.num_rows == 0:
            return pd.DataFrame({"bucket_us": [], "n_events": [], "n_late": []})
        seq = np.asarray(t[seq_col].combine_chunks().cast(pa.int64()))
        if seq_scramble:
            seq = np.bitwise_xor(seq, 15)
        order = np.argsort(seq, kind="mergesort")
        tsu = np.asarray(
            t[ts_col].combine_chunks().cast(pa.timestamp("us")).cast(pa.int64())
        )[order]
        run = np.maximum.accumulate(tsu)
        prevmax = np.empty_like(run)
        prevmax[0] = np.iinfo(np.int64).min if pre is None else pre
        prevmax[1:] = run[:-1]
        if pre is not None:
            np.maximum(prevmax, pre, out=prevmax)
        late = (prevmax != np.iinfo(np.int64).min) & (
            tsu < prevmax - allowed_lateness_us
        )
        bucket = (tsu // interval_us) * interval_us
        df = pd.DataFrame({"bucket_us": bucket, "late": late})
        out = df.groupby("bucket_us").agg(
            n_events=("late", "size"), n_late=("late", "sum")
        ).reset_index()
        return out

    parts = ray.get([score.remote(f, p) for f, p in zip(files, prefix)])
    out = (
        pd.concat(parts, ignore_index=True)
        .groupby("bucket_us", as_index=False)[["n_events", "n_late"]]
        .sum()
        .sort_values("bucket_us")
        .reset_index(drop=True)
    )
    return out.astype(
        {"bucket_us": np.int64, "n_events": np.int64, "n_late": np.int64}
    )


def late_arrivals_sql(
    table: str = "events",
    *,
    interval_us: int = 3_600_000_000,
    allowed_lateness_us: int = 3_600_000_000,
    ts_col: str = "ts",
    seq_col: str = "event_id",
    seq_scramble: bool = False,
) -> str:
    """Oracle for ``late_arrivals``: the running max as a window function
    over arrival order; the first arrival is never late."""
    seq = f"xor({seq_col}, 15)" if seq_scramble else seq_col
    return f"""
WITH e AS (
  SELECT {seq} AS seq, epoch_us(CAST({ts_col} AS TIMESTAMP)) AS tsu
  FROM {table}
),
w AS (
  SELECT seq, tsu,
         max(tsu) OVER (ORDER BY seq
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prevmax
  FROM e
)
SELECT CAST((tsu // {interval_us}) * {interval_us} AS BIGINT) AS bucket_us,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) FILTER (
         WHERE prevmax IS NOT NULL AND tsu < prevmax - {allowed_lateness_us}
       ) AS BIGINT) AS n_late
FROM w GROUP BY 1 ORDER BY 1
""".strip()


def window_gaps(
    ds,
    *,
    interval_us: int = 3_600_000_000,
    ts_col: str = "ts",
) -> pd.DataFrame:
    """Data-completeness check: tumbling windows between the stream's min
    and max that contain NO events (the gap report a backfill scheduler
    consumes; the reference's harvest-state machinery implies the same
    freshness audit). Per batch only the distinct present buckets + local
    min/max leave the worker (bounded by time-range/interval, never
    events); the gap set difference is tiny driver work."""
    import pyarrow.compute as pc

    def partials(batch: pa.Table) -> pa.Table:
        tsu = np.asarray(
            batch[ts_col].combine_chunks().cast(pa.timestamp("us")).cast(pa.int64())
        )
        buckets = np.unique((tsu // interval_us) * interval_us)
        return pa.table({"bucket_us": pa.array(buckets, pa.int64())})

    parts = [
        b.to_pandas()
        for b in ds.map_batches(
            partials, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow")
    ]
    empty = pd.DataFrame({"bucket_us": pd.Series(dtype=np.int64)})
    if not parts:
        return empty
    present = np.unique(pd.concat(parts, ignore_index=True)["bucket_us"].to_numpy())
    if present.size == 0:
        return empty
    full = np.arange(present[0], present[-1] + 1, interval_us, dtype=np.int64)
    gaps = np.setdiff1d(full, present, assume_unique=True)
    return pd.DataFrame({"bucket_us": gaps})


def window_gaps_sql(
    table: str = "events",
    *,
    interval_us: int = 3_600_000_000,
    ts_col: str = "ts",
) -> str:
    """Oracle for ``window_gaps``: generate_series over the bucket range
    minus the present buckets."""
    return f"""
WITH b AS (
  SELECT DISTINCT (epoch_us(CAST({ts_col} AS TIMESTAMP)) // {interval_us})
                  * {interval_us} AS bucket_us
  FROM {table}
),
rng AS (
  SELECT unnest(generate_series(
           (SELECT min(bucket_us) FROM b),
           (SELECT max(bucket_us) FROM b),
           {interval_us})) AS bucket_us
)
SELECT CAST(r.bucket_us AS BIGINT) AS bucket_us
FROM rng r LEFT JOIN b USING (bucket_us)
WHERE b.bucket_us IS NULL ORDER BY 1
""".strip()
