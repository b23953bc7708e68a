"""Continuous pivot transform (OpenSearch _transform analog).

The reference's stack exposes OpenSearch transforms (continuous pivots that
materialize an aggregated view of a source index and keep it fresh by
recomputing only the group keys touched since the last checkpoint); the
reference itself refreshes its facet/metrics materializations the same way
(harvester/core/tasks — the Celery-scheduled recount jobs). Here the dest
is a bucket-partitioned Parquet directory and the checkpoint is a source
timestamp watermark.

Semantics (matching ES transform's continuous mode):
- initial run pivots everything at or before the checkpoint;
- the continuous step collects the DISTINCT group keys seen after the
  checkpoint and recomputes those groups FROM FULL SOURCE HISTORY (this is
  how ES transforms stay correct for non-decomposable aggs like distinct
  counts), leaving untouched groups as-is.

Scale shape: the dest is partitioned by ``user_id % n_buckets`` so the
continuous step rewrites only the bucket files containing changed keys —
the resumable-output story — while unchanged buckets are never read or
written. Per-batch map-side partials bound what crosses the wire to one
row per (group, block); the driver folds them with pyarrow ``group_by``
(group cardinality ≤ users — the CLAUDE.md vocabulary rule; past that,
swap the fold for a keyed exchange bucketed like the dest).

Exact parity: value sums are 1e-6 fixed-point int64 (order-independent),
timestamps compare as epoch micros, distinct-type counts are exact
set-distincts recomputed per group.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

_SCALE = 1_000_000


def _pivot_partials(ds) -> pa.Table:
    """One streaming pass → folded (user_id, n, sum_q, last_us) table plus
    exact distinct (user_id, event_type) pairs, joined on the driver."""

    def partial(t: pa.Table) -> pa.Table:
        u = np.asarray(t["user_id"].combine_chunks().cast(pa.int64()))
        v = np.asarray(t["value"].combine_chunks().cast(pa.float64()))
        ts = np.asarray(t["ts"].combine_chunks().cast(pa.timestamp("us")).cast(pa.int64()))
        q = np.floor(v * _SCALE + 0.5).astype(np.int64)
        uu, inv = np.unique(u, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        sums = np.zeros(uu.size, dtype=np.int64)
        np.add.at(sums, inv, q)
        last = np.full(uu.size, np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(last, inv, ts)
        base = pa.table({
            "user_id": pa.array(uu, pa.int64()),
            "n": pa.array(n, pa.int64()),
            "sum_q": pa.array(sums, pa.int64()),
            "last_us": pa.array(last, pa.int64()),
            "etype": pa.array([None] * uu.size, pa.string()),
        })
        # distinct (user, type) pairs ride in the same table, marked by the
        # n = -1 sentinel (a batch can only return one schema)
        pairs = pa.table({
            "user_id": t["user_id"].combine_chunks().cast(pa.int64()),
            "event_type": t["event_type"].combine_chunks(),
        }).group_by(["user_id", "event_type"]).aggregate([])
        pair_tbl = pa.table({
            "user_id": pairs["user_id"],
            "n": pa.array(np.full(pairs.num_rows, -1, dtype=np.int64), pa.int64()),
            "sum_q": pa.array(np.zeros(pairs.num_rows, dtype=np.int64), pa.int64()),
            "last_us": pa.array(np.zeros(pairs.num_rows, dtype=np.int64), pa.int64()),
            "etype": pairs["event_type"],
        })
        return pa.concat_tables([base, pair_tbl])

    folded = pa.concat_tables(list(
        ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None)
    ))
    main = folded.filter(pc.field("n") >= 0)
    pairs = folded.filter(pc.field("n") < 0)
    agg = main.group_by("user_id").aggregate(
        [("n", "sum"), ("sum_q", "sum"), ("last_us", "max")]
    )
    tp = pairs.select(["user_id", "etype"]).group_by(
        ["user_id", "etype"]
    ).aggregate([]).group_by("user_id").aggregate([("etype", "count")])
    df = agg.to_pandas().merge(
        tp.to_pandas().rename(columns={"etype_count": "n_types"}),
        on="user_id", how="left",
    )
    return pa.table({
        "user_id": pa.array(df["user_id"].to_numpy(np.int64), pa.int64()),
        "n_events": pa.array(df["n_sum"].to_numpy(np.int64), pa.int64()),
        "sum_value": pa.array(
            df["sum_q_sum"].to_numpy(np.float64) / _SCALE, pa.float64()
        ),
        "last_ts_us": pa.array(df["last_us_max"].to_numpy(np.int64), pa.int64()),
        "n_types": pa.array(df["n_types"].to_numpy(np.int64), pa.int64()),
    })


def _bucket_of(user_ids: np.ndarray, n_buckets: int) -> np.ndarray:
    return (user_ids % n_buckets).astype(np.int64)


def transform_pivot(
    sf_dir: str,
    dest_dir: str,
    *,
    n_buckets: int = 16,
    checkpoint_frac: tuple[int, int] = (9, 10),
) -> pd.DataFrame:
    """Run the initial pivot up to the checkpoint watermark, then the
    continuous step over the post-checkpoint tail, and return the final
    dest (provably identical to a full pivot — that is the gate's oracle).
    """
    import ray
    import ray.data as rd

    src = os.path.join(sf_dir, "events.parquet")
    ds = rd.read_parquet(src, columns=["user_id", "ts", "event_type", "value"])

    # integer-us watermark at num/den of the observed span (deterministic);
    # bounds via per-block min/max partials, never a driver column read
    def ts_bounds(t: pa.Table) -> pa.Table:
        ts = t["ts"].combine_chunks().cast(pa.timestamp("us")).cast(pa.int64())
        mm = pc.min_max(ts)
        return pa.table({"lo": pa.array([mm["min"].as_py()], pa.int64()),
                         "hi": pa.array([mm["max"].as_py()], pa.int64())})

    bdf = pa.concat_tables(list(
        rd.read_parquet(src, columns=["ts"])
        .map_batches(ts_bounds, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)
    ))
    lo = pc.min(bdf["lo"]).as_py()
    hi = pc.max(bdf["hi"]).as_py()
    num, den = checkpoint_frac
    cut = lo + (hi - lo) * num // den

    def upto(t: pa.Table) -> pa.Table:
        ts = t["ts"].combine_chunks().cast(pa.timestamp("us")).cast(pa.int64())
        return t.filter(pc.less_equal(ts, pa.scalar(cut, pa.int64())))

    def after(t: pa.Table) -> pa.Table:
        ts = t["ts"].combine_chunks().cast(pa.timestamp("us")).cast(pa.int64())
        return t.filter(pc.greater(ts, pa.scalar(cut, pa.int64())))

    # ---- initial run: pivot history ≤ cut into bucket-partitioned dest
    initial = _pivot_partials(ds.map_batches(upto, batch_format="pyarrow"))
    os.makedirs(dest_dir, exist_ok=True)
    ids = np.asarray(initial["user_id"])
    buckets = _bucket_of(ids, n_buckets)
    for b in range(n_buckets):
        part = initial.filter(pa.array(buckets == b))
        pq.write_table(part, os.path.join(dest_dir, f"bucket-{b:03d}.parquet"))

    # ---- continuous step: changed keys → recompute those groups fully
    changed_batches = list(
        ds.map_batches(after, batch_format="pyarrow")
        .map_batches(
            lambda t: t.select(["user_id"]).group_by("user_id").aggregate([]),
            batch_format="pyarrow",
        )
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    changed = (
        np.unique(np.asarray(
            pa.concat_tables(changed_batches)["user_id"], dtype=np.int64
        ))
        if changed_batches
        else np.empty(0, np.int64)
    )

    if changed.size:
        import ray as _ray

        cref = _ray.put(changed)

        def only_changed(t: pa.Table) -> pa.Table:
            ch = _ray.get(cref)
            u = np.asarray(t["user_id"].combine_chunks().cast(pa.int64()))
            pos = np.searchsorted(ch, u)
            pos[pos == ch.size] = 0
            return t.filter(pa.array(ch[pos] == u))

        recomputed = _pivot_partials(
            ds.map_batches(only_changed, batch_format="pyarrow")
        )
        rids = np.asarray(recomputed["user_id"])
        rbuckets = _bucket_of(rids, n_buckets)
        for b in np.unique(_bucket_of(changed, n_buckets)):
            path = os.path.join(dest_dir, f"bucket-{int(b):03d}.parquet")
            old = pq.read_table(path) if os.path.exists(path) else None
            new_part = recomputed.filter(pa.array(rbuckets == int(b)))
            if old is not None and old.num_rows:
                keep_mask = ~np.isin(
                    np.asarray(old["user_id"], dtype=np.int64), changed
                )
                old = old.filter(pa.array(keep_mask))
                new_part = pa.concat_tables([old, new_part])
            pq.write_table(new_part, path)

    out = pq.read_table(dest_dir).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def transform_pivot_sql(table: str = "events") -> str:
    """Oracle: one full pivot — the continuous machinery must land on the
    exact same table."""
    return f"""
SELECT user_id,
       count(*) AS n_events,
       CAST(SUM(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
           / 1000000 AS sum_value,
       epoch_us(max(ts)) AS last_ts_us,
       count(DISTINCT event_type) AS n_types
FROM {table}
GROUP BY user_id
ORDER BY user_id
""".strip()
