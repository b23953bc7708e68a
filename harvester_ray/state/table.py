"""Copy-on-write partitioned table store: hash-partitioned Parquet with
partition-pruned MERGE (upsert/delete).

The reference persists harvested documents in Postgres and upserts deltas
under row locks (core/processors/pipeline/resource.py:119-135,
search/tasks/index.py:23-25); the lakehouse re-expression is a
hash-partitioned Parquet table where a delta rewrites ONLY the partitions
its keys hash into — the Delta/Iceberg MERGE pattern without a table
format dependency:

- layout: ``root/p=<i>/part.parquet`` for i in 0..P−1, partition =
  ``crc32(str(key)) % P`` — the SAME key hashing everywhere else in this
  repo, so a table partitioned here co-partitions with the engine's
  bucketed ops.
- MERGE: group the delta by partition (one tiny pass over the delta),
  then rewrite only touched partitions: read old part, drop keys present
  in the delta, append upserts (state!='deleted'), sort by key, write
  temp + atomic rename. Untouched partitions are not read, not written,
  not even opened — byte-identical files (asserted in tests by mtime).
- Each partition rewrite is independent → they run as parallel Ray tasks;
  the driver only computes the touched-partition list. At 100 TB the
  delta-to-partition fan-out is the only coordination.

Versioning/locking: single-writer per table root (the repo's standing
model — one driver owns a build); readers see either the old or the new
file thanks to the atomic rename, never a torn partition.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _part_of(keys: np.ndarray, n_partitions: int) -> np.ndarray:
    return np.fromiter(
        (zlib.crc32(str(k).encode()) % n_partitions for k in keys),
        dtype=np.int64, count=len(keys),
    )


def _part_path(root: str, p: int) -> str:
    return os.path.join(root, f"p={p}", "part.parquet")


def write_partitioned(
    df: pd.DataFrame, root: str, *, key_col: str = "doc_id",
    n_partitions: int = 8,
) -> None:
    """Initial load: hash-partition ``df`` by ``key_col`` into P files,
    each sorted by key. Empty partitions still get a (zero-row) file so
    merge never special-cases absence."""
    part = _part_of(df[key_col].to_numpy(), n_partitions)
    schema = pa.Schema.from_pandas(df, preserve_index=False)
    for p in range(n_partitions):
        sub = df[part == p].sort_values(key_col, kind="mergesort")
        os.makedirs(os.path.join(root, f"p={p}"), exist_ok=True)
        tmp = _part_path(root, p) + ".tmp"
        pq.write_table(
            pa.Table.from_pandas(sub, schema=schema, preserve_index=False), tmp
        )
        os.replace(tmp, _part_path(root, p))
    with open(os.path.join(root, "_META"), "w") as f:
        f.write(f"{key_col}\n{n_partitions}\n")


def _meta(root: str) -> tuple[str, int]:
    with open(os.path.join(root, "_META")) as f:
        key_col, n = f.read().splitlines()[:2]
    return key_col, int(n)


def merge(
    root: str, delta: pd.DataFrame, *, state_col: str = "state"
) -> dict:
    """MERGE a delta into the table: rows with ``state != 'deleted'``
    upsert (replace-by-key or insert), rows with ``state == 'deleted'``
    delete. Only partitions containing delta keys are rewritten; returns
    {"touched": [...], "skipped": n}. Rewrites fan out as Ray tasks when
    Ray is initialised (one per touched partition), else run inline."""
    key_col, n_partitions = _meta(root)
    dpart = _part_of(delta[key_col].to_numpy(), n_partitions)
    touched = sorted(set(dpart.tolist()))
    data_cols = [c for c in delta.columns if c != state_col]

    def rewrite(p: int, sub: pd.DataFrame) -> None:
        old = pq.read_table(_part_path(root, p)).to_pandas()
        keep = old[~old[key_col].isin(sub[key_col])]
        ups = sub[sub[state_col] != "deleted"][data_cols]
        out = (
            pd.concat([keep, ups], ignore_index=True)
            .sort_values(key_col, kind="mergesort")
            .reset_index(drop=True)
        )
        schema = pq.read_schema(_part_path(root, p))
        tmp = _part_path(root, p) + ".tmp"
        pq.write_table(
            pa.Table.from_pandas(out, schema=schema, preserve_index=False), tmp
        )
        os.replace(tmp, _part_path(root, p))

    try:
        import ray

        have_ray = ray.is_initialized()
    except ImportError:  # pragma: no cover
        have_ray = False
    if have_ray:
        import ray

        task = ray.remote(rewrite)
        ray.get([
            task.remote(p, delta[dpart == p]) for p in touched
        ])
    else:
        for p in touched:
            rewrite(p, delta[dpart == p])
    return {"touched": touched, "skipped": n_partitions - len(touched)}


def read_table(root: str) -> pd.DataFrame:
    """Full table scan (tests/small tables); at scale read the partition
    files as a ``ray.data.read_parquet`` over ``root/p=*/part.parquet``."""
    key_col, n_partitions = _meta(root)
    parts = [
        pq.read_table(_part_path(root, p)).to_pandas()
        for p in range(n_partitions)
    ]
    return (
        pd.concat(parts, ignore_index=True)
        .sort_values(key_col, kind="mergesort")
        .reset_index(drop=True)
    )
