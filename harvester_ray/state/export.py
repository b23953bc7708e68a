"""Resumable partitioned Parquet export.

The write-side contract every long pipeline here follows (index segments,
IVF layout, synth corpus) generalized into one utility: output lands as
one directory per key-hash partition, finalized by an atomic directory
rename plus a ``_DONE`` marker — a killed export re-runs only the missing
partitions, and a finished partition is never rewritten (its marker is the
skip condition). Never one giant file.

Scale shape: ONE streaming pass — rows are tagged with their partition and
written via ``write_parquet(partition_cols=...)`` into a staging area (the
executor parallelizes and spills as usual); finalization is a per-partition
directory rename, O(partitions) metadata work with no data movement. Rows
belonging to already-finished partitions are filtered out BEFORE the write,
so a resume's I/O is proportional to the missing work.
"""

from __future__ import annotations

import os
import shutil
import zlib

import pyarrow as pa


def _done(out_dir: str, p: int) -> str:
    return os.path.join(out_dir, f"p={p}", "_DONE")


def export_resumable(
    ds,
    out_dir: str,
    *,
    key_col: str = "doc_id",
    n_partitions: int = 8,
) -> dict:
    """Export ``ds`` as ``out_dir/p=<i>/`` (i = crc32(str(key)) %
    n_partitions — the repo-wide key hash, co-partitioning with
    state/table.py). Returns {written, skipped}. Re-running after a crash
    skips every partition whose ``_DONE`` marker exists."""
    pending = {
        p for p in range(n_partitions) if not os.path.exists(_done(out_dir, p))
    }
    skipped = n_partitions - len(pending)
    if not pending:
        return {"written": 0, "skipped": skipped}
    staging = os.path.join(out_dir, "_staging")
    shutil.rmtree(staging, ignore_errors=True)  # torn previous attempt

    pend = pending

    def tag(t: pa.Table) -> pa.Table:
        keys = t[key_col].combine_chunks().cast(pa.string()).to_pylist()
        part = [zlib.crc32(k.encode()) % n_partitions for k in keys]
        t = t.append_column("_part", pa.array(part, pa.int32()))
        # resume I/O ∝ missing work: finished partitions' rows drop here
        keep = pa.array([p in pend for p in part], pa.bool_())
        return t.filter(keep)

    (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .write_parquet(staging, partition_cols=["_part"])
    )
    written = 0
    for p in sorted(pending):
        src = os.path.join(staging, f"_part={p}")
        dst = os.path.join(out_dir, f"p={p}")
        shutil.rmtree(dst, ignore_errors=True)
        if os.path.isdir(src):
            os.replace(src, dst)
        else:  # no rows hashed here — still finalize (marker = completeness)
            os.makedirs(dst, exist_ok=True)
        with open(_done(out_dir, p), "w") as f:
            f.write("ok")
        written += 1
    shutil.rmtree(staging, ignore_errors=True)
    return {"written": written, "skipped": skipped}


def read_partition(out_dir: str, p: int):
    """One partition back as a Dataset (None if it holds no rows)."""
    import ray.data as rd

    pdir = os.path.join(out_dir, f"p={p}")
    files = sorted(
        os.path.join(pdir, f) for f in os.listdir(pdir) if f.endswith(".parquet")
    )
    if not files:
        return None
    ds = rd.read_parquet(files)
    # drop hive-inference artifacts (the p=<i> path segment) and the tag
    drop = [c for c in ("_part", "p") if c in ds.schema().names]
    return ds.drop_columns(drop) if drop else ds
