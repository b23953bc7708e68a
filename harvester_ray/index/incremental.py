"""Incremental index builds: delta upserts + tombstones, exact global stats.

The reference's incremental machinery re-expressed: a delta harvest carries
documents forward and soft-deletes/resurrects by identity
(harvester/core/models/harvest.py:56-84), hash-diff change detection bumps
``modified_at`` (harvester/core/models/datatypes/document.py:131-139), and
the 30-second incremental sync pushes only docs modified since ``pushed_at``
with ``_op_type: delete`` tombstones (harvester/search/tasks/index.py:22-51).

Here an incremental build creates a NEW immutable version that:

- **carries forward** every previous segment untouched (manifest pointers —
  the DatasetVersion copy-forward analog; no data is rewritten),
- **builds new segments** from the delta's active rows only,
- **tombstones** every delta doc id (deleted AND modified: a modified doc's
  old posting occurrences must stop matching) as ``(doc_id, version)``
  pairs; query-time filtering drops a doc from segments created before its
  tombstone version, so re-added docs in newer segments still match,
- keeps global BM25 stats **exact** (not Lucene-style stale): for each
  carried segment that contains newly tombstoned live docs, the builder
  decodes it once and emits NEGATIVE (term, -df, -cf) correction partials;
  the per-bucket term-stats combine then sums old stats + new-segment
  partials + corrections. This is what makes "incremental + delta ≡ full
  rebuild of the merged corpus" hold rank-identically (tested).

Cost model at scale: new-segment build ∝ delta size; corrections ∝ postings
of affected carried segments only; term-stats combine ∝ vocabulary. Nothing
touches unaffected segments.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from . import manifest as mf
from .build import META_TERM, NUM_TERM_BUCKETS, PARTIAL_SCHEMA, SegmentBuilder, term_buckets
from .query import SegmentReader


def _correction_partials(
    seg_path: str, tomb_ids: np.ndarray, num_buckets: int, seg_name: str
) -> tuple[pa.Table, int, int]:
    """Decode one carried segment and emit negative (term, df, cf) partials
    for the postings that belong to ``tomb_ids``. Returns (partials,
    n_docs_removed, dl_removed)."""
    seg = SegmentReader(seg_path)
    present = np.intersect1d(seg.doc_ids, tomb_ids)
    if present.size == 0:
        return PARTIAL_SCHEMA.empty_table(), 0, 0
    terms = pq.read_table(seg_path + ".terms.parquet", columns=["term"])["term"]
    out_terms, out_df, out_cf = [], [], []
    for i, t in enumerate(terms.to_pylist()):
        d, f = seg.postings(t)
        idx = np.searchsorted(d, present)
        idx_c = np.clip(idx, 0, d.size - 1)
        hit = d[idx_c] == present
        n_hit = int(hit.sum())
        if n_hit:
            out_terms.append(t)
            out_df.append(-n_hit)
            out_cf.append(-int(f[idx_c][hit].sum()))
    dl_removed = int(seg.doc_lengths(present).sum())
    buckets = term_buckets(pa.array(out_terms, pa.string()), num_buckets) if out_terms else np.zeros(0, np.int32)
    tbl = pa.table(
        {
            "term": pa.array(out_terms, pa.string()),
            "df": pa.array(out_df, pa.int64()),
            "cf": pa.array(out_cf, pa.int64()),
            "seg": pa.array([None] * len(out_terms), pa.string()),
            "bucket": pa.array(buckets, pa.int32()),
        },
        schema=PARTIAL_SCHEMA,
    )
    return tbl, int(present.size), dl_removed


def build_incremental(
    index_root: str,
    delta_ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    state_col: str = "state",
    batch_size: int | None = None,
    concurrency: int | None = None,
    promote: bool = True,
    keep_versions: int = 3,
    input_desc: str = "",
) -> dict:
    """Build version N+1 from the CURRENT version plus a delta Dataset with
    columns (id, text, state∈{active,deleted}). Returns the new manifest."""
    import ray
    import ray.data as rd

    t0 = time.time()
    prev = mf.read_manifest(index_root)
    prev_version = prev["_version"]
    version = mf.next_version(index_root)
    num_buckets = int(prev.get("num_buckets") or NUM_TERM_BUCKETS)
    vdir = mf.version_dir(index_root, version)
    seg_dir = os.path.join(vdir, "segments")
    staging_dir = os.path.join(vdir, "staging", "partials")
    termstats_dir = os.path.join(vdir, "termstats")
    for d in (seg_dir, staging_dir):
        os.makedirs(d, exist_ok=True)

    if concurrency is None:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        concurrency = max(2, ncpu - 2)

    # ---- split delta: all ids tombstone the past; actives become segments
    delta_ids_tbl = delta_ds.select_columns([id_col, state_col]).to_pandas()
    new_tomb_ids = np.sort(delta_ids_tbl[id_col].to_numpy(dtype=np.int64))
    active = delta_ds.map_batches(
        lambda t: t.filter(pc.equal(t[state_col], "active")),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    # ---- phase 1: new segments from delta actives --------------------------
    meta_dir = os.path.join(vdir, "staging", "meta")
    shutil.rmtree(meta_dir, ignore_errors=True)
    metas = active.select_columns([id_col, text_col]).map_batches(
        SegmentBuilder,
        fn_constructor_kwargs={
            "seg_dir": seg_dir,
            "id_col": id_col,
            "text_col": text_col,
            "num_buckets": num_buckets,
            "staging_dir": staging_dir,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )
    metas.write_parquet(meta_dir)
    from .build import read_segment_metas

    meta_tbl = read_segment_metas(meta_dir)
    live_segs = set(meta_tbl["seg"].to_pylist())

    # ---- corrections for carried segments ---------------------------------
    prev_tombs = prev.get("tombstones", [])
    prev_tomb_latest: dict[int, int] = {}
    for d, v in prev_tombs:
        prev_tomb_latest[d] = max(v, prev_tomb_latest.get(d, 0))

    corrections: list[pa.Table] = []
    n_removed = 0
    dl_removed = 0
    carried = []
    for seg_meta in prev["segments"]:
        cv = seg_meta.get("created_version", prev_version)
        # only subtract docs still LIVE in this segment (not already
        # tombstoned for its creation version)
        live_new = np.array(
            [d for d in new_tomb_ids if prev_tomb_latest.get(int(d), 0) <= cv],
            dtype=np.int64,
        )
        seg_path = os.path.join(index_root, seg_meta["path"])
        tbl, nr, dlr = _correction_partials(seg_path, live_new, num_buckets, seg_meta["name"])
        if tbl.num_rows:
            corrections.append(tbl)
        n_removed += nr
        dl_removed += dlr
        carried.append(dict(seg_meta))

    # ---- term stats: old per-bucket stats + new partials + corrections ----
    shutil.rmtree(termstats_dir, ignore_errors=True)
    os.makedirs(termstats_dir, exist_ok=True)
    old_ts_dir = os.path.join(index_root, prev["termstats"])
    corr_all = (
        pa.concat_tables(corrections) if corrections else PARTIAL_SCHEMA.empty_table()
    )
    # new-segment partials: one (term, df, cf, bucket) file per segment
    partial_files = sorted(
        os.path.join(staging_dir, f)
        for f in os.listdir(staging_dir)
        if f.endswith(".parquet") and f[: -len(".parquet")] in live_segs
    )
    delta_parts = [corr_all.select(["bucket", "term", "df", "cf"])]
    if partial_files:
        delta_parts.append(
            pads.dataset(partial_files).to_table(columns=["bucket", "term", "df", "cf"])
        )
    delta_tbl = pa.concat_tables(delta_parts)
    delta_agg = (
        delta_tbl.group_by(["bucket", "term"])
        .aggregate([("df", "sum"), ("cf", "sum")])
        .rename_columns(["bucket", "term", "df", "cf"])
    )
    delta_ref = ray.put(delta_agg)

    def combine_bucket(batch: pa.Table) -> pa.Table:
        delta = ray.get(delta_ref)
        done = []
        for b in batch["id"].to_pylist():
            parts = []
            old_path = os.path.join(old_ts_dir, f"bucket-{b:05d}.parquet")
            if os.path.exists(old_path):
                parts.append(pq.read_table(old_path, columns=["term", "df", "cf"]))
            dsel = delta.filter(pc.equal(delta["bucket"], b)).select(["term", "df", "cf"])
            if dsel.num_rows:
                parts.append(dsel)
            if not parts:
                continue
            tbl = pa.concat_tables(parts)
            agg = (
                tbl.group_by("term")
                .aggregate([("df", "sum"), ("cf", "sum")])
                .rename_columns(["term", "df", "cf"])
            )
            agg = agg.filter(pc.greater(agg["df"], 0))
            agg = agg.take(pc.sort_indices(agg["term"]))
            out = os.path.join(termstats_dir, f"bucket-{b:05d}.parquet")
            pq.write_table(agg, out + ".tmp")
            os.replace(out + ".tmp", out)
            done.append(b)
        return pa.table({"bucket": pa.array(done, pa.int64())})

    rd.range(num_buckets).map_batches(
        combine_bucket, batch_size=1, batch_format="pyarrow"
    ).materialize()

    # ---- manifest ----------------------------------------------------------
    new_segs = [
        {
            "name": s,
            "path": f"v{version}/segments/{s}",
            "n_docs": int(nd),
            "dl_sum": int(dls),
            "created_version": version,
        }
        for s, nd, dls in zip(
            meta_tbl["seg"].to_pylist(), meta_tbl["df"].to_pylist(), meta_tbl["cf"].to_pylist()
        )
    ]

    n_added = sum(s["n_docs"] for s in new_segs)
    dl_added = sum(s["dl_sum"] for s in new_segs)
    n_docs = int(prev["n_docs"]) - n_removed + n_added
    dl_sum = int(prev["dl_sum"]) - dl_removed + dl_added
    tombstones = list(prev_tombs) + [[int(d), version] for d in new_tomb_ids]

    man = {
        "version": version,
        "analyzer": prev["analyzer"],
        "k1": prev["k1"],
        "b": prev["b"],
        "n_docs": n_docs,
        "dl_sum": dl_sum,
        "avgdl": (dl_sum / n_docs) if n_docs else 0.0,
        "num_buckets": num_buckets,
        "segments": carried + new_segs,
        "termstats": f"v{version}/termstats",
        "tombstones": tombstones,
        "lineage": {
            "input": input_desc,
            "parent_version": prev_version,
            "delta_ids": int(new_tomb_ids.size),
            "delta_active_docs": n_added,
            "removed_docs": n_removed,
        },
        "metrics": {
            "build_sec": round(time.time() - t0, 3),
            "n_new_segments": len(new_segs),
            "n_carried_segments": len(carried),
        },
    }
    mf.write_manifest(index_root, version, man)
    if promote:
        mf.promote(index_root, version)
        mf.purge_stale_versions(index_root, keep=keep_versions)
    return man
