"""ES ``_reindex`` analog: stream one index's live documents into a fresh
index, with optional filter and per-batch transform — no access to the raw
corpus required.

The source index must have been built with ``store_source=True`` (the
ES-_source analog: raw text kept as a stored-on-disk ``_source`` column in
the segment doc tables, never loaded into serving memory). Reindex then is
one streaming pass: ``readback.read_documents`` (tombstone-aware, pruned
columns) → filter/transform ``map_batches`` → ``build_index`` at the
destination root. Used for blue/green schema changes (re-analyze with new
attrs/positions) exactly like the reference's index rebuild + alias flip
(`/root/reference/search/utils/indices.py` promote flow).

Scale shape: the doc tables are ordinary partitioned Parquet, so the read
parallelizes per segment file; nothing materializes on the driver."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import build as ib
from . import manifest as mf
from . import readback


def reindex(
    src_root: str,
    dest_root: str,
    *,
    version: int | None = None,
    filters: dict[str, list] | None = None,
    transform=None,
    **build_kwargs,
) -> dict:
    """Rebuild ``src_root``'s live docs (of ``version``, default CURRENT)
    into a fresh index at ``dest_root``.

    ``filters``: attr-value membership (OR within a field's list, AND
    across fields — the facet-filter semantics). ``transform``: optional
    ``pa.Table -> pa.Table`` applied after filtering (must keep doc_id and
    text columns). ``build_kwargs`` forward to build_index (attr_cols
    default to the source manifest's; store_source/store_positions default
    to the source's layout)."""
    man = mf.read_manifest(src_root, version)
    if not man.get("store_source", False):
        raise ValueError(
            "reindex needs the source index built with store_source=True "
            "(the _source column is the only copy of the text)"
        )
    attr_cols = list(man.get("attr_cols") or [])
    build_kwargs.setdefault("attr_cols", attr_cols)
    build_kwargs.setdefault("store_source", True)
    build_kwargs.setdefault("store_positions", bool(man.get("positions", False)))
    build_kwargs.setdefault(
        "input_desc", f"reindex:{src_root}@v{man.get('_version', '?')}"
    )

    ds = readback.read_documents(
        src_root, version=version,
        columns=["doc_id", "_source"] + attr_cols,
    )

    def prep(t: pa.Table) -> pa.Table:
        if filters:
            mask = np.ones(t.num_rows, dtype=bool)
            for field, values in filters.items():
                vals = np.asarray(t[field].combine_chunks()).astype(str)
                mask &= np.isin(vals, np.asarray(values, dtype=str))
            t = t.filter(pa.array(mask))
        drop = [c for c in ("created_version", "dl") if c in t.column_names]
        t = t.drop_columns(drop)
        idx = t.column_names.index("_source")
        t = t.set_column(idx, "text", t["_source"])
        if transform is not None:
            t = transform(t)
        return t

    ds = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return ib.build_index(ds, dest_root, **build_kwargs)
