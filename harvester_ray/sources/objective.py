"""Declarative OBJECTIVE extractors — the source-plugin protocol.

The reference declares each upstream source as an ``OBJECTIVE`` dict whose
values are JSONPath strings (``"$.attributes.title"``) or Python callables,
with ``"@"`` selecting the record iterator (e.g.
harvester/products/sources/sharekit.py:165-200,
harvester/products/sources/edurep.py:200-246; discovery via
harvester/core/loading.py:42-50). Here the same contract compiles to ONE
``map_batches`` stage: paths are resolved against parsed JSON records,
callables receive the record dict; output is a typed Arrow table.

This is the §2.10 user-extension surface: a new source = a new OBJECTIVE
dict (+ optional record iterator), no engine changes.
"""

from __future__ import annotations

import json
from collections.abc import Callable

import pyarrow as pa


def reach(path: str, record: dict):
    """Minimal JSONPath-ish accessor: ``$.a.b.0.c`` (datagrowth ``reach``
    analog, used at harvester/core/models/datatypes/document.py:89-94)."""
    if not path.startswith("$"):
        raise ValueError(f"path must start with $: {path}")
    cur = record
    for part in path[1:].lstrip(".").split("."):
        if part == "":
            continue
        if isinstance(cur, list):
            try:
                cur = cur[int(part)]
            except (ValueError, IndexError):
                return None
        elif isinstance(cur, dict):
            cur = cur.get(part)
        else:
            return None
        if cur is None:
            return None
    return cur


def compile_objective(
    objective: dict[str, str | Callable], *, record_path: str | None = None
) -> Callable[[dict], dict]:
    """Compile an OBJECTIVE dict into a per-record extractor function.

    Keys starting with ``"@"`` are ignored here (reader config); values are
    JSONPath strings or callables ``record -> value``.
    """
    fields = {k: v for k, v in objective.items() if not k.startswith("@")}

    def extract(record: dict) -> dict:
        if record_path:
            record = reach(record_path, record) or {}
        out = {}
        for name, spec in fields.items():
            if callable(spec):
                out[name] = spec(record)
            else:
                out[name] = reach(spec, record)
        return out

    return extract


def extract_json_column(
    ds,
    json_col: str,
    objective: dict[str, str | Callable],
    *,
    keep_cols: list[str] | None = None,
    schema: pa.Schema | None = None,
):
    """Apply an OBJECTIVE to a column of JSON strings (e.g. ``events.props``)
    via one map_batches stage; pass-through columns are preserved."""
    extract = compile_objective(objective)
    keep = keep_cols or []

    def run(batch: pa.Table) -> pa.Table:
        records = [json.loads(s) if s else {} for s in batch[json_col].to_pylist()]
        extracted = [extract(r) for r in records]
        cols = {}
        for c in keep:
            cols[c] = batch[c]
        names = list(objective)
        for name in names:
            if name.startswith("@"):
                continue
            values = [e.get(name) for e in extracted]
            typ = schema.field(name).type if schema is not None and name in schema.names else None
            cols[name] = pa.array(values, typ) if typ else pa.array(values)
        return pa.table(cols)

    return ds.map_batches(run, batch_format="pyarrow", zero_copy_batch=True)


def merge_phase(
    ds,
    extra_ds,
    *,
    merge_on: str,
    update_cols: list[str] | None = None,
):
    """Seeding ``merge`` strategy (reference resource.py:86-95): records from
    an extra endpoint, keyed on ``merge_on``, are folded INTO the current
    seed batch — an extra record's non-null values overwrite the seed's
    (``content.update(buffer[key])`` parity; seeds without a match pass
    through unchanged). The extra side is broadcast once as sorted numpy
    key + column arrays (merge endpoints are per-set detail feeds, small by
    construction); the seed stream never shuffles."""
    import numpy as np
    import ray

    extra = extra_ds.to_pandas() if hasattr(extra_ds, "to_pandas") else extra_ds
    cols = update_cols or [c for c in extra.columns if c != merge_on]
    keys = extra[merge_on].to_numpy()
    order = np.argsort(keys, kind="stable")
    ref = ray.put((keys[order], {c: extra[c].to_numpy()[order] for c in cols}))

    def enrich(batch: pa.Table) -> pa.Table:
        keys_s, colmap = ray.get(ref)
        bk = batch[merge_on].to_pandas().to_numpy()
        idx = np.searchsorted(keys_s, bk)
        idx_c = np.clip(idx, 0, max(keys_s.size - 1, 0))
        found = (keys_s[idx_c] == bk) if keys_s.size else np.zeros(bk.size, bool)
        out = {}
        for name in batch.column_names:
            if name in colmap:
                vals = batch[name].to_pandas().to_numpy(copy=True)
                extra_vals = colmap[name][idx_c]
                use = found & ~_isnull(extra_vals)
                vals[use] = extra_vals[use]
                out[name] = pa.array(vals)
            else:
                out[name] = batch[name]
        for name, arr in colmap.items():  # extra-only columns appended
            if name not in batch.column_names:
                out[name] = pa.array(arr[idx_c], mask=~found, from_pandas=True)
        return pa.table(out)

    return ds.map_batches(enrich, batch_format="pyarrow", zero_copy_batch=True)


def _isnull(a):
    import numpy as np
    import pandas as pd

    return pd.isna(a) if a.dtype == object else (np.isnan(a) if a.dtype.kind == "f" else np.zeros(a.size, bool))


def back_fill_phase(ds, callback, *, schema: pa.Schema | None = None, concurrency: int | None = None):
    """Seeding ``back_fill`` strategy (reference resource.py:168-177): each
    seed expands through a callback into zero or more records that REPLACE
    it (list-endpoint → per-item detail expansion). One flat_map-style
    map_batches; in production the callback wraps an HTTP client inside the
    actor pool that ``concurrency`` sizes."""

    def expand(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for r in batch.to_pylist():
            rows.extend(callback(r) or [])
        if not rows:
            return schema.empty_table() if schema is not None else pa.table({})
        return pa.Table.from_pylist(rows, schema=schema)

    return ds.map_batches(expand, batch_format="pyarrow", concurrency=concurrency)


class PagedSource:
    """Paged-reader analog of ``HttpSeedingProcessor`` (harvester/core/
    processors/seed/resource.py:144-205): a deterministic page fetcher
    (page_no → list of records) expanded through ``flat_map``-style
    map_batches over the page-number range. In production the fetcher wraps
    an HTTP client inside an actor pool; here any callable works and the
    page *cursor* table is tiny, so read parallelism = page count."""

    def __init__(self, fetch_page: Callable[[int], list[dict]], n_pages: int):
        self.fetch_page = fetch_page
        self.n_pages = n_pages

    def dataset(self, *, concurrency: int | None = None):
        import ray.data as rd

        fetch = self.fetch_page

        def expand(batch: pa.Table) -> pa.Table:
            rows: list[dict] = []
            for p in batch["id"].to_pylist():
                rows.extend(fetch(int(p)))
            return pa.Table.from_pylist(rows) if rows else pa.table({})

        return rd.range(self.n_pages).map_batches(
            expand, batch_size=1, batch_format="pyarrow", concurrency=concurrency
        )
