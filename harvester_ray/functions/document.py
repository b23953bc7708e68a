"""Document assembly: dotted-key nesting, metadata stamping, search-action
projection.

Reference semantics re-expressed Ray-Data-first:

- ``parse_seed_data`` (harvester/core/models/datatypes/document.py:68-79):
  dotted seed keys (``"meta.title"``) restructure into nested dicts. Here
  the vectorized analog: flat Arrow columns with dotted names group into
  ``StructArray`` columns (recursively), zero-copy over the child arrays.
- ``set_metadata`` (document.py:99-139 + products/models/datatypes/
  product.py:266-271): provider coalesce (name -> slug -> ror ->
  external_id), content-hash diff driving ``modified_at``, analyzer
  language stamp.
- ``to_data`` / ``to_search`` (document.py:182-205, product.py:221-264):
  final projection into index actions — ``_id`` synthesis, per-language
  routing, ``delete`` ops for tombstoned docs.

All three are per-batch column transforms (no shuffle, no state); they run
as ``map_batches`` stages at any scale.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import analyzer


# ---------------------------------------------------------------------------
# dotted-key -> nested struct (parse_seed_data)


def nest_dotted(table: pa.Table, *, sep: str = ".") -> pa.Table:
    """Group flat dotted column names into (recursive) struct columns.

    ``{"a.b": x, "a.c": y, "d": z}`` -> columns ``a: struct<b, c>``, ``d``.
    Child arrays are reused as struct children (no value copies). Column
    order: first appearance of each top-level prefix.
    """
    groups: dict[str, list[tuple[str, pa.ChunkedArray]]] = {}
    order: list[str] = []
    for name in table.column_names:
        head, _, rest = name.partition(sep)
        groups.setdefault(head, []).append((rest, table[name]))
        if head not in order:
            order.append(head)
    cols: dict[str, pa.Array | pa.ChunkedArray] = {}
    for head in order:
        members = groups[head]
        if len(members) == 1 and members[0][0] == "":
            cols[head] = members[0][1]
            continue
        sub = pa.table({rest: arr for rest, arr in members})
        if any(sep in rest for rest, _ in members):
            sub = nest_dotted(sub, sep=sep)
        cols[head] = pa.StructArray.from_arrays(
            [sub[c].combine_chunks() for c in sub.column_names], sub.column_names
        )
    return pa.table(cols)


def flatten_struct(table: pa.Table, *, sep: str = ".") -> pa.Table:
    """Inverse of :func:`nest_dotted`: struct columns flatten back to dotted
    column names (recursively)."""
    cols: dict[str, pa.ChunkedArray | pa.Array] = {}
    for name in table.column_names:
        col = table[name]
        if pa.types.is_struct(col.type):
            flat = col.combine_chunks().flatten()
            sub = flatten_struct(
                pa.table({f.name: a for f, a in zip(col.type, flat, strict=True)}),
                sep=sep,
            )
            for sub_name in sub.column_names:
                cols[f"{name}{sep}{sub_name}"] = sub[sub_name]
        else:
            cols[name] = col
    return pa.table(cols)


def parse_seed_data(ds, *, sep: str = "."):
    """Dataset stage: dotted flat columns -> nested struct columns."""
    return ds.map_batches(
        lambda t: nest_dotted(t, sep=sep), batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# set_metadata


def md5_column(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """md5 hex digest per value (DuckDB ``md5()`` parity; nulls propagate).

    Per-row hashlib is inherent (no vectorized md5 in Arrow); bounded by
    batch size like the fingerprint op (ops/text_analysis.py)."""
    out = [
        None if v is None else hashlib.md5(v.encode("utf-8")).hexdigest()
        for v in (arr.to_pylist() if hasattr(arr, "to_pylist") else arr)
    ]
    return pa.array(out, pa.string())


def set_metadata(
    batch: pa.Table,
    *,
    provider_cols: list[str],
    content_col: str,
    prev_hash_col: str | None = None,
    language_col: str | None = None,
    current_version: int = 1,
    parent_version: int = 0,
) -> pa.Table:
    """Stamp reference-style metadata columns onto a batch.

    Adds: ``provider`` (first non-null of ``provider_cols``), ``content_hash``
    (md5 of ``content_col``), ``modified_at_version`` (``current_version``
    where the hash differs from ``prev_hash_col``, else ``parent_version`` —
    the hash-equality short-circuit of document.py:131-139), and ``language``
    (analyzer clamp of ``language_col``).
    """
    out = batch
    out = out.append_column("provider", pc.coalesce(*[batch[c] for c in provider_cols]))
    h = md5_column(batch[content_col])
    out = out.append_column("content_hash", h)
    if prev_hash_col is not None:
        changed = pc.fill_null(pc.not_equal(h, batch[prev_hash_col]), True)
        out = out.append_column(
            "modified_at_version",
            pc.if_else(
                changed,
                pa.scalar(current_version, pa.int64()),
                pa.scalar(parent_version, pa.int64()),
            ),
        )
    if language_col is not None:
        out = out.append_column("language", analyzer.clamp_language(batch[language_col]))
    return out


# ---------------------------------------------------------------------------
# to_search


def to_search(
    batch: pa.Table,
    *,
    id_cols: list[str],
    language_col: str | None = None,
    keep_cols: list[str] | None = None,
    deleted_mask: np.ndarray | pa.Array | None = None,
) -> pa.Table:
    """Project a doc batch into bulk index actions (document.py:182-205).

    ``_id`` = ``id_cols`` joined with ``:``; ``op`` = ``"index"`` for live
    rows, ``"delete"`` for rows in ``deleted_mask`` (delete actions keep only
    ``_id``/``op``, their payload columns are nulled); ``language`` routes to
    the per-language index ("unk" bucket for everything non-analyzed).
    """
    parts = [pc.cast(batch[c], pa.string()) for c in id_cols]
    _id = parts[0] if len(parts) == 1 else pc.binary_join_element_wise(*parts, ":")
    n = batch.num_rows
    if deleted_mask is None:
        dead = pa.array(np.zeros(n, bool))
    else:
        dead = deleted_mask if isinstance(deleted_mask, (pa.Array, pa.ChunkedArray)) else pa.array(
            np.asarray(deleted_mask, bool)
        )
    cols: dict[str, pa.Array | pa.ChunkedArray] = {
        "_id": _id,
        "op": pc.if_else(dead, pa.scalar("delete"), pa.scalar("index")),
    }
    if language_col is not None:
        cols["language"] = analyzer.clamp_language(batch[language_col])
    for c in keep_cols or []:
        cols[c] = pc.if_else(dead, pa.scalar(None, batch[c].type), batch[c])
    return pa.table(cols)
