"""Metadata-vocabulary tree operations: ancestor closure + root normalize.

The reference stores controlled vocabularies as MPTT trees and, per
document, expands its vocab values to ALL ancestors (include self, sorted —
lookup_study_vocabulary_parents, products/tasks/learning_materials.py:10-45)
or normalizes each value to its tree ROOT (normalize_field_values,
metadata/utils/operations.py). Here the tree is a small table
(value, parent); its transitive closure is computed ONCE driver-side
(vocabularies are thousands of nodes) and broadcast via ``ray.put`` as
plain arrays — documents stream through one map_batches, no shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def build_closure(vocab: pd.DataFrame, *, value_col: str = "value", parent_col: str = "parent"):
    """(ancestors, roots): ancestors maps value → sorted tuple of ancestors
    including self; roots maps value → the tree root (the value itself when
    parentless). Cycle-safe (raises)."""
    parent = dict(zip(vocab[value_col], vocab[parent_col]))
    ancestors: dict[str, tuple[str, ...]] = {}
    roots: dict[str, str] = {}
    for v in parent:
        chain = []
        cur: str | None = v
        seen = set()
        while cur is not None and cur in parent:
            if cur in seen:
                raise ValueError(f"vocabulary cycle through {cur!r}")
            seen.add(cur)
            chain.append(cur)
            cur = parent[cur]
        if cur is not None:  # dangling parent reference counts as the root
            chain.append(cur)
        ancestors[v] = tuple(sorted(chain))
        roots[v] = chain[-1]
    return ancestors, roots


def expand_ancestors(
    ds,
    vocab: pd.DataFrame,
    *,
    col: str,
    out_col: str = "ancestors",
    value_col: str = "value",
    parent_col: str = "parent",
):
    """Per row: the sorted distinct union of ancestors (include self) of the
    row's vocab value(s). ``col`` may hold a single string or a list of
    strings; unknown values pass through as themselves (reference
    DoesNotExist fallback). Output is a list<string> column."""
    import ray

    anc, _ = build_closure(vocab, value_col=value_col, parent_col=parent_col)
    ref = ray.put(anc)

    def expand(t: pa.Table) -> pa.Table:
        lookup = ray.get(ref)
        values = t[col].to_pylist()
        out = []
        for v in values:
            items = v if isinstance(v, list) else ([] if v is None else [v])
            s: set[str] = set()
            for item in items:
                s.update(lookup.get(item, (item,)))
            out.append(sorted(s))
        return t.append_column(out_col, pa.array(out, pa.list_(pa.string())))

    return ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)


def normalize_to_roots(
    ds,
    vocab: pd.DataFrame,
    *,
    col: str,
    out_col: str = "root",
    value_col: str = "value",
    parent_col: str = "parent",
):
    """Per row: each vocab value replaced by its tree root (disciplines
    normalize analog). Scalar column → scalar root; unknown values map to
    themselves."""
    import ray

    _, roots = build_closure(vocab, value_col=value_col, parent_col=parent_col)
    ref = ray.put(roots)

    def norm(t: pa.Table) -> pa.Table:
        lookup = ray.get(ref)
        out = [None if v is None else lookup.get(v, v) for v in t[col].to_pylist()]
        return t.append_column(out_col, pa.array(out, pa.string()))

    return ds.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)
