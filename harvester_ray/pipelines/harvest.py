"""`run_harvest` — the reference's end-to-end harvest lifecycle as ONE
composition over Ray Data.

Reference flow (harvester/core/management/commands/run_harvest.py:42-81 →
core/tasks/harvest/source.py → set.py → dataset_version promote): seed the
source (paged HTTP), extract per-record fields through the source's
OBJECTIVE, build/clean documents, validate (inactive filter), push to the
index, then promote behind the set-integrity guard. Here the same phases:

  PagedSource → OBJECTIVE extract (map_batches) → clean+validate
  (vectorized: null-id drop, text fill, active filter) → build_index /
  build_incremental (delta) → integrity-guarded promote.

Every phase is a streaming Dataset stage — seeds never collect on the
driver; the only driver-side values are the returned manifest and counts.
The per-stage invalidation/resume story lives one level down: the index
build checkpoints per segment (build.py), deltas guard via
incremental.py's set-integrity check (run_harvest(delta=True) refuses a
shrinking delta exactly like the reference's set.py:99-126), and
state/dag.py provides the generic task-protocol for custom per-partition
derivations.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..sources.objective import PagedSource, compile_objective


def run_harvest(
    fetch_page,
    n_pages: int,
    objective: dict,
    index_root: str,
    *,
    delta: bool = False,
    attr_cols: list[str] | None = None,
    concurrency: int | None = None,
    input_desc: str = "",
) -> dict:
    """Harvest a paged source into a promoted index version. The OBJECTIVE
    must yield at least ``doc_id`` and ``text``; a ``state`` field (if
    yielded) drives delta deletes. Returns the promoted manifest plus
    seed/validation counts in ``manifest['harvest']``."""
    from ..index import build, incremental

    src = PagedSource(fetch_page, n_pages)
    extract = compile_objective(objective)
    names = [k for k in objective if not k.startswith("@")]

    def ex(batch: pa.Table) -> pa.Table:
        rows = [extract(r) for r in batch.to_pylist()]
        cols = {}
        for name in names:
            vals = [r.get(name) for r in rows]
            if name == "doc_id":
                cols[name] = pa.array(vals, pa.int64())
            else:
                cols[name] = pa.array(vals)
        return pa.table(cols)

    def clean(batch: pa.Table) -> pa.Table:
        # validation (products/tasks/products.py:26-45 analog): a document
        # needs an identity; text normalizes to ''. In delta mode a record
        # without a state gets one derived from its content — empty text is
        # a delete seed (the reference's deletion-marker convention).
        keep = pc.is_valid(batch["doc_id"])
        batch = batch.filter(keep)
        text = pc.fill_null(batch["text"].combine_chunks().cast(pa.string()), "")
        batch = batch.set_column(
            batch.schema.get_field_index("text"), "text", text
        )
        if delta and "state" not in batch.column_names:
            state = pc.if_else(
                pc.equal(text, ""), pa.scalar("deleted"), pa.scalar("active")
            )
            batch = batch.append_column("state", state)
        return batch

    # ONE streaming pass — pages are fetched exactly once; counts come from
    # the build's own manifest, never a second source sweep
    ds = src.dataset(concurrency=concurrency).map_batches(
        ex, batch_format="pyarrow"
    ).map_batches(clean, batch_format="pyarrow", zero_copy_batch=True)
    if delta:
        man = incremental.build_incremental(
            index_root, ds, input_desc=input_desc or "harvest-delta"
        )
    else:
        man = build.build_index(
            ds, index_root, attr_cols=attr_cols,
            input_desc=input_desc or "harvest",
        )
    man["harvest"] = {"n_pages": n_pages, "n_docs": int(man.get("n_docs", 0))}
    return man
