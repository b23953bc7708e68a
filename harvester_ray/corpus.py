"""Corpus preparation: stable doc identity for transcript tables.

The reference's document identity is the SRN ``f"{set}:{external_id}"``
computed at build time and used for all upserts
(harvester/core/models/datatypes/document.py:58-60). For transcript tables
``(conv_id, turn_idx, role, text, tool, ts)`` the natural identity is
``(conv_id, turn_idx)`` and the north_rule requires a *stable global
ordering* by it; we assign a dense ``doc_id:int64`` as::

    doc_id = conv_base[conv_id] + turn_rank(turn_idx within conv)

where ``conv_base`` is the exclusive prefix sum of per-conversation turn
counts over conversations sorted by ``conv_id``. This is independent of Ray's
block/batch partitioning and of read order — any run over the same data
produces the same ids.

Scale note (10^12 turns, ~10^9+ conversations): the conv_base map below is
built driver-side from the (small) ``groupby(conv_id).count()`` result and
broadcast via ``ray.put`` — correct up to a few tens of millions of
conversations. Beyond that, the same scheme shards hierarchically: range-
partition conversations by ``conv_id``, compute per-range bases from range
counts (driver-side, tiny), then per-range local prefix sums inside
``map_groups`` — no step ever materializes more than one range.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def conv_counts_from_files(
    paths: list[str], conv_col: str = "conv_id"
) -> pd.DataFrame:
    """Per-conversation turn counts straight from Parquet fragments: one
    plain Ray task per file doing a single-column ``value_counts``. For the
    tiny counting pre-pass, raw tasks beat a Dataset pipeline — they skip
    the streaming-executor launch entirely (measured ~3s fixed cost per
    execution regardless of CPU count, which is the whole budget here).
    Returns (conv_col, n) sorted by conversation."""
    import ray
    import pyarrow.parquet as _pq

    @ray.remote(num_cpus=1)
    def one(path: str):
        vc = _pq.read_table(path, columns=[conv_col])[conv_col].value_counts()
        return pa.table(
            {conv_col: vc.field("values"), "n": vc.field("counts")}
        )

    parts = ray.get([one.remote(p) for p in paths])
    df = pa.concat_tables(parts).to_pandas()
    return df.groupby(conv_col, sort=True)["n"].sum().reset_index()


def assign_doc_ids(
    ds,
    *,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    counts_ds=None,
    counts: pd.DataFrame | None = None,
):
    """Add a stable dense ``doc_id`` column to a transcript Dataset.

    Assumes ``turn_idx`` is contiguous 0..len(conv)-1 within each conversation
    (the transcript-table contract, FIXTURES.md §1); doc ids are then
    ``conv_base + turn_idx`` with no per-row shuffle or sort of the data —
    only a small count aggregate leaves the corpus.

    ``counts_ds`` (optional) is a Dataset to compute the per-conversation
    counts from instead of ``ds`` — pass a ``read_parquet(path,
    columns=[conv_col])`` of the same files so the counting pre-pass reads
    ONE dictionary-encoded column instead of re-decoding the whole corpus
    (the text column is >20x the bytes; measured ~36s -> ~4s per 9.6M-turn
    pass at 2 CPUs). ``counts`` (optional) skips the pass entirely with a
    precomputed (conv, n) frame — see :func:`conv_counts_from_files`.
    """
    import ray

    if counts is None:
        # per-conversation counts via per-batch partials (one streaming
        # pass, no groupby shuffle — a conversation split across blocks
        # simply yields two partial rows the driver-side combine sums)
        def conv_counts(batch: pa.Table) -> pa.Table:
            agg = (
                batch.select([conv_col])
                .group_by(conv_col)
                .aggregate([([], "count_all")])
            )
            return agg.rename_columns([conv_col, "n"])

        partials = (
            (counts_ds if counts_ds is not None else ds)
            .map_batches(conv_counts, batch_format="pyarrow")
            .to_pandas()
        )
        counts = partials.groupby(conv_col, sort=True)["n"].sum().reset_index()
    bases = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts["n"].to_numpy()[:-1], out=bases[1:])
    # broadcast as fixed-width numpy arrays (near-zero deserialization per
    # task, unlike a Python dict which repays unpickling on every ray.get)
    conv_sorted = counts[conv_col].to_numpy(dtype=np.str_)
    base_ref = ray.put((conv_sorted, bases))
    cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}

    def add_ids(batch: pa.Table) -> pa.Table:
        if "b" not in cache:
            cache["b"] = ray.get(base_ref)
        conv_arr, base_arr = cache["b"]
        convs = np.asarray(batch[conv_col].to_pandas(), dtype=np.str_)
        idx = np.searchsorted(conv_arr, convs)
        turn = np.asarray(batch[turn_col].combine_chunks().cast(pa.int64()))
        doc_id = base_arr[idx] + turn
        return batch.append_column("doc_id", pa.array(doc_id, pa.int64()))

    return ds.map_batches(add_ids, batch_format="pyarrow", zero_copy_batch=True)


def doc_id_table(transcripts: pd.DataFrame) -> pd.DataFrame:
    """Driver-side oracle for doc-id assignment (pure pandas, used in tests):
    sort by (conv_id, turn_idx), enumerate."""
    out = transcripts.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(
        drop=True
    )
    out["doc_id"] = np.arange(len(out), dtype=np.int64)
    return out
