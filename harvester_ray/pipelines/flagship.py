"""Flagship pipeline: transcript Parquet → versioned BM25 index → top-k.

The Ray-Data re-expression of the reference's ``run_harvest`` →
``index_dataset_versions`` lifecycle (harvester/harvester/management/commands/
run_harvest.py:42-81, harvester/search/tasks/index.py:82-114): read →
normalize/tokenize (map_batches actor pool) → stable doc ids → segment build
→ term-stats aggregate → manifest + atomic promote; then the search path
(harvester/search/views/document.py:122-143) as BM25 top-k over the
promoted version.
"""

from __future__ import annotations

import ray.data as rd

from .. import corpus
from ..index import build, query


def build_transcript_index(
    transcripts_path: str,
    index_root: str,
    *,
    batch_size: int | None = None,
    concurrency: int | None = None,
    resume: bool = True,
    override_num_blocks: int | None = None,
    attr_cols: list[str] | None = None,
    store_positions: bool = False,
) -> dict:
    """Build (and promote) a new index version from a transcript Parquet dir.
    ``attr_cols`` (e.g. ["role", "tool"]) enables filtered search;
    ``store_positions`` enables phrase/proximity queries."""
    ds = rd.read_parquet(
        transcripts_path,
        columns=["conv_id", "turn_idx", "text"] + list(attr_cols or []),
        override_num_blocks=override_num_blocks,
    )
    # Counting pre-pass as raw per-file tasks over ONE column (conv_id):
    # skips both the text decode and the Dataset-executor launch overhead.
    import os

    paths = sorted(
        os.path.join(transcripts_path, f)
        for f in os.listdir(transcripts_path)
        if f.endswith(".parquet")
    ) if os.path.isdir(transcripts_path) else [transcripts_path]
    ds = corpus.assign_doc_ids(ds, counts=corpus.conv_counts_from_files(paths))
    return build.build_index(
        ds,
        index_root,
        batch_size=batch_size,
        concurrency=concurrency,
        resume=resume,
        input_desc=transcripts_path,
        attr_cols=attr_cols,
        store_positions=store_positions,
    )


def search_transcripts(
    index_root: str, query_text: str, k: int = 10, mode: str = "and"
):
    """Top-k over the CURRENT index version (in-process reader)."""
    return query.IndexReader(index_root).search(query_text, k=k, mode=mode)
