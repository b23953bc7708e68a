"""Per-language index routing.

The reference maintains one physical OpenSearch index per analyzer language
(en / nl / unk) plus one multilingual "all" index, and pushes each document
to its language index and to "all" (harvester/search/models/index.py:17-66,
push loop harvester/search/tasks/index.py:36-42; language codes
harvester/harvester/settings/base.py:307). Here: one index root per clamped
language under a shared parent, each with its own (correctly per-language)
df/avgdl statistics, plus an "all" index over the full corpus.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

from .. import analyzer
from ..index import build, query

LANGUAGE_ROUTES = (*analyzer.ANALYSER_LANGUAGES, analyzer.UNKNOWN_LANGUAGE)
ALL_ROUTE = "all"


def build_language_indexes(
    ds,
    parent_root: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    concurrency: int | None = None,
    attr_cols: list[str] | None = None,
) -> dict[str, dict]:
    """Build en/nl/unk + all indexes. Returns manifest per route."""

    def clamped(t: pa.Table) -> pa.Table:
        langs = analyzer.clamp_language(t[lang_col])
        idx = t.schema.get_field_index(lang_col)
        return t.set_column(idx, lang_col, langs)

    base = ds.map_batches(clamped, batch_format="pyarrow", zero_copy_batch=True)
    manifests = {}
    for route in LANGUAGE_ROUTES:
        sub = base.map_batches(
            lambda t, r=route: t.filter(pc.equal(t[lang_col], r)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        manifests[route] = build.build_index(
            sub,
            os.path.join(parent_root, route),
            id_col=id_col,
            text_col=text_col,
            concurrency=concurrency,
            attr_cols=attr_cols,
            input_desc=f"language route {route}",
        )
    manifests[ALL_ROUTE] = build.build_index(
        base,
        os.path.join(parent_root, ALL_ROUTE),
        id_col=id_col,
        text_col=text_col,
        concurrency=concurrency,
        attr_cols=attr_cols,
        input_desc="language route all",
    )
    return manifests


def search_language(
    parent_root: str, query_text: str, k: int = 10, *, language: str | None = None, **kw
) -> pa.Table:
    """Route a query to its language index (None → 'all'), mirroring the
    reference's alias routing (search/models/index.py:113-156)."""
    route = language if language in LANGUAGE_ROUTES else ALL_ROUTE
    return query.IndexReader(os.path.join(parent_root, route)).search(query_text, k=k, **kw)
