"""Metadata translation fetchers — stateful actor-pool stage with cache.

The reference translates metadata value labels between nl and en through
Eduterm / Edustandaard / DeepL API clients (harvester/metadata/tasks.py:
13-28, metadata/utils/translations.py). No network in this container, so
the CLIENT is a deterministic fake behind the client seam; the parts that
matter at scale are real and tested:

- the API client is constructed once per actor (``__init__``),
- a per-actor memo cache collapses repeated values so the (expensive,
  rate-limited) client is hit once per DISTINCT value per actor — the
  dominant effect for metadata vocabularies where a handful of labels cover
  millions of rows,
- batches deduplicate before calling the client (vectorized factorize).

The fake translation (``value (target)``) is SQL-expressible, so the stage
is oracle-checked at the driver gate.
"""

from __future__ import annotations

import pyarrow as pa

TRANSLATE_SCHEMA = pa.schema(
    [
        ("value", pa.string()),
        ("language", pa.string()),
        ("target", pa.string()),
        ("translation", pa.string()),
    ]
)


class TranslationClient:
    """Fake Eduterm/DeepL client: deterministic pseudo-translation. Real
    impl: HTTP client with auth + rate limiting."""

    def __init__(self):
        self.calls = 0

    def translate(self, value: str, target: str) -> str:
        self.calls += 1
        return f"{value} ({target})"


class TranslateStage:
    """``map_batches(TranslateStage, concurrency=N)``: client + cache live
    for the actor's lifetime; each batch deduplicates values first so the
    client sees each distinct (value, target) at most once per actor."""

    def __init__(self, *, target: str = "en"):
        pa.set_cpu_count(1)
        self.target = target
        self.client = TranslationClient()
        self.cache: dict[str, str] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        values = batch["value"].to_pylist()
        langs = (
            batch["language"].to_pylist()
            if "language" in batch.column_names
            else [None] * len(values)
        )
        distinct = set(v for v in values if v is not None)
        for v in distinct:
            if v not in self.cache:
                self.cache[v] = self.client.translate(v, self.target)
        out_t = [None if v is None else self.cache[v] for v in values]
        return pa.table(
            {
                "value": pa.array(values, pa.string()),
                "language": pa.array(langs, pa.string()),
                "target": pa.array([self.target] * len(values), pa.string()),
                "translation": pa.array(out_t, pa.string()),
            },
            schema=TRANSLATE_SCHEMA,
        )


def translate_values(
    ds,
    *,
    value_col: str = "value",
    language_col: str | None = None,
    target: str = "en",
    concurrency: int = 4,
    batch_size: int = 1024,
):
    """Translate a column of metadata labels through the actor pool."""

    def sel(t: pa.Table) -> pa.Table:
        cols = {"value": t[value_col]}
        if language_col is not None:
            cols["language"] = t[language_col]
        return pa.table(cols)

    return ds.map_batches(sel, batch_format="pyarrow", zero_copy_batch=True).map_batches(
        TranslateStage,
        fn_constructor_kwargs={"target": target},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )
