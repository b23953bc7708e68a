"""Linear bag-of-tokens quality classifier — the fastText-style quality
filter every large-scale LLM data pipeline runs (CCNet / GPT-3 / Llama
quality gates), expressed as a stateful model-inference stage.

Ray-Data-first shape: the "model" (a hashed-feature weight table, the
fastText hashing-trick layout) is materialized ONCE PER ACTOR in
``__init__`` — the load-once-per-worker discipline of SURVEY §2.3 — and
``__call__`` scores whole Arrow batches vectorized: one ``tokenize_flat``,
one md5-64 per DISTINCT batch token (vocabulary-bounded, the same bound
SimHash uses), one weight gather, two bincounts. No shuffle; one streaming
pass.

No trained model ships in this container, so weights are a DETERMINISTIC
stand-in derived from the bucket id by the shared Knuth mix — which makes
the whole scoring path (hashing, bucketing, tf-weighted accumulation,
thresholded label) verifiable value-identically against a DuckDB oracle.
Swapping in real fastText weights changes only ``_weight_table``.
Everything stays exact-integer: the score is the integer pair
``(w_sum, n_tokens)``, never a float mean.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import analyzer
from .sketch import _md5_64

N_BUCKETS = 1024
_KNUTH = 2654435761
_MOD = 1 << 32


def _weight_table(salt: int) -> np.ndarray:
    """Integer weights in [-500, 500): w[b] = knuth-mix(b, salt) % 1000 − 500."""
    b = np.arange(N_BUCKETS, dtype=np.int64)
    return ((b * _KNUTH + salt) % _MOD) % 1000 - 500


class QualityModelStage:
    """Callable class for ``map_batches(QualityModelStage, concurrency=N,
    fn_constructor_kwargs={"salt": ...})`` — weight table built once per
    actor; per-batch scoring is fully vectorized."""

    def __init__(self, salt: int = 97):
        self.salt = salt
        self.w = _weight_table(salt)
        self._hash_cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        doc_ids = np.asarray(batch["doc_id"], dtype=np.int64)
        row_ids, codes, dictionary = analyzer.tokenize_flat(batch["text"])
        vocab = dictionary.to_pylist()
        buckets = (_md5_64(vocab) % np.uint64(N_BUCKETS)).astype(np.int64)
        tok_w = self.w[buckets][codes]
        w_sum = np.bincount(row_ids, weights=tok_w, minlength=n).astype(np.int64)
        n_tokens = np.bincount(row_ids, minlength=n).astype(np.int64)
        label = np.where(w_sum > 0, "keep", "drop")
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "w_sum": pa.array(w_sum, pa.int64()),
            "label": pa.array(label, pa.string()),
        })


def quality_scores(
    ds,
    *,
    salt: int = 97,
    concurrency: int = 2,
    collect: bool = True,
):
    """Score every document with the linear quality model (actor pool of
    ``concurrency`` workers — weights built once per actor)."""
    res = ds.map_batches(
        QualityModelStage,
        batch_format="pyarrow",
        fn_constructor_kwargs={"salt": salt},
        concurrency=concurrency,
    )
    if not collect:
        return res
    out = res.to_pandas()
    if out.empty:
        return pd.DataFrame({
            "doc_id": pd.Series(dtype=np.int64),
            "n_tokens": pd.Series(dtype=np.int64),
            "w_sum": pd.Series(dtype=np.int64),
            "label": pd.Series(dtype=object),
        })
    return out.sort_values("doc_id").reset_index(drop=True)


def quality_scores_sql(
    table: str,
    *,
    salt: int = 97,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle: identical md5-64 bucketing, Knuth weight derivation
    and integer tf-weighted accumulation; token-less docs score (0, 0,
    'drop')."""
    tok = analyzer.sql_tokenize_expr(text_col)
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, unnest({tok}) AS term FROM {table}
),
wtok AS (
  SELECT doc_id,
         CAST( ((CAST(('0x' || substr(md5(term), 1, 16)) AS UBIGINT) % {N_BUCKETS})
                 * {_KNUTH} + {salt}) % {_MOD} % 1000 AS BIGINT) - 500 AS w
  FROM toks
),
s AS (
  SELECT doc_id, count(*) AS n_tokens, CAST(sum(w) AS BIGINT) AS w_sum
  FROM wtok GROUP BY doc_id
)
SELECT d.{id_col} AS doc_id,
       coalesce(s.n_tokens, 0) AS n_tokens,
       coalesce(s.w_sum, 0) AS w_sum,
       CASE WHEN coalesce(s.w_sum, 0) > 0 THEN 'keep' ELSE 'drop' END AS label
FROM {table} d
LEFT JOIN s ON s.doc_id = d.{id_col}
ORDER BY doc_id
""".strip()
