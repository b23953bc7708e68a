"""Multi-field weighted BM25 ("fields": ["title^2", "text"] parity).

The reference's stored query body searches several fields with per-field
boosts through one ``simple_query_string``
(`/root/reference/harvester/core/models/search/query.py:73-98`, field list
with ``^boost`` suffixes). OpenSearch scores each field independently with
BM25 (per-field df / doc length / avgdl) and combines per-term, per-field
contributions; this module implements the sum-combination form (BM25F-lite):

    score(d, q) = Σ_field  w_f · BM25_f(d, q)        (OR semantics)

Engine shape: one index per field (built with ``build_index(text_col=f)``),
each queried exhaustively in OR mode (k = n_docs so no per-field top-k
truncation can drop a doc whose *combined* score lands in the final top-k),
then a vectorized weighted merge. At serving scale the per-field reads fan
out through the same segment-actor machinery as single-field search; a
cross-field WAND upper-bound (sum of per-field block maxima) is the
documented optimization if exhaustive OR ever dominates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .. import analyzer
from . import bm25
from .query import IndexReader


def search_weighted_fields(
    readers: dict[str, "IndexReader"],
    weights: dict[str, float],
    query_text: str,
    k: int = 10,
    *,
    round_digits: int = 4,
) -> pd.DataFrame:
    """Weighted-sum multi-field BM25 top-k → (doc_id, score) DataFrame."""
    all_docs, all_ws = [], []
    # deterministic field order (sorted) so the float accumulation order is
    # reproducible run-to-run and matches the oracle's grouped sum tolerance
    for field in sorted(readers):
        reader = readers[field]
        w = float(weights.get(field, 1.0))
        res = reader.search(query_text, k=max(reader.n_docs, 1), mode="or")
        all_docs.append(np.asarray(res["doc_id"], dtype=np.int64))
        all_ws.append(np.asarray(res["score"], dtype=np.float64) * w)
    docs = np.concatenate(all_docs) if all_docs else np.empty(0, np.int64)
    ws = np.concatenate(all_ws) if all_ws else np.empty(0, np.float64)
    if not docs.size:
        return pd.DataFrame({"doc_id": pd.array([], dtype="int64"), "score": []})
    order = np.argsort(docs, kind="stable")
    docs, ws = docs[order], ws[order]
    uniq, starts = np.unique(docs, return_index=True)
    sums = np.add.reduceat(ws, starts)
    docs, scores = uniq, sums
    order = np.lexsort((docs, -scores))[:k]
    return pd.DataFrame(
        {"doc_id": docs[order], "score": np.round(scores[order], round_digits)}
    )


def bm25f_sql(
    table: str,
    query_text: str,
    fields: dict[str, float],
    k: int = 10,
    *,
    id_col: str = "doc_id",
    round_digits: int = 4,
) -> str:
    """Oracle: per-field BM25 (own df/doclen/avgdl per field), weighted sum.

    OR semantics; every field's score list is complete (no per-field LIMIT)
    before the weighted combination, matching the engine.
    """
    terms = sorted(set(analyzer.tokenize_query(query_text)))
    if not terms:
        return "SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS DOUBLE) AS score WHERE 1=0"
    term_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)

    ctes, selects = [], []
    for i, (col, _w) in enumerate(sorted(fields.items())):
        tok = analyzer.sql_tokenize_expr(col)
        ctes.append(
            f"""
dl_{i} AS (SELECT {id_col} AS doc_id, len({tok}) AS dl FROM {table}),
st_{i} AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl_{i}),
tk_{i} AS (SELECT {id_col} AS doc_id, unnest({tok}) AS term FROM {table}),
tf_{i} AS (SELECT doc_id, term, count(*) AS tf FROM tk_{i}
           WHERE term IN ({term_list}) GROUP BY doc_id, term),
df_{i} AS (SELECT term, count(*) AS df FROM tf_{i} GROUP BY term),
sc_{i} AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
              * tf.tf * ({bm25.K1} + 1.0)
              / (tf.tf + {bm25.K1} * (1.0 - {bm25.B} + {bm25.B} * d.dl / s.avgdl)) ) AS score
  FROM tf_{i} tf
  JOIN df_{i} df USING (term)
  JOIN dl_{i} d ON tf.doc_id = d.doc_id
  CROSS JOIN st_{i} s
  GROUP BY tf.doc_id
)""".strip()
        )
        selects.append(f"SELECT doc_id, score * {float(fields[col])} AS ws FROM sc_{i}")

    union = " UNION ALL ".join(selects)
    return f"""
WITH {", ".join(ctes)},
allf AS ({union}),
comb AS (SELECT doc_id, sum(ws) AS score FROM allf GROUP BY doc_id)
SELECT doc_id, round(score, {round_digits}) AS score
FROM comb
ORDER BY score DESC, doc_id ASC
LIMIT {k}
""".strip()
