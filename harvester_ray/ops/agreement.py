"""Inter-rater agreement (Cohen's kappa) between two document filters.

Curation pipelines run several keep/drop heuristics side by side (the
reference's analog: the per-rule validation gates that route documents to
active/inactive state, /root/reference/harvester/core/models/datatypes/
document.py:84-118); kappa quantifies how much two raters agree beyond
chance (Cohen 1960) — the standard check before swapping one filter for a
cheaper one.

Raters here: A = the Gopher Table-A1 composite keep
(text_analysis.gopher_rules_batch), B = the heuristic quality score ≥
threshold (text_analysis.analyze_batch). Both are existing oracle-green
expressions, evaluated per batch in ONE pass.

Exact parity: the confusion matrix is four integer counts folded across
blocks (order-independent); kappa's closed form is kept all-integer —
``num = N·(n11+n00) − (r1·c1 + r0·c0)``, ``den = N² − (r1·c1 + r0·c0)``
— with one mirrored floor(x·1e6 + 0.5)/1e6 display division at the end.

Scale shape: one streaming pass, 4 int64s per block cross the wire.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from . import text_analysis


def rater_kappa(
    ds,
    *,
    quality_thr: float = 0.4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """One row: confusion counts + Cohen's kappa between the Gopher keep
    rule and the quality-score rater."""

    def confusion(batch: pa.Table) -> pa.Table:
        a = np.asarray(
            text_analysis.gopher_rules_batch(
                batch, id_col=id_col, text_col=text_col
            )["keep"]
        )
        q = np.asarray(
            text_analysis.analyze_batch(batch, id_col=id_col, text_col=text_col)[
                "quality"
            ]
        )
        b = q >= quality_thr
        return pa.table({
            "n11": pa.array([int(np.sum(a & b))], pa.int64()),
            "n10": pa.array([int(np.sum(a & ~b))], pa.int64()),
            "n01": pa.array([int(np.sum(~a & b))], pa.int64()),
            "n00": pa.array([int(np.sum(~a & ~b))], pa.int64()),
        })

    parts = ds.map_batches(
        confusion, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    n11 = int(parts["n11"].sum())
    n10 = int(parts["n10"].sum())
    n01 = int(parts["n01"].sum())
    n00 = int(parts["n00"].sum())
    total = n11 + n10 + n01 + n00
    chance = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    num = total * (n11 + n00) - chance
    den = total * total - chance
    kappa = (
        math.floor(float(num) / float(den) * 1_000_000.0 + 0.5) / 1_000_000.0
        if den
        else 0.0
    )
    return pd.DataFrame({
        "n11": [n11], "n10": [n10], "n01": [n01], "n00": [n00],
        "kappa": [kappa],
    })


def rater_kappa_sql(
    table: str = "documents",
    *,
    quality_thr: float = 0.4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Oracle: the same two rater expressions (reused verbatim from their
    own green gates) joined per doc, identical integer kappa form."""
    g = text_analysis.gopher_rules_sql(table, id_col=id_col, text_col=text_col)
    q = text_analysis.analyze_sql(table, id_col=id_col, text_col=text_col)
    return f"""
WITH g AS MATERIALIZED ({g}),
q AS MATERIALIZED ({q}),
j AS (SELECT g.keep AS a, q.quality >= {quality_thr!r} AS b
      FROM g JOIN q USING (doc_id)),
c AS (SELECT CAST(count(*) FILTER (a AND b) AS HUGEINT) AS n11,
             CAST(count(*) FILTER (a AND NOT b) AS HUGEINT) AS n10,
             CAST(count(*) FILTER (NOT a AND b) AS HUGEINT) AS n01,
             CAST(count(*) FILTER (NOT a AND NOT b) AS HUGEINT) AS n00
      FROM j),
k AS (SELECT n11, n10, n01, n00,
             (n11 + n10 + n01 + n00) AS total,
             ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) AS chance
      FROM c)
SELECT CAST(n11 AS BIGINT) AS n11, CAST(n10 AS BIGINT) AS n10,
       CAST(n01 AS BIGINT) AS n01, CAST(n00 AS BIGINT) AS n00,
       CASE WHEN total * total - chance = 0 THEN 0.0
            ELSE floor(CAST(total * (n11 + n00) - chance AS DOUBLE)
                       / CAST(total * total - chance AS DOUBLE)
                       * 1000000 + 0.5) / 1000000
       END AS kappa
FROM k
""".strip()
