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


def calibration_bins(
    ds,
    *,
    n_bins: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Reliability diagram (Murphy/DeGroot calibration): bin documents by
    the heuristic quality score, and per bin report how often the Gopher
    composite actually keeps them — the standard check before using a
    cheap scorer as a proxy label at corpus scale.

    Parity: the score is the gate-green round(·,6) double on both sides,
    so ``floor(score·n_bins)`` bins and ``floor(score·1e6 + 0.5)`` micro
    sums are computed from IDENTICAL doubles; per-bin sums/counts are
    integers; the two ratios are mirrored floor-half divisions.

    Scale shape: one streaming pass, ≤ n_bins partial rows per block.
    """
    import math

    def partial(batch: pa.Table) -> pa.Table:
        keep = np.asarray(
            text_analysis.gopher_rules_batch(
                batch, id_col=id_col, text_col=text_col
            )["keep"]
        )
        q = np.asarray(
            text_analysis.analyze_batch(batch, id_col=id_col, text_col=text_col)[
                "quality"
            ]
        )
        bins = np.minimum(np.floor(q * n_bins), n_bins - 1).astype(np.int64)
        q_micro = np.floor(q * 1_000_000 + 0.5).astype(np.int64)
        uniq, inv = np.unique(bins, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        pos = np.zeros(uniq.size, dtype=np.int64)
        np.add.at(pos, inv, keep.astype(np.int64))
        sums = np.zeros(uniq.size, dtype=np.int64)
        np.add.at(sums, inv, q_micro)
        return pa.table({
            "bin": pa.array(uniq, pa.int64()),
            "n": pa.array(n, pa.int64()),
            "pos": pa.array(pos, pa.int64()),
            "sq": pa.array(sums, pa.int64()),
        })

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    rows = []
    for b, grp in parts.groupby("bin"):
        n = int(grp["n"].sum())
        pos = int(grp["pos"].sum())
        sq = int(grp["sq"].sum())
        rows.append((
            int(b), n, pos,
            math.floor(pos / n * 1e6 + 0.5) / 1e6,
            math.floor(sq / n + 0.5) / 1e6,
        ))
    return pd.DataFrame(
        rows, columns=["bin", "n_docs", "n_pos", "pos_rate", "mean_score"]
    ).sort_values("bin").reset_index(drop=True)


def calibration_bins_sql(
    table: str = "documents",
    *,
    n_bins: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    g = text_analysis.gopher_rules_sql(table, id_col=id_col, text_col=text_col)
    q = text_analysis.analyze_sql(table, id_col=id_col, text_col=text_col)
    return f"""
WITH g AS MATERIALIZED ({g}),
q AS MATERIALIZED ({q}),
j AS (SELECT least(CAST(floor(q.quality * {n_bins}) AS BIGINT), {n_bins - 1}) AS bin,
             CAST(g.keep AS BIGINT) AS pos,
             CAST(floor(q.quality * 1000000 + 0.5) AS BIGINT) AS qm
      FROM g JOIN q USING (doc_id))
SELECT bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(pos) AS BIGINT) AS n_pos,
       floor(CAST(SUM(pos) AS DOUBLE) / count(*) * 1000000 + 0.5) / 1000000
         AS pos_rate,
       floor(CAST(SUM(qm) AS DOUBLE) / count(*) + 0.5) / 1000000 AS mean_score
FROM j
GROUP BY bin
ORDER BY bin
""".strip()
