"""Embedding-column statistics: per-label centroids and their pairwise
cosine similarity.

A training-data pipeline uses label/cluster centroid geometry to audit
class separation, pick merge candidates, and seed IVF/k-means partitions
(the reference delegates all vector work to OpenSearch; our k-means /
SemDeDup ops in `ops/kmeans.py` are the builders — this is the analyst
surface over the same data).

Exact-oracle trick: cosine(mean_a, mean_b) == cosine(sum_a, sum_b) — the
1/n factors cancel — so the engine never divides. Each batch emits
per-label integer partial sums (components quantized at 1e7, the
fixed-point rule), the driver folds them, and dot products / norms are
computed in arbitrary-precision Python ints (DuckDB: HUGEINT). Float
enters once, in the final ``dot / (|a|·|b|)`` expression, identically on
both sides. One streaming pass, no shuffle; partials are
``labels × dims`` ints per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_SCALE = 1e7


def centroid_cosine(
    ds,
    *,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Pairwise cosine similarity between per-label centroid vectors.
    Returns ``(label_a, label_b, n_a, n_b, cosine)`` for label_a < label_b,
    cosine rounded to 6, sorted by the pair."""

    def partial(t: pa.Table) -> pa.Table:
        labs = t[label_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        vecs = t[vec_col].combine_chunks()
        flat = vecs.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        dims = np.diff(vecs.offsets.to_numpy(zero_copy_only=False))
        d = int(dims[0]) if dims.size else 0
        q = np.floor(flat * _SCALE + 0.5).reshape(-1, d) if d else np.zeros((0, 0))
        lu, li = np.unique(labs, return_inverse=True)
        sums = np.zeros((lu.size, d), np.float64)
        np.add.at(sums, li, q)
        return pa.table(
            {
                "label": pa.array(lu, pa.int64()),
                "n": pa.array(np.bincount(li, minlength=lu.size).astype(np.int64), pa.int64()),
                "s": pa.array(list(sums.astype(np.int64)), pa.list_(pa.int64())),
            }
        )

    parts = [
        b.to_pandas()
        for b in ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    cols = ["label_a", "label_b", "n_a", "n_b", "cosine"]
    if not parts:
        return pd.DataFrame(columns=cols)
    folded: dict[int, tuple[int, np.ndarray]] = {}
    for df in parts:
        for lab, n, s in df.itertuples(index=False):
            arr = np.asarray(s, dtype=np.int64)
            if lab in folded:
                pn, ps = folded[lab]
                folded[lab] = (pn + int(n), ps + arr)
            else:
                folded[lab] = (int(n), arr.copy())
    labels = sorted(folded)
    # exact integer dot products (values exceed int64 — Python ints)
    vecs = {l: [int(x) for x in folded[l][1]] for l in labels}
    norms = {l: sum(x * x for x in vecs[l]) for l in labels}
    rows = []
    for i, la in enumerate(labels):
        for lb in labels[i + 1 :]:
            dot = sum(a * b for a, b in zip(vecs[la], vecs[lb]))
            denom = float(np.sqrt(float(norms[la]))) * float(np.sqrt(float(norms[lb])))
            cos = round(float(dot) / denom, 6) + 0.0 if denom > 0 else 0.0
            rows.append((la, lb, folded[la][0], folded[lb][0], cos))
    return pd.DataFrame(rows, columns=cols)


def centroid_cosine_sql(
    table: str = "embeddings",
    *,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> str:
    return f"""
WITH e AS (
  SELECT CAST({label_col} AS BIGINT) AS label,
         generate_subscripts({vec_col}, 1) AS i,
         unnest({vec_col}) AS x
  FROM {table}
),
q AS (
  SELECT label, i,
         sum(CAST(floor(CAST(x AS DOUBLE) * 1e7 + 0.5) AS HUGEINT)) AS s
  FROM e GROUP BY label, i
),
cnt AS (SELECT CAST({label_col} AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n FROM {table} GROUP BY 1),
norms AS (SELECT label, sum(s * s) AS nn FROM q GROUP BY label),
dots AS (
  SELECT a.label AS label_a, b.label AS label_b, sum(a.s * b.s) AS dot
  FROM q a JOIN q b ON a.i = b.i AND a.label < b.label
  GROUP BY a.label, b.label
)
SELECT d.label_a, d.label_b, ca.n AS n_a, cb.n AS n_b,
       CASE WHEN na.nn = 0 OR nb.nn = 0 THEN 0.0
            ELSE round(CAST(d.dot AS DOUBLE)
                       / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))), 6) + 0.0
       END AS cosine
FROM dots d
JOIN norms na ON na.label = d.label_a
JOIN norms nb ON nb.label = d.label_b
JOIN cnt ca ON ca.label = d.label_a
JOIN cnt cb ON cb.label = d.label_b
ORDER BY d.label_a, d.label_b
""".strip()


def quantize_embeddings_int8(
    ds,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Symmetric int8 quantization of an embedding column with per-dimension
    scales — the vector-store compression step (4× smaller, |q| ≤ 127,
    q = floor(x / max|x|_dim · 127 + 0.5)). Two streaming passes: exact
    per-dim max-abs partials (dims floats per batch) folded and broadcast,
    then a stateless quantize map. Returns long-form ``(vec_id, i, q)``
    (1-based dim index, matching SQL generate_subscripts) sorted by
    (vec_id, i); zero-scale dims quantize to 0."""
    import ray

    def maxabs(t: pa.Table) -> pa.Table:
        vecs = t[vec_col].combine_chunks()
        flat = np.abs(vecs.flatten().to_numpy(zero_copy_only=False).astype(np.float64))
        dims = np.diff(vecs.offsets.to_numpy(zero_copy_only=False))
        d = int(dims[0]) if dims.size else 0
        m = flat.reshape(-1, d).max(axis=0) if d and flat.size else np.zeros(d)
        return pa.table({"i": pa.array(np.arange(d, dtype=np.int64), pa.int64()),
                         "m": pa.array(m, pa.float64())})

    parts = [
        b.to_pandas()
        for b in ds.map_batches(maxabs, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    cols = ["vec_id", "i", "q"]
    if not parts:
        return pd.DataFrame(columns=cols)
    scales = (
        pd.concat(parts, ignore_index=True).groupby("i", sort=True)["m"].max().to_numpy(np.float64)
    )
    ref = ray.put(scales)

    def quant(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        vecs = t[vec_col].combine_chunks()
        flat = vecs.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        d = m.size
        x = flat.reshape(-1, d)
        safe = np.where(m > 0, m, 1.0)
        q = np.clip(np.floor(x / safe * 127 + 0.5), -127, 127).astype(np.int64)
        q[:, m <= 0] = 0
        ids = t[id_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(ids, d), pa.int64()),
                "i": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), ids.size), pa.int64()),
                "q": pa.array(q.ravel(), pa.int64()),
            }
        )

    out = ds.map_batches(quant, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    if out.empty:
        return pd.DataFrame(columns=cols)
    return out.sort_values(["vec_id", "i"]).reset_index(drop=True)[cols]


def quantize_embeddings_int8_sql(
    table: str = "embeddings",
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    return f"""
WITH e AS (
  SELECT {id_col} AS vec_id,
         generate_subscripts({vec_col}, 1) AS i,
         CAST(unnest({vec_col}) AS DOUBLE) AS x
  FROM {table}
),
s AS (SELECT i, max(abs(x)) AS m FROM e GROUP BY i)
SELECT e.vec_id, CAST(e.i AS BIGINT) AS i,
       CASE WHEN s.m <= 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(least(127, greatest(-127, floor(e.x / s.m * 127 + 0.5))) AS BIGINT)
       END AS q
FROM e JOIN s USING (i) ORDER BY e.vec_id, e.i
""".strip()
