"""Similarity search over an embedding column (list<float>).

Counterpart of the reference's more_like_this / similarity endpoints, which
it delegates entirely to OpenSearch (harvester/search/views/similarity.py:
70-110); here implemented natively:

- ``knn_brute``: exact cosine top-k — the query matrix is broadcast once
  (``ray.put``), each batch is one numpy matmul, results merge through a
  global deterministic top-k. The verification baseline.
- ``knn_ivf``: IVF-bucketed variant — deterministic k-means-lite centroids,
  per-batch cluster assignment, search restricted to the ``nprobe`` nearest
  clusters. The 100 TB path: cluster assignment is a streaming map, only
  probed partitions are scanned.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


def _batch_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    return np.stack(batch[vec_col].to_pandas().to_numpy()).astype(np.float64)


def knn_brute(
    ds,
    query_vecs: np.ndarray,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Exact cosine top-k for each query vector.

    Returns a pa.Table (query_id, vec_id, cosine) with per-query
    deterministic ordering (cosine desc, vec_id asc).
    """
    import ray

    q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    qref = ray.put(q)

    def score(batch: pa.Table) -> pa.Table:
        qm = ray.get(qref)
        ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        mat = _normalize(_batch_matrix(batch, vec_col))
        sims = qm @ mat.T  # (Q, B)
        nq = qm.shape[0]
        # local top-k per query to bound what leaves the task
        kk = min(k, ids.size)
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        out_q = np.repeat(np.arange(nq, dtype=np.int64), kk)
        out_v = ids[part].ravel()
        out_s = np.take_along_axis(sims, part, axis=1).ravel()
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    parts = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    out = []
    for qi, g in parts.groupby("query_id"):
        order = np.lexsort((g["vec_id"].to_numpy(), -g["cosine"].to_numpy()))[:k]
        sel = g.iloc[order]
        out.append(
            pa.table(
                {
                    "query_id": pa.array(np.full(len(sel), qi, np.int64)),
                    "vec_id": pa.array(sel["vec_id"].to_numpy(), pa.int64()),
                    "cosine": pa.array(np.round(sel["cosine"].to_numpy(), 6), pa.float64()),
                }
            )
        )
    return pa.concat_tables(out) if out else pa.table(
        {"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()), "cosine": pa.array([], pa.float64())}
    )


def deterministic_centroids(ds, n_centroids: int, *, vec_col: str = "embedding", iters: int = 5):
    """k-means-lite with deterministic init (first ``n_centroids`` rows by id
    order) and a fixed number of Lloyd iterations over a driver-side sample.
    Deterministic: no RNG, no wall clock."""
    sample = ds.limit(max(n_centroids * 50, 1000)).to_pandas()
    mat = _normalize(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
    cent = mat[:n_centroids].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(n_centroids):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    cent[c] = v / nv
    return cent


def knn_ivf(
    ds,
    query_vecs: np.ndarray,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
):
    """IVF-style ANN: only batch rows assigned to the query's ``nprobe``
    closest centroids are scored. Approximate; recall measured against
    knn_brute in tests."""
    import ray

    cent = deterministic_centroids(ds, n_centroids, vec_col=vec_col)
    q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    probe = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    ref = ray.put((q, cent, probe))

    def score(batch: pa.Table) -> pa.Table:
        qm, cm, pr = ray.get(ref)
        ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        mat = _normalize(_batch_matrix(batch, vec_col))
        assign = np.argmax(mat @ cm.T, axis=1)
        rows_q, rows_v, rows_s = [], [], []
        for qi in range(qm.shape[0]):
            mask = np.isin(assign, pr[qi])
            if not mask.any():
                continue
            sims = mat[mask] @ qm[qi]
            sel_ids = ids[mask]
            kk = min(k, sel_ids.size)
            part = np.argpartition(-sims, kk - 1)[:kk]
            rows_q.append(np.full(kk, qi, np.int64))
            rows_v.append(sel_ids[part])
            rows_s.append(sims[part])
        if not rows_q:
            return pa.table(
                {"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()), "cosine": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(rows_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(rows_v), pa.int64()),
                "cosine": pa.array(np.concatenate(rows_s), pa.float64()),
            }
        )

    parts = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    out = []
    for qi, g in parts.groupby("query_id"):
        order = np.lexsort((g["vec_id"].to_numpy(), -g["cosine"].to_numpy()))[:k]
        sel = g.iloc[order]
        out.append(
            pa.table(
                {
                    "query_id": pa.array(np.full(len(sel), qi, np.int64)),
                    "vec_id": pa.array(sel["vec_id"].to_numpy(), pa.int64()),
                    "cosine": pa.array(np.round(sel["cosine"].to_numpy(), 6), pa.float64()),
                }
            )
        )
    return pa.concat_tables(out) if out else pa.table(
        {"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()), "cosine": pa.array([], pa.float64())}
    )


def knn_sql(
    table: str = "embeddings",
    query_vec_id: int = 0,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Oracle: exact cosine top-k where the query vector is row
    ``query_vec_id`` of the same table. Lists are cast to DOUBLE[] because
    list_cosine_similarity over list<float> computes in float32, which the
    engine's float64 path cannot byte-match."""
    cos = f"list_cosine_similarity(CAST(e.{vec_col} AS DOUBLE[]), q.qv)"
    return f"""
WITH q AS (SELECT CAST({vec_col} AS DOUBLE[]) AS qv FROM {table} WHERE {id_col} = {query_vec_id})
SELECT e.{id_col} AS vec_id,
       round({cos}, 6) AS cosine
FROM {table} e CROSS JOIN q
ORDER BY {cos} DESC, e.{id_col} ASC
LIMIT {k}
""".strip()
