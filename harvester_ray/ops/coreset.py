"""Greedy k-center coreset selection over an embedding column (Gonzalez,
"Clustering to minimize the maximum intercluster distance", TCS 1985 — the
farthest-point traversal used for training-data subset selection, e.g.
Sener & Savarese, "Active Learning for Convolutional Neural Networks: A
Core-Set Approach", ICLR 2018).

Curation use: pick k maximally-spread exemplars from a corpus embedding
table (seed the mixture, cap per-cluster sampling, pick eval probes).  The
sibling selection ops are `ops/similarity.mmr_rerank` (query-relative
diversity) and `ops/kmeans.semantic_dedup` (density pruning); k-center is
the query-free cover: each next pick maximizes its squared L2 distance to
the nearest already-picked center.

Oracle-exact discipline (the MMR/kmeans rule): components quantize once to
ints at ``scale``; every distance is an exact integer
``Σ (a_i − b_i)²`` — no float enters the selection key at all; ties pick
the lower vec_id.  Scale shape: the greedy is inherently sequential in k,
so the engine runs k streaming passes — each broadcasts the ≤k selected
centers (`ray.put`, k×d ints), computes per-batch min-distance-to-centers
with one GEMM, and returns ONE candidate row per block; the driver folds
O(blocks) rows per round and never sees a vector column.  At 100 TB this
is k scans (use modest k) with driver state k×d — the textbook
distributed farthest-point traversal.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .similarity import _batch_matrix


def kcenter_select(
    ds,
    *,
    k: int = 6,
    seed_id: int = 0,
    scale: float = 1e4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Greedy k-center: (rank, vec_id, mind2) where ``mind2`` is the exact
    integer squared distance of the pick to its nearest earlier center at
    selection time (0 for the seed — it defines the cover)."""
    import ray

    centers: list[np.ndarray] = []
    chosen: list[int] = []
    mind2s: list[int] = []

    def fetch_seed(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        hit = ids == seed_id
        if not hit.any():
            return pa.table({id_col: pa.array([], pa.int64()), vec_col: batch[vec_col].slice(0, 0)})
        return batch.filter(pa.array(hit)).select([id_col, vec_col])

    seed_tbl = ds.map_batches(fetch_seed, batch_format="pyarrow").to_pandas()
    if len(seed_tbl) == 0:
        raise ValueError(f"seed vec_id {seed_id} not found")
    seed_vec = np.floor(
        np.asarray(seed_tbl[vec_col].iloc[0], np.float64) * scale + 0.5
    ).astype(np.int64)
    centers.append(seed_vec)
    chosen.append(int(seed_id))
    mind2s.append(0)

    for _ in range(k - 1):
        cmat = np.stack(centers)
        cref = ray.put(cmat)
        taken = np.array(chosen, np.int64)
        tref = ray.put(taken)

        def best_in_block(batch: pa.Table) -> pa.Table:
            C = ray.get(cref)
            t = ray.get(tref)
            ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
            z = np.floor(_batch_matrix(batch, vec_col) * scale + 0.5).astype(np.int64)
            # exact integer squared L2 to every center, then min
            d2 = (
                (z * z).sum(axis=1)[:, None]
                + (C * C).sum(axis=1)[None, :]
                - 2 * (z @ C.T)
            )
            mind2 = d2.min(axis=1)
            mind2[np.isin(ids, t)] = -1  # already selected
            j = np.lexsort((ids, -mind2))[0]
            return pa.table(
                {
                    "vec_id": pa.array(ids[j : j + 1], pa.int64()),
                    "mind2": pa.array(mind2[j : j + 1], pa.int64()),
                }
            )

        cands = ds.map_batches(best_in_block, batch_format="pyarrow").to_pandas()
        j = np.lexsort((cands["vec_id"].to_numpy(), -cands["mind2"].to_numpy()))[0]
        pick, d2 = int(cands["vec_id"][j]), int(cands["mind2"][j])
        if d2 < 0:
            break  # corpus exhausted

        pid = pick

        def fetch_pick(batch: pa.Table, _pid=pid) -> pa.Table:
            ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
            hit = ids == _pid
            if not hit.any():
                return pa.table({id_col: pa.array([], pa.int64()), vec_col: batch[vec_col].slice(0, 0)})
            return batch.filter(pa.array(hit)).select([id_col, vec_col])

        row = ds.map_batches(fetch_pick, batch_format="pyarrow").to_pandas()
        centers.append(
            np.floor(np.asarray(row[vec_col].iloc[0], np.float64) * scale + 0.5).astype(np.int64)
        )
        chosen.append(pick)
        mind2s.append(d2)

    return pd.DataFrame(
        {
            "rank": np.arange(1, len(chosen) + 1, dtype=np.int64),
            "vec_id": np.asarray(chosen, np.int64),
            "mind2": np.asarray(mind2s, np.int64),
        }
    )


def kcenter_select_sql(
    table: str = "embeddings",
    *,
    k: int = 6,
    seed_id: int = 0,
    scale: float = 1e4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Oracle: identical integer quantization, greedy unrolled as k chained
    CTE steps over an exact pairwise integer-distance table (the MMR
    unrolled-iteration trick)."""
    head = f"""
WITH qz AS (
  SELECT {id_col} AS vec_id,
         list_transform(CAST({vec_col} AS DOUBLE[]),
                        x -> CAST(floor(x * {scale!r} + 0.5) AS BIGINT)) AS qv
  FROM {table}
),
flat AS (
  SELECT vec_id, unnest(qv) AS e, generate_subscripts(qv, 1) AS i FROM qz
),
pdist AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         CAST(sum((a.e - b.e) * (a.e - b.e)) AS BIGINT) AS d2
  FROM flat a JOIN flat b ON a.i = b.i
  GROUP BY a.vec_id, b.vec_id
),
sel1 AS (SELECT CAST({seed_id} AS BIGINT) AS vec_id, 1 AS rank, CAST(0 AS BIGINT) AS mind2)"""
    steps = []
    for j in range(2, k + 1):
        prev = f"sel{j-1}"
        steps.append(f"""step{j} AS (
  SELECT p.va AS vec_id, min(p.d2) AS mind2
  FROM pdist p JOIN {prev} s ON p.vb = s.vec_id
  WHERE p.va NOT IN (SELECT vec_id FROM {prev})
  GROUP BY p.va
  ORDER BY min(p.d2) DESC, p.va ASC
  LIMIT 1
),
sel{j} AS (
  SELECT vec_id, rank, mind2 FROM {prev}
  UNION ALL SELECT vec_id, {j}, mind2 FROM step{j}
)""")
    return (
        head + ",\n" + ",\n".join(steps)
        + f"\nSELECT CAST(rank AS BIGINT) AS rank, vec_id, mind2 FROM sel{k} ORDER BY rank"
    )
