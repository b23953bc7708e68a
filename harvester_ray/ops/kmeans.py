"""Distributed Lloyd's k-means over an embedding column.

Clustering is a first-class curation operator at training-data scale —
topic bucketing, cluster-balanced sampling, and the centroid build behind
IVF approximate search (`ops/similarity.py:ivf_partition` uses a
driver-side sampled variant; this is the full-corpus distributed one).
The reference has no clustering, but its vectorizer corpus-stats stage
(`/root/reference/harvester/core/processors/compare.py`) is the adjacent
"fit global state from every document" pattern.

Scale shape: classic two-phase Lloyd iteration —

- centroids live in the closure (k × d ints — broadcast once per pass,
  NOT per batch);
- each pass is one streaming `map_batches` over the corpus producing
  per-batch partial sums ``(cluster, count, component sums)`` — k rows
  per batch, folded on the driver exactly like `pipelines/graph.py`
  folds PageRank contributions. No shuffle at any point; the corpus is
  re-streamed per iteration (at 100 TB you cannot pin it, and a pruned
  columnar re-read is the honest cost of an iterative algorithm).

Oracle parity (CLAUDE.md fixed-point rule): float equality across engines
is hopeless, so BOTH sides quantize embedding components to integers
(``floor(x * 1e6 + 0.5)``) up front. Distances are then exact integer
sums (d=64, |v|~1e6 → Σ(a-b)² ≤ ~2.6e14 « 2^63), argmin ties break to
the lowest cluster id on both sides, and centroid updates re-quantize
with the same ``floor(sum/count + 0.5)`` in IEEE double (sums < 2^53, so
the division is bit-identical). Empty clusters keep their previous
centroid.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_SCALE = 1_000_000.0


def _quantize(batch: pa.Table, vec_col: str, scale: float = _SCALE) -> np.ndarray:
    import pyarrow.compute as pc

    lists = batch[vec_col].combine_chunks()
    if len(lists) == 0:
        return np.empty((0, 0), np.int64)
    flat = np.asarray(pc.list_flatten(lists).cast(pa.float64()))
    mat = flat.reshape(len(lists), len(lists[0]))
    return np.floor(mat * scale + 0.5).astype(np.int64)


def _assign(qmat: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Exact integer argmin of squared euclidean distance; ties → lowest
    cluster id (np.argmin returns the first minimum)."""
    # |a-c|^2 = |a|^2 - 2 a·c + |c|^2 ; |a|^2 is constant per row for argmin
    cross = qmat @ cent.T  # int64, ≤ 64·1e12 per element
    dist = (cent * cent).sum(axis=1)[None, :] - 2 * cross
    return np.argmin(dist, axis=1)


def kmeans_fit(
    ds,
    *,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = _SCALE,
) -> np.ndarray:
    """Run ``iters`` Lloyd iterations from deterministic init (the k vectors
    with ``id < k``) and return the final quantized centroid matrix."""

    def init_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        m = ids < k
        if not m.any():
            return pa.table(
                {"id": pa.array([], pa.int64()), "q": pa.array([], pa.list_(pa.int64()))}
            )
        q = _quantize(batch, vec_col, scale)[m]
        return pa.table(
            {
                "id": pa.array(ids[m], pa.int64()),
                "q": pa.array(list(q), pa.list_(pa.int64())),
            }
        )

    seed = (
        ds.map_batches(init_rows, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .sort_values("id")
    )
    if len(seed) < k:
        raise ValueError(f"need ids 0..{k - 1} present for deterministic init")
    cent = np.stack(seed["q"].to_numpy()).astype(np.int64)

    for _ in range(iters):
        c = cent  # rebind for closure capture of this iteration's value

        def partials(batch: pa.Table, cent_now=c) -> pa.Table:
            q = _quantize(batch, vec_col, scale)
            a = _assign(q, cent_now)
            cnt = np.bincount(a, minlength=k)
            sums = np.zeros((k, q.shape[1]), np.int64)
            np.add.at(sums, a, q)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(k, dtype=np.int64), pa.int64()),
                    "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
                    "sums": pa.array(list(sums), pa.list_(pa.int64())),
                }
            )

        rows = ds.map_batches(
            partials, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()  # k rows per batch — tiny driver fold, like pagerank
        cnt = np.zeros(k, np.int64)
        sums = np.zeros_like(cent)
        for r in rows:
            cnt[r["cluster"]] += r["cnt"]
            sums[r["cluster"]] += np.asarray(r["sums"], np.int64)
        nz = cnt > 0
        new = cent.copy()  # empty clusters keep their previous centroid
        new[nz] = np.floor(sums[nz] / cnt[nz, None] + 0.5).astype(np.int64)
        cent = new

    return cent


def kmeans_assign(
    ds,
    *,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = _SCALE,
):
    """Final ``(vec_id, cluster)`` assignment after ``kmeans_fit``."""
    final = kmeans_fit(ds, k=k, iters=iters, id_col=id_col, vec_col=vec_col, scale=scale)

    def assign_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        a = _assign(_quantize(batch, vec_col, scale), final)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster": pa.array(a.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(assign_rows, batch_format="pyarrow", zero_copy_batch=True)


def kmeans_sql(
    table: str = "embeddings",
    *,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = _SCALE,
) -> str:
    """Unrolled-iteration oracle with identical quantization, tie-break and
    empty-cluster semantics."""
    parts = _kmeans_ctes(table, k=k, iters=iters, id_col=id_col, vec_col=vec_col, scale=scale)
    body = ",\n".join(parts)
    return f"""{body}
SELECT vec_id, CAST(cluster AS BIGINT) AS cluster FROM afinal ORDER BY vec_id""".strip()


def _kmeans_ctes(
    table: str,
    *,
    k: int,
    iters: int,
    id_col: str,
    vec_col: str,
    scale: float,
) -> list:
    """The shared CTE chain: quantized components ``q``, centroid tables
    ``c0..c{iters}``, final assignment ``afinal``."""
    parts = [
        f"""WITH q AS (
  SELECT {id_col} AS vec_id, i - 1 AS dim,
         CAST(floor(e * {int(scale)} + 0.5) AS BIGINT) AS v
  FROM (SELECT {id_col}, unnest({vec_col}) AS e,
               generate_subscripts({vec_col}, 1) AS i FROM {table})
),
c0 AS (SELECT vec_id AS cluster, dim, v FROM q WHERE vec_id < {k})"""
    ]
    for it in range(iters):
        cprev, a, cnext = f"c{it}", f"a{it}", f"c{it + 1}"
        parts.append(
            f"""{a} AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
    FROM (SELECT q.vec_id, c.cluster, sum((q.v - c.v) * (q.v - c.v)) AS dist
          FROM q JOIN {cprev} c ON q.dim = c.dim
          GROUP BY q.vec_id, c.cluster) d
  ) ranked WHERE rn = 1
),
{cnext} AS (
  SELECT c.cluster, c.dim, coalesce(n.v, c.v) AS v
  FROM {cprev} c LEFT JOIN (
    SELECT a.cluster, q.dim,
           CAST(floor(sum(q.v) * 1.0 / count(*) + 0.5) AS BIGINT) AS v
    FROM {a} a JOIN q ON q.vec_id = a.vec_id
    GROUP BY a.cluster, q.dim
  ) n ON n.cluster = c.cluster AND n.dim = c.dim
)"""
        )
    # final assignment against the last recomputed centroids
    parts.append(
        f"""afinal AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
    FROM (SELECT q.vec_id, c.cluster, sum((q.v - c.v) * (q.v - c.v)) AS dist
          FROM q JOIN c{iters} c ON q.dim = c.dim
          GROUP BY q.vec_id, c.cluster) d
  ) ranked WHERE rn = 1
)"""
    )
    return parts


def semantic_dedup(
    ds,
    *,
    k: int = 8,
    iters: int = 2,
    threshold_pct: int = 90,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = 10_000.0,
):
    """SemDeDup-style semantic dedup: flag each vector that has a LOWER-id
    vector in the same k-means cluster with cosine ≥ threshold.

    This is the order-free "dominator" variant of SemDeDup's greedy
    within-cluster pruning — a vector is a duplicate iff some lower-id
    cluster-mate dominates it, so every cluster partition can be judged
    independently and in parallel with one vectorized Gram-matrix pass
    (no sequential scan). Cosine comparison is exact integer arithmetic:
    with quantized components, ``cos(a,b) ≥ p/100`` ⟺
    ``100·dot² ≥ (p/10)²·|a|²·|b|² and dot > 0`` (``threshold_pct`` must be
    a multiple of 10 so the rational stays int64-safe; unit-norm vectors
    at scale 1e4 keep every term ≥9× under the int64 ceiling, asserted).

    Scale shape: one `kmeans_fit` (streaming passes, no shuffle), then ONE
    shuffle of quantized vectors into their clusters; within a cluster the
    pairwise Gram matrix is the SemDeDup cost model's intended O(|c|²·d).
    Output: ``(vec_id, cluster, is_dup)`` with is_dup ∈ {0,1} as BIGINT.
    """
    if threshold_pct % 10 != 0 or not (0 < threshold_pct <= 100):
        raise ValueError("threshold_pct must be a positive multiple of 10")
    num = (threshold_pct // 10) ** 2
    cent = kmeans_fit(ds, k=k, iters=iters, id_col=id_col, vec_col=vec_col, scale=scale)

    def tag(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        q = _quantize(batch, vec_col, scale)
        if q.size:
            nn = (q * q).sum(axis=1)
            if nn.max() > 250_000_000:
                raise ValueError(
                    "quantized norms exceed the int64-exact bound; lower `scale`"
                )
        a = _assign(q, cent) if q.size else np.array([], np.int64)
        return pa.table(
            {
                "cluster": pa.array(a.astype(np.int64), pa.int64()),
                "vec_id": pa.array(ids, pa.int64()),
                "q": pa.array(list(q), pa.list_(pa.int64())),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)

    def dedup_group(g: pd.DataFrame) -> pa.Table:
        ids = g["vec_id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        qm = np.stack(g["q"].to_numpy()[order]).astype(np.int64)
        gram = qm @ qm.T
        nn = np.diag(gram).copy()
        cond = (gram > 0) & (100 * gram * gram >= num * np.outer(nn, nn))
        is_dup = np.tril(cond, -1).any(axis=1)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster": pa.array(
                    g["cluster"].to_numpy()[order].astype(np.int64), pa.int64()
                ),
                "is_dup": pa.array(is_dup.astype(np.int64), pa.int64()),
            }
        )

    return tagged.groupby("cluster").map_groups(dedup_group, batch_format="pandas")


def semantic_dedup_sql(
    table: str = "embeddings",
    *,
    k: int = 8,
    iters: int = 2,
    threshold_pct: int = 90,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = 10_000.0,
) -> str:
    """Oracle: same dominator rule in exact HUGEINT arithmetic."""
    num = (threshold_pct // 10) ** 2
    parts = _kmeans_ctes(table, k=k, iters=iters, id_col=id_col, vec_col=vec_col, scale=scale)
    parts.append(
        """nrm AS (SELECT vec_id, sum(CAST(v AS HUGEINT) * v) AS nn FROM q GROUP BY vec_id)"""
    )
    parts.append(
        """dots AS (
  SELECT a.vec_id AS ai, b.vec_id AS bi, sum(CAST(qa.v AS HUGEINT) * qb.v) AS d
  FROM afinal a JOIN afinal b ON a.cluster = b.cluster AND b.vec_id < a.vec_id
  JOIN q qa ON qa.vec_id = a.vec_id
  JOIN q qb ON qb.vec_id = b.vec_id AND qb.dim = qa.dim
  GROUP BY a.vec_id, b.vec_id
)"""
    )
    parts.append(
        f"""dupd AS (
  SELECT DISTINCT d.ai AS vec_id
  FROM dots d
  JOIN nrm na ON na.vec_id = d.ai
  JOIN nrm nb ON nb.vec_id = d.bi
  WHERE d.d > 0 AND 100 * d.d * d.d >= {num} * na.nn * nb.nn
)"""
    )
    body = ",\n".join(parts)
    return f"""{body}
SELECT a.vec_id, CAST(a.cluster AS BIGINT) AS cluster,
       CAST(CASE WHEN dd.vec_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_dup
FROM afinal a LEFT JOIN dupd dd ON dd.vec_id = a.vec_id
ORDER BY a.vec_id""".strip()


def cluster_sample(
    ds,
    *,
    k: int = 8,
    iters: int = 2,
    n_per_cluster: int = 10,
    salt: int = 12345,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = _SCALE,
):
    """Cluster-balanced deterministic sampling: up to ``n_per_cluster``
    vectors per k-means cluster, chosen by smallest Knuth hash key
    (`ops/sampling.py` mechanism — a pure function of the id, so the sample
    is stable under any block layout). This is the diversity-preserving
    downsampling step cluster-curation pipelines run after semantic dedup:
    quota per topic bucket instead of a global uniform sample.

    Scale shape: assignment is shuffle-free; selection reuses
    `pipelines/relational.py:top_n_per_key`, whose map-side partial top-N
    caps the shuffle at N rows per cluster per block. Ids must be < 2^31
    (same bound as ops/sampling.py).
    """
    from ..pipelines.relational import top_n_per_key

    assigned = kmeans_assign(ds, k=k, iters=iters, id_col=id_col, vec_col=vec_col, scale=scale)

    def key_rows(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["vec_id"].combine_chunks())
        hkey = (ids * 2654435761 + salt) % (1 << 32)
        return t.append_column("hkey", pa.array(hkey.astype(np.int64), pa.int64()))

    keyed = assigned.map_batches(key_rows, batch_format="pyarrow", zero_copy_batch=True)
    picked = top_n_per_key(
        keyed, key="cluster", order_by=["hkey", "vec_id"], ascending=[True, True], n=n_per_cluster
    )

    def project(t: pa.Table) -> pa.Table:
        return t.select(["vec_id", "cluster"])

    return picked.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def cluster_sample_sql(
    table: str = "embeddings",
    *,
    k: int = 8,
    iters: int = 2,
    n_per_cluster: int = 10,
    salt: int = 12345,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = _SCALE,
) -> str:
    parts = _kmeans_ctes(table, k=k, iters=iters, id_col=id_col, vec_col=vec_col, scale=scale)
    parts.append(
        f"""keyed AS (
  SELECT vec_id, cluster,
         (vec_id * 2654435761 + {salt}) % 4294967296 AS hkey
  FROM afinal
)"""
    )
    body = ",\n".join(parts)
    return f"""{body}
SELECT vec_id, CAST(cluster AS BIGINT) AS cluster FROM (
  SELECT vec_id, cluster,
         row_number() OVER (PARTITION BY cluster ORDER BY hkey, vec_id) AS rn
  FROM keyed
) ranked WHERE rn <= {n_per_cluster}
ORDER BY vec_id""".strip()


def cluster_purity(
    ds,
    *,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    scale: float = _SCALE,
) -> pd.DataFrame:
    """Clustering-quality evaluation against ground-truth labels: purity
    (Σ_c max_l n_cl / N — the majority-vote accuracy of the clustering)
    and NMI (I(C;L) / √(H(C)·H(L))) of the ``kmeans_fit`` assignment —
    the dataset-card numbers that say whether topic buckets mean anything
    before cluster-balanced sampling trusts them.

    Exactness: the contingency table (cluster × label, bounded — one
    map_batches pass with broadcast centroids, driver fold) is exact
    integers; purity is the half-up fixed ratio; every information/entropy
    term nano-quantizes through ONE mirrored float expression
    ((n/N)·ln(...)) before the sums (the unigram_logprob rule), and the
    final NMI mirrors the two-sqrt denominator verbatim (never sqrt of the
    product). Returns one row ``(n, n_clusters, purity, nmi)``."""
    import math

    final = kmeans_fit(ds, k=k, iters=iters, id_col=id_col, vec_col=vec_col, scale=scale)

    def cont(batch: pa.Table) -> pa.Table:
        a = _assign(_quantize(batch, vec_col, scale), final)
        lab = np.asarray(batch[label_col].combine_chunks().cast(pa.int64()))
        df = pd.DataFrame({"cluster": a.astype(np.int64), "label": lab})
        g = df.groupby(["cluster", "label"], sort=False).size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = [
        b.to_pandas()
        for b in ds.map_batches(cont, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    cols = ["n", "n_clusters", "purity", "nmi"]
    if not parts:
        return pd.DataFrame(columns=cols)
    cl = pd.concat(parts, ignore_index=True).groupby(["cluster", "label"], sort=True, as_index=False)["n"].sum()
    if cl.empty:
        return pd.DataFrame(columns=cols)
    n_tot = int(cl["n"].sum())
    cc = cl.groupby("cluster")["n"].sum()
    ll = cl.groupby("label")["n"].sum()
    s_max = int(cl.groupby("cluster")["n"].max().sum())
    purity = ((2 * s_max * 1_000_000 + n_tot) // (2 * n_tot)) / 1e6
    i_fp = sum(
        int(math.floor(
            (float(r.n) / n_tot)
            * math.log((float(r.n) * n_tot) / (float(cc[r.cluster]) * ll[r.label]))
            * 1e9 + 0.5
        ))
        for r in cl.itertuples()
    )
    hc_fp = sum(
        int(math.floor((float(v) / n_tot) * math.log(float(n_tot) / v) * 1e9 + 0.5))
        for v in cc
    )
    hl_fp = sum(
        int(math.floor((float(v) / n_tot) * math.log(float(n_tot) / v) * 1e9 + 0.5))
        for v in ll
    )
    nmi = (
        round((i_fp / 1e9) / (math.sqrt(hc_fp / 1e9) * math.sqrt(hl_fp / 1e9)), 6) + 0.0
        if hc_fp > 0 and hl_fp > 0
        else None
    )
    return pd.DataFrame(
        {
            "n": np.array([n_tot], np.int64),
            "n_clusters": np.array([len(cc)], np.int64),
            "purity": [purity],
            "nmi": [nmi],
        }
    )


def cluster_purity_sql(
    table: str = "embeddings",
    *,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    scale: float = _SCALE,
) -> str:
    parts = _kmeans_ctes(table, k=k, iters=iters, id_col=id_col, vec_col=vec_col, scale=scale)
    parts.append(
        f"""lab AS (SELECT {id_col} AS vec_id, CAST({label_col} AS BIGINT) AS label FROM {table}),
cl AS (
  SELECT a.cluster, l.label, CAST(count(*) AS BIGINT) AS n
  FROM afinal a JOIN lab l USING (vec_id) GROUP BY 1, 2
),
cc AS (SELECT cluster, CAST(sum(n) AS BIGINT) AS n FROM cl GROUP BY 1),
ll AS (SELECT label, CAST(sum(n) AS BIGINT) AS n FROM cl GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM cl),
mx AS (SELECT CAST(sum(m) AS BIGINT) AS s
       FROM (SELECT cluster, max(n) AS m FROM cl GROUP BY 1)),
ifp AS (
  SELECT CAST(sum(CAST(floor(
           (CAST(cl.n AS DOUBLE) / t.n)
           * ln((CAST(cl.n AS DOUBLE) * t.n) / (CAST(cc.n AS DOUBLE) * ll.n))
           * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s
  FROM cl JOIN cc USING (cluster) JOIN ll USING (label) CROSS JOIN tot t
),
hcfp AS (
  SELECT CAST(sum(CAST(floor(
           (CAST(cc.n AS DOUBLE) / t.n) * ln(CAST(t.n AS DOUBLE) / cc.n) * 1e9 + 0.5
         ) AS BIGINT)) AS BIGINT) AS s
  FROM cc CROSS JOIN tot t
),
hlfp AS (
  SELECT CAST(sum(CAST(floor(
           (CAST(ll.n AS DOUBLE) / t.n) * ln(CAST(t.n AS DOUBLE) / ll.n) * 1e9 + 0.5
         ) AS BIGINT)) AS BIGINT) AS s
  FROM ll CROSS JOIN tot t
)"""
    )
    body = ",\n".join(parts)
    return f"""{body}
SELECT t.n AS n,
       (SELECT CAST(count(*) AS BIGINT) FROM cc) AS n_clusters,
       CAST((2 * CAST(m.s AS HUGEINT) * 1000000 + t.n)
            // (2 * CAST(t.n AS HUGEINT)) AS DOUBLE) / 1e6 AS purity,
       CASE WHEN hc.s > 0 AND hl.s > 0
            THEN round((CAST(i.s AS DOUBLE) / 1e9)
                       / (sqrt(CAST(hc.s AS DOUBLE) / 1e9)
                          * sqrt(CAST(hl.s AS DOUBLE) / 1e9)), 6) + 0.0
            ELSE NULL END AS nmi
FROM tot t CROSS JOIN mx m CROSS JOIN ifp i CROSS JOIN hcfp hc CROSS JOIN hlfp hl""".strip()
