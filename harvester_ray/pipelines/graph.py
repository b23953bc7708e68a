"""Distributed PageRank over an edge Dataset (iterative graph operator).

The web-scale iterative primitive the Dataset API lacks as a built-in:
rank flows along edges for a fixed number of rounds, with damping and
dangling-mass redistribution (Page et al. 1999; the MapReduce formulation
of Dean & Ghemawat's lineage). The reference's closest analog is its
metadata-vocab ancestor traversal (a fixed-depth graph walk,
/root/reference/harvester/metadata/utils/operations.py); PageRank is the
general fixed-point version over an arbitrary edge table.

Scale shape per iteration: the EDGE dataset streams through one
``map_batches`` that pre-reduces contributions per destination inside the
batch (integer partial sums — exact under any order), then a
destination-cardinality ``groupby.sum``. The rank vector itself rides as a
broadcast numpy pair (sorted node ids, ranks — the CLAUDE.md broadcast
rule); past ~10^9 nodes, swap the broadcast for a bucketed rank join keyed
like the edges, the iteration structure is unchanged. Edges are
materialized once and re-streamed each round (no re-read / re-join per
iteration).

Exact oracle parity for an iterative float algorithm: every cross-row sum
is computed in FIXED-POINT — per-edge contribution ``floor(r*1e12/deg +
0.5)`` summed as int64 — so no summation-order ulp drift exists for the
gate's unrolled-CTE SQL to disagree with; per-round ranks are re-quantized
to 12 decimals on both sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_SCALE = 1_000_000_000_000.0  # 1e12 fixed-point


def pagerank(
    edges_ds,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    n_iter: int = 5,
):
    """PageRank over a directed edge Dataset (edges need not be distinct —
    they are deduplicated here). Returns a DataFrame (node, rank) with rank
    rounded to 8 decimals, summing to ~1. Nodes = all srcs ∪ dsts; nodes
    with no out-edges are dangling and redistribute their mass uniformly.
    """
    import ray

    edges = edges_ds.groupby([src_col, dst_col]).count().drop_columns(["count()"])
    edges = edges.materialize()

    # node universe + out-degrees: two tiny aggregates over the edge set
    deg_df = edges.groupby(src_col).count().to_pandas()
    srcs = deg_df[src_col].to_numpy(dtype=np.int64)
    degs = deg_df["count()"].to_numpy(dtype=np.int64)
    dsts = edges.groupby(dst_col).count().to_pandas()[dst_col].to_numpy(dtype=np.int64)
    nodes = np.unique(np.concatenate([srcs, dsts]))
    n = int(nodes.size)
    if n == 0:
        return pd.DataFrame({"node": pd.Series(dtype=np.int64), "rank": pd.Series(dtype=np.float64)})

    deg_full = np.zeros(n, dtype=np.int64)
    deg_full[np.searchsorted(nodes, srcs)] = degs
    dangling = deg_full == 0

    rank = np.round(np.full(n, 1.0 / n), 12)
    for _ in range(n_iter):
        # per-edge fixed-point contribution, order-independent integer sums
        per_src = np.zeros(n, dtype=np.int64)
        nz = ~dangling
        per_src[nz] = np.floor(rank[nz] * _SCALE / deg_full[nz] + 0.5).astype(np.int64)
        ref = ray.put((nodes, per_src))

        def contrib(t: pa.Table) -> pa.Table:
            nd, ps = ray.get(ref)
            s = np.asarray(t[src_col].combine_chunks().cast(pa.int64()))
            d = np.asarray(t[dst_col].combine_chunks().cast(pa.int64()))
            ci = ps[np.searchsorted(nd, s)]
            dpos, inv = np.unique(d, return_inverse=True)
            sums = np.zeros(dpos.size, dtype=np.int64)
            np.add.at(sums, inv, ci)  # int64 accumulate: exact (bincount's
            # float64 weights would round above 2^53)
            return pa.table(
                {
                    "node": pa.array(dpos, pa.int64()),
                    "ci": pa.array(sums, pa.int64()),
                }
            )

        # partials are ≤ distinct-dsts-per-batch rows; the rank vector is
        # driver-resident by construction (it's broadcast every round), so
        # folding partials on the driver is O(nodes × blocks) and saves the
        # per-round groupby execution. At >10^9 nodes the bucketed-join
        # variant replaces both the broadcast and this fold together.
        agg = edges.map_batches(
            contrib, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()
        contrib_full = np.zeros(n, dtype=np.int64)
        if len(agg):
            np.add.at(
                contrib_full,
                np.searchsorted(nodes, agg["node"].to_numpy(dtype=np.int64)),
                agg["ci"].to_numpy(dtype=np.int64),
            )
        dang_int = int(np.floor(rank[dangling] * _SCALE + 0.5).astype(np.int64).sum())
        rank = np.round(
            (1.0 - damping) / n
            + damping * (contrib_full / _SCALE + dang_int / _SCALE / n),
            12,
        )

    return pd.DataFrame({"node": nodes, "rank": np.round(rank, 8)})


def _customer_supplier_edges(sf_dir: str):
    """Customer→supplier order-graph edges: (c, s) whenever customer c's
    order contains a lineitem from supplier s; supplier nodes offset by
    1,000,000 to disambiguate the id spaces. The orders→custkey side rides
    as one broadcast array pair into the lineitem stream (same shape as
    hash_join_order_lineitem)."""
    import os

    import ray
    import ray.data as rd

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_custkey"]
    ).to_pandas()
    ok = orders["o_orderkey"].to_numpy(dtype=np.int64)
    order = np.argsort(ok)
    ref = ray.put((ok[order], orders["o_custkey"].to_numpy(dtype=np.int64)[order]))

    def to_edges(t: pa.Table) -> pa.Table:
        keys, custs = ray.get(ref)
        lk = np.asarray(t["l_orderkey"].combine_chunks().cast(pa.int64()))
        sk = np.asarray(t["l_suppkey"].combine_chunks().cast(pa.int64()))
        return pa.table(
            {
                "src": pa.array(custs[np.searchsorted(keys, lk)], pa.int64()),
                "dst": pa.array(sk + 1_000_000, pa.int64()),
            }
        )

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey", "l_suppkey"]
    )
    return li.map_batches(to_edges, batch_format="pyarrow", zero_copy_batch=True)


def customer_supplier_pagerank(sf_dir: str) -> pd.DataFrame:
    """Gate pipeline: PageRank over the customer→supplier order graph
    (:func:`_customer_supplier_edges`). Customers are sources, suppliers
    dangling — exercising both the contribution and the
    dangling-redistribution paths."""
    out = pagerank(_customer_supplier_edges(sf_dir), damping=0.85, n_iter=5)
    return out.sort_values("node").reset_index(drop=True)


def pagerank_sql(
    edges_sql: str, *, damping: float = 0.85, n_iter: int = 5
) -> str:
    """Oracle: identical fixed-point iteration as unrolled CTEs.

    ``edges_sql`` must yield distinct (src, dst) rows.
    """
    d = damping
    parts = [
        f"WITH edges AS ({edges_sql})",
        "nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM edges UNION SELECT dst FROM edges))",
        "outdeg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        "r0 AS (SELECT node, round(1.0 / (SELECT n FROM nn), 12) AS r FROM nodes)",
    ]
    for i in range(n_iter):
        rk, rk1 = f"r{i}", f"r{i + 1}"
        parts.append(
            f"""c{i} AS (
  SELECT e.dst AS node,
         sum(CAST(floor({rk}.r * 1000000000000.0 / od.deg + 0.5) AS BIGINT)) AS ci
  FROM edges e
  JOIN {rk} ON {rk}.node = e.src
  JOIN outdeg od ON od.node = e.src
  GROUP BY e.dst
)"""
        )
        parts.append(
            f"""g{i} AS (
  SELECT coalesce(sum(CAST(floor({rk}.r * 1000000000000.0 + 0.5) AS BIGINT)), 0) AS di
  FROM {rk} LEFT JOIN outdeg od ON od.node = {rk}.node
  WHERE od.node IS NULL
)"""
        )
        parts.append(
            f"""{rk1} AS (
  SELECT nodes.node,
         round((1.0 - {d!r}) / (SELECT n FROM nn)
               + {d!r} * (coalesce(c{i}.ci, 0) / 1000000000000.0
                          + (SELECT di FROM g{i}) / 1000000000000.0 / (SELECT n FROM nn)), 12) AS r
  FROM nodes LEFT JOIN c{i} ON c{i}.node = nodes.node
)"""
        )
    body = ",\n".join(parts)
    return f"{body}\nSELECT node, round(r, 8) AS rank FROM r{n_iter} ORDER BY node"


def hits(
    edges_ds,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 4,
):
    """HITS hubs/authorities (Kleinberg 1999) over a directed edge Dataset.

    Exact-parity fixed point: scores live as 1e-6 fixed-point int64; each
    half-step is an exact integer edge-sum (authority(j) = Σ hub(i) over
    in-edges, then hub(i) = Σ authority(j) over out-edges) renormalized by
    TRUNCATING division by the max component (DuckDB ``//``), so after T
    rounds both sides hold identical integer vectors — no ulp drift for
    the unrolled-CTE oracle to disagree with.

    Scale shape: edges are deduplicated once and re-streamed 2× per round
    through a map_batches that pre-reduces per-destination partial sums
    inside each batch; the score vector rides as a broadcast (nodes,
    values) numpy pair, folded on the driver exactly like :func:`pagerank`
    (same >10^9-node bucketed-join escape hatch). Returns a DataFrame
    (node, hub, authority) ordered by node.
    """
    import ray

    edges = edges_ds.groupby([src_col, dst_col]).count().drop_columns(["count()"])
    edges = edges.materialize()

    def _keys(col: str) -> np.ndarray:
        df = edges.groupby(col).count().to_pandas()
        # empty aggregate -> DataFrame with NO columns (Ray Data gotcha)
        if col not in df.columns:
            return np.empty(0, dtype=np.int64)
        return df[col].to_numpy(dtype=np.int64)

    srcs = _keys(src_col)
    dsts = _keys(dst_col)
    nodes = np.unique(np.concatenate([srcs, dsts]))
    n = int(nodes.size)
    if n == 0:
        return pd.DataFrame({
            "node": pd.Series(dtype=np.int64),
            "hub": pd.Series(dtype=np.float64),
            "authority": pd.Series(dtype=np.float64),
        })

    scale = 1_000_000  # int64 headroom: per-node edge sums ≤ 1e6·degree

    def edge_sum(key_col: str, other_col: str, vec: np.ndarray) -> np.ndarray:
        """One streaming pass: group Σ vec[other] by key, exact int64."""
        ref = ray.put((nodes, vec))

        def contrib(t: pa.Table) -> pa.Table:
            nd, vv = ray.get(ref)
            k = np.asarray(t[key_col].combine_chunks().cast(pa.int64()))
            o = np.asarray(t[other_col].combine_chunks().cast(pa.int64()))
            ci = vv[np.searchsorted(nd, o)]
            kpos, inv = np.unique(k, return_inverse=True)
            sums = np.zeros(kpos.size, dtype=np.int64)
            np.add.at(sums, inv, ci)
            return pa.table({
                "node": pa.array(kpos, pa.int64()),
                "v": pa.array(sums, pa.int64()),
            })

        agg = edges.map_batches(
            contrib, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()
        full = np.zeros(n, dtype=np.int64)
        if len(agg):
            np.add.at(
                full,
                np.searchsorted(nodes, agg["node"].to_numpy(dtype=np.int64)),
                agg["v"].to_numpy(dtype=np.int64),
            )
        return full

    def renorm(raw: np.ndarray) -> np.ndarray:
        m = int(raw.max())
        if m == 0:
            return raw
        # values are non-negative, so truncating == floor division here
        return (raw * scale) // m

    hub = np.full(n, scale, dtype=np.int64)
    auth = np.zeros(n, dtype=np.int64)
    for _ in range(n_iter):
        auth = renorm(edge_sum(dst_col, src_col, hub))
        hub = renorm(edge_sum(src_col, dst_col, auth))

    return pd.DataFrame({
        "node": nodes,
        "hub": hub.astype(np.float64) / float(scale),
        "authority": auth.astype(np.float64) / float(scale),
    })


def customer_supplier_hits(sf_dir: str) -> pd.DataFrame:
    """Gate pipeline: HITS over the same customer→supplier order graph as
    :func:`customer_supplier_pagerank` (bipartite: customers are pure
    hubs, suppliers pure authorities). From round 2 on, hub scores weight
    suppliers by popularity — distinct from plain out-degree (asserted in
    tests as the degeneracy probe)."""
    return hits(_customer_supplier_edges(sf_dir), n_iter=4)


def hits_sql(edges_sql: str, *, n_iter: int = 4) -> str:
    """Oracle: identical integer half-steps unrolled as MATERIALIZED CTEs
    (each raw-sum CTE is referenced twice — value + MAX subquery — and
    would re-expand exponentially if inlined; see ops/pca.py)."""
    parts = [
        f"WITH edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "nodes AS MATERIALIZED (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM edges UNION SELECT dst FROM edges))",
        "h0 AS (SELECT node, CAST(1000000 AS HUGEINT) AS v FROM nodes)",
    ]
    prev_h = "h0"
    for t in range(1, n_iter + 1):
        parts.append(
            f"""ar{t} AS MATERIALIZED (
  SELECT e.dst AS node, SUM(h.v) AS v FROM edges e
  JOIN {prev_h} h ON h.node = e.src GROUP BY e.dst
)"""
        )
        parts.append(
            f"""a{t} AS MATERIALIZED (
  SELECT nodes.node,
         coalesce((ar{t}.v * 1000000) // (SELECT MAX(v) FROM ar{t}), 0) AS v
  FROM nodes LEFT JOIN ar{t} ON ar{t}.node = nodes.node
)"""
        )
        parts.append(
            f"""hr{t} AS MATERIALIZED (
  SELECT e.src AS node, SUM(a.v) AS v FROM edges e
  JOIN a{t} a ON a.node = e.dst GROUP BY e.src
)"""
        )
        parts.append(
            f"""h{t} AS MATERIALIZED (
  SELECT nodes.node,
         coalesce((hr{t}.v * 1000000) // (SELECT MAX(v) FROM hr{t}), 0) AS v
  FROM nodes LEFT JOIN hr{t} ON hr{t}.node = nodes.node
)"""
        )
        prev_h = f"h{t}"
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT nodes.node AS node,\n"
        f"       CAST(h{n_iter}.v AS DOUBLE) / 1000000 AS hub,\n"
        f"       CAST(a{n_iter}.v AS DOUBLE) / 1000000 AS authority\n"
        f"FROM nodes JOIN h{n_iter} ON h{n_iter}.node = nodes.node\n"
        f"JOIN a{n_iter} ON a{n_iter}.node = nodes.node\n"
        f"ORDER BY node"
    )


def label_propagation(
    edges_ds,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 4,
):
    """Synchronous label propagation (Raghavan et al. 2007) over an
    UNDIRECTED view of the edge Dataset: labels start as node ids; each
    round every node adopts the most frequent label among its neighbors,
    ties broken by the smallest label. Deterministic by construction (no
    RNG, no visit order) — the asynchronous variant's order-dependence is
    exactly what an exact SQL oracle cannot mirror. Synchronous LPA can
    oscillate on bipartite graphs; use an even ``n_iter`` so two-sided
    graphs land on the stable customer-side assignment.

    Scale shape: edges are canonicalized (min,max) + deduplicated once and
    re-streamed per round through a map_batches that pre-reduces
    (node,label) pair counts inside each batch; the label vector rides as
    a broadcast numpy pair like :func:`pagerank` (same >10^9-node
    bucketed-join escape hatch, which would also move the per-round argmax
    into a keyed exchange). Returns (node, label) ordered by node.
    """
    import ray
    import ray.data as rd

    def canon(t: pa.Table) -> pa.Table:
        s = np.asarray(t[src_col].combine_chunks().cast(pa.int64()))
        d = np.asarray(t[dst_col].combine_chunks().cast(pa.int64()))
        keep = s != d  # drop self-loops
        s, d = s[keep], d[keep]
        return pa.table({
            "u": pa.array(np.minimum(s, d), pa.int64()),
            "w": pa.array(np.maximum(s, d), pa.int64()),
        })

    edges = (
        edges_ds.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["u", "w"]).count().drop_columns(["count()"])
        .materialize()
    )

    df = edges.groupby("u").count().to_pandas()
    us = df["u"].to_numpy(dtype=np.int64) if "u" in df.columns else np.empty(0, np.int64)
    df = edges.groupby("w").count().to_pandas()
    ws = df["w"].to_numpy(dtype=np.int64) if "w" in df.columns else np.empty(0, np.int64)
    nodes = np.unique(np.concatenate([us, ws]))
    n = int(nodes.size)
    if n == 0:
        return pd.DataFrame({
            "node": pd.Series(dtype=np.int64),
            "label": pd.Series(dtype=np.int64),
        })

    labels = nodes.copy()
    for _ in range(n_iter):
        ref = ray.put((nodes, labels))

        def pair_counts(t: pa.Table) -> pa.Table:
            nd, lb = ray.get(ref)
            u = np.asarray(t["u"].combine_chunks().cast(pa.int64()))
            w = np.asarray(t["w"].combine_chunks().cast(pa.int64()))
            node = np.concatenate([u, w])
            lbl = np.concatenate([lb[np.searchsorted(nd, w)],
                                  lb[np.searchsorted(nd, u)]])
            key = np.stack([node, lbl], axis=1)
            uniq, cnt = np.unique(key, axis=0, return_counts=True)
            return pa.table({
                "node": pa.array(uniq[:, 0], pa.int64()),
                "lbl": pa.array(uniq[:, 1], pa.int64()),
                "c": pa.array(cnt.astype(np.int64), pa.int64()),
            })

        agg = edges.map_batches(
            pair_counts, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()
        node_a = agg["node"].to_numpy(dtype=np.int64)
        lbl_a = agg["lbl"].to_numpy(dtype=np.int64)
        c_a = agg["c"].to_numpy(dtype=np.int64)
        # fold cross-block partials, then per-node argmax (cnt desc, lbl asc)
        key = np.stack([node_a, lbl_a], axis=1)
        uniq, inv = np.unique(key, axis=0, return_inverse=True)
        sums = np.zeros(uniq.shape[0], dtype=np.int64)
        np.add.at(sums, inv, c_a)
        order = np.lexsort((uniq[:, 1], -sums, uniq[:, 0]))
        un, ul, _ = uniq[order, 0], uniq[order, 1], sums[order]
        first = np.concatenate([[True], un[1:] != un[:-1]])
        labels = labels.copy()
        labels[np.searchsorted(nodes, un[first])] = ul[first]

    return pd.DataFrame({"node": nodes, "label": labels})


def label_propagation_sql(edges_sql: str, *, n_iter: int = 4) -> str:
    """Oracle: identical synchronous rounds unrolled as MATERIALIZED CTEs;
    per-node argmax via row_number() (count desc, label asc)."""
    parts = [
        f"WITH raw AS ({edges_sql})",
        "edges AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u, "
        "greatest(src, dst) AS w FROM raw WHERE src <> dst)",
        "nodes AS MATERIALIZED (SELECT DISTINCT node FROM "
        "(SELECT u AS node FROM edges UNION SELECT w FROM edges))",
        "lab0 AS (SELECT node, node AS lbl FROM nodes)",
    ]
    prev = "lab0"
    for t in range(1, n_iter + 1):
        parts.append(
            f"""cnt{t} AS MATERIALIZED (
  SELECT node, lbl, count(*) AS c FROM (
    SELECT e.u AS node, l.lbl AS lbl FROM edges e JOIN {prev} l ON l.node = e.w
    UNION ALL
    SELECT e.w, l.lbl FROM edges e JOIN {prev} l ON l.node = e.u
  ) GROUP BY node, lbl
)"""
        )
        parts.append(
            f"""lab{t} AS MATERIALIZED (
  SELECT node, lbl FROM (
    SELECT node, lbl,
           row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl ASC) AS rn
    FROM cnt{t}
  ) WHERE rn = 1
)"""
        )
        prev = f"lab{t}"
    body = ",\n".join(parts)
    return f"{body}\nSELECT node, lbl AS label FROM {prev} ORDER BY node"
