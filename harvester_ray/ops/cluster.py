"""Near-duplicate clustering: connected components over candidate pairs.

The near-dup operators (`ops/dedup.py`) emit verified *pairs*
(doc_a, doc_b, jaccard); a corpus-level dedup needs the transitive closure of
those pairs — duplicate *clusters* — and one representative per cluster. The
reference keeps only one live document per identity and soft-deletes the rest
(`/root/reference/harvester/core/processors/seed/resource.py:98-105` upsert by
``srn``;
`/root/reference/harvester/core/models/datatypes/set.py:69-85` soft-delete
reconciliation); this module is the near-dup generalization of that rule:
cluster by similarity, keep the minimum doc_id, drop the rest.

Algorithm: hash-to-min connected components (Rastogi et al., "Finding
Connected Components in Map-Reduce in Logarithmic Rounds", ICDE 2013) over
the symmetrized edge list. Each round is ONE Ray Data shuffle of the edge
list keyed by a coarse node bucket; inside a bucket everything is vectorized
numpy (sort + reduceat). Rounds converge in O(log d) for component diameter
d — near-dup clusters are shallow (a dup of a dup of a dup...), so 2-4 rounds
in practice. Nothing is ever materialized on the driver: the driver sees only
per-round (row_count, label_checksum) scalars for the convergence test.

Scale notes (100 TB): the edge list is O(near-dup pairs), already a small
fraction of the corpus, and every round shuffles only (int64, int64) rows.
Labels only ever decrease, so the per-round sum of labels is a monotone
convergence witness: an unchanged (count, sum) pair implies every per-node
min is unchanged (each term is non-increasing), i.e. a fixed point.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_EDGE_SCHEMA = pa.schema(
    [("bucket", pa.int32()), ("node", pa.int64()), ("nbr", pa.int64())]
)


def _dedup_sorted_edges(node: np.ndarray, nbr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Lexsort (node, nbr) and drop duplicate rows. Returns sorted arrays."""
    order = np.lexsort((nbr, node))
    node, nbr = node[order], nbr[order]
    if node.size:
        keep = np.empty(node.size, dtype=bool)
        keep[0] = True
        keep[1:] = (node[1:] != node[:-1]) | (nbr[1:] != nbr[:-1])
        node, nbr = node[keep], nbr[keep]
    return node, nbr


def _edge_table(node: np.ndarray, nbr: np.ndarray, n_partitions: int) -> pa.Table:
    return pa.table(
        {
            "bucket": pa.array((node % n_partitions).astype(np.int32)),
            "node": pa.array(node, pa.int64()),
            "nbr": pa.array(nbr, pa.int64()),
        },
        schema=_EDGE_SCHEMA,
    )


def connected_components(
    pairs_ds,
    *,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    n_partitions: int = 64,
    max_rounds: int = 16,
):
    """(doc_a, doc_b) pairs → (doc_id, cluster_id) labels, fully distributed.

    ``cluster_id`` is the minimum doc id reachable from ``doc_id`` through
    the pair graph — the deterministic cluster representative. Only nodes
    that appear in at least one pair are labeled (isolated docs are their own
    trivial cluster; callers that need them join against the corpus, see
    ``dedup_corpus``). Returns a Ray Dataset sorted by nothing — callers
    sort/limit as needed.
    """
    import ray.data  # noqa: F401  (Dataset methods on pairs_ds)

    def seed_edges(t: pa.Table) -> pa.Table:
        a = np.asarray(t[a_col].combine_chunks().cast(pa.int64()))
        b = np.asarray(t[b_col].combine_chunks().cast(pa.int64()))
        # symmetric edges + self-loops keep every member present each round
        node = np.concatenate([a, b, a, b])
        nbr = np.concatenate([b, a, a, b])
        return _edge_table(node, nbr, n_partitions)

    def hash_to_min(g: pd.DataFrame) -> pa.Table:
        node = g["node"].to_numpy(dtype=np.int64)
        nbr = g["nbr"].to_numpy(dtype=np.int64)
        node, nbr = _dedup_sorted_edges(node, nbr)
        if not node.size:
            return _EDGE_SCHEMA.empty_table()
        uniq, starts = np.unique(node, return_index=True)
        counts = np.diff(np.append(starts, node.size))
        mins = nbr[starts]  # nbr ascending within node ⇒ min is first
        # hash-to-min emission: (m → v) AND (v → m) for every v ∈ N(u)∪{u}
        m_rep = np.repeat(mins, counts)
        out_node = np.concatenate([m_rep, nbr])
        out_nbr = np.concatenate([nbr, m_rep])
        out_node, out_nbr = _dedup_sorted_edges(out_node, out_nbr)
        return _edge_table(out_node, out_nbr, n_partitions)

    def labels_of(g: pd.DataFrame) -> pa.Table:
        node = g["node"].to_numpy(dtype=np.int64)
        nbr = g["nbr"].to_numpy(dtype=np.int64)
        order = np.lexsort((nbr, node))
        node, nbr = node[order], nbr[order]
        uniq, starts = np.unique(node, return_index=True)
        return pa.table(
            {
                "doc_id": pa.array(uniq, pa.int64()),
                "cluster_id": pa.array(nbr[starts], pa.int64()),
            }
        )

    edges = pairs_ds.map_batches(
        seed_edges, batch_format="pyarrow", zero_copy_batch=True
    )
    prev_sig: tuple[int, int] | None = None
    labels = None
    for _ in range(max_rounds):
        edges = (
            edges.groupby("bucket").map_groups(hash_to_min, batch_format="pandas")
        ).materialize()
        labels = edges.groupby("bucket").map_groups(
            labels_of, batch_format="pandas"
        ).materialize()
        # monotone witness: labels only decrease, so equal (count, sum) ⇒ fixed point
        sig = (labels.count(), int(labels.sum("cluster_id") or 0))
        if sig == prev_sig:
            break
        prev_sig = sig
    return labels.select_columns(["doc_id", "cluster_id"])


def dedup_corpus(
    docs_ds,
    pairs_ds,
    *,
    id_col: str = "doc_id",
    n_partitions: int = 64,
    strategy: str = "auto",
    broadcast_max_drops: int = 50_000_000,
):
    """Corpus-level near-dup removal: keep one representative per cluster.

    The survivor set is the corpus minus every clustered doc whose id is not
    its cluster's minimum — the near-dup analog of the reference's
    upsert-by-identity rule (one live document per ``srn``,
    `/root/reference/harvester/core/processors/seed/resource.py:98-105`).

    Two drop-application strategies (``strategy``):

    - ``"broadcast"``: fold the drop ids into one sorted int64 array,
      ``ray.put`` it once, and filter the corpus with a streaming
      map_batches searchsorted — the corpus text never enters a shuffle.
      Valid while the duplicate set fits one array (``broadcast_max_drops``,
      default 50M ids = 400 MB — comfortably inside a worker heap).
    - ``"shuffle"``: bucketed anti-join (union + per-bucket filter) — no
      bound on the duplicate set, but every corpus row (text included)
      crosses the exchange once.
    - ``"auto"`` (default): count the drops (labels are bounded by
      pair-referenced docs, so this is cheap) and broadcast when they fit.

    At 10^12-turn scale with per-node shards the broadcast bound is per
    partition-of-responsibility, so auto picks broadcast for realistic dup
    rates and degrades to the shuffle only on pathological corpora.
    """
    labels = connected_components(pairs_ds, n_partitions=n_partitions)
    drops = labels.map_batches(
        lambda t: t.filter(
            pa.compute.not_equal(t["doc_id"], t["cluster_id"])
        ).select(["doc_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    if strategy != "shuffle":
        import ray as _ray

        drops = drops.materialize()
        n_drops = drops.count()
        if strategy == "broadcast" or n_drops <= broadcast_max_drops:
            parts = [
                np.asarray(b["doc_id"].combine_chunks().cast(pa.int64()))
                for b in drops.iter_batches(batch_format="pyarrow")
            ]
            drop_ids = (
                np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)
            )
            handle = _ray.put(drop_ids)

            def keep(t: pa.Table) -> pa.Table:
                import ray as _ray_w

                d = _ray_w.get(handle)  # zero-copy shared-memory numpy
                keys = np.asarray(t[id_col].combine_chunks().cast(pa.int64()))
                idx = np.searchsorted(d, keys)
                hit = idx < d.size
                hit[hit] = d[idx[hit]] == keys[hit]
                return t.filter(pa.array(~hit))

            return docs_ds.map_batches(
                keep, batch_format="pyarrow", zero_copy_batch=True
            )

    doc_schema = docs_ds.schema().base_schema
    tag_schema = pa.schema(
        [("bucket", pa.int32()), ("is_drop", pa.bool_())]
        + [(f.name, f.type) for f in doc_schema]
    )

    def tag_docs(t: pa.Table) -> pa.Table:
        keys = np.asarray(t[id_col].combine_chunks().cast(pa.int64()))
        cols = [
            pa.array((keys % n_partitions).astype(np.int32)),
            pa.array(np.zeros(t.num_rows, dtype=bool)),
        ] + [t[f.name].combine_chunks().cast(f.type) for f in doc_schema]
        return pa.table(dict(zip(tag_schema.names, cols)), schema=tag_schema)

    def tag_drops(t: pa.Table) -> pa.Table:
        keys = np.asarray(t["doc_id"].combine_chunks().cast(pa.int64()))
        cols = [
            pa.array((keys % n_partitions).astype(np.int32)),
            pa.array(np.ones(t.num_rows, dtype=bool)),
        ]
        for f in doc_schema:
            if f.name == id_col:
                cols.append(pa.array(keys, f.type))
            else:
                cols.append(pa.nulls(t.num_rows, f.type))
        return pa.table(dict(zip(tag_schema.names, cols)), schema=tag_schema)

    def anti(g: pd.DataFrame) -> pa.Table:
        drop_ids = g.loc[g["is_drop"], id_col].to_numpy(dtype=np.int64)
        keep = g[~g["is_drop"] & ~g[id_col].isin(drop_ids)]
        out = keep.drop(columns=["bucket", "is_drop"])
        return pa.Table.from_pandas(out, schema=doc_schema, preserve_index=False)

    both = docs_ds.map_batches(
        tag_docs, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        drops.map_batches(tag_drops, batch_format="pyarrow", zero_copy_batch=True)
    )
    return both.groupby("bucket").map_groups(anti, batch_format="pandas")


def _pairs_cte(pairs_sql: str) -> str:
    """Wrap a pairs query (doc_a, doc_b, …) for use inside WITH RECURSIVE."""
    return f"SELECT doc_a, doc_b FROM ({pairs_sql})"


def cluster_sql(pairs_sql: str) -> str:
    """Oracle: connected-component labels via recursive reachability closure.

    ``pairs_sql`` is any query yielding (doc_a, doc_b[, …]) — e.g.
    ``dedup.ngram_jaccard_sql(...)``. Enumerates every reachable node per
    node (fine at oracle scale; clusters are small) and takes the min.
    """
    return f"""
WITH RECURSIVE nd_pairs AS ({_pairs_cte(pairs_sql)}),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM nd_pairs
  UNION
  SELECT doc_b, doc_a FROM nd_pairs
),
reach(node, r) AS (
  SELECT a, a FROM edges
  UNION
  SELECT reach.node, edges.b FROM reach JOIN edges ON reach.r = edges.a
)
SELECT node AS doc_id, min(r) AS cluster_id
FROM reach GROUP BY node ORDER BY doc_id
""".strip()


def dedup_corpus_sql(pairs_sql: str, table: str = "documents", *, id_col: str = "doc_id") -> str:
    """Oracle: corpus minus non-representative cluster members."""
    return f"""
WITH RECURSIVE nd_pairs AS ({_pairs_cte(pairs_sql)}),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM nd_pairs
  UNION
  SELECT doc_b, doc_a FROM nd_pairs
),
reach(node, r) AS (
  SELECT a, a FROM edges
  UNION
  SELECT reach.node, edges.b FROM reach JOIN edges ON reach.r = edges.a
),
drops AS (
  SELECT node FROM reach GROUP BY node HAVING min(r) <> node
)
SELECT * FROM {table} WHERE {id_col} NOT IN (SELECT node FROM drops)
ORDER BY {id_col}
""".strip()


def cluster_safe_split(
    docs_ds,
    pairs_ds,
    *,
    splits: dict[str, float] | None = None,
    salt: int = 424242,
    id_col: str = "doc_id",
):
    """Leakage-safe train/val/test split: every member of a near-dup
    cluster lands in the SAME split (the split hash keys on the cluster
    representative, not the doc), so eval examples can never have train-set
    near-duplicates — the splitting discipline LLM eval hygiene requires,
    and the reason plain per-doc hash splits (sampling.assign_split) are
    not enough once dedup finds cross-doc duplicates.

    Composition: hash-to-min connected components over the candidate pair
    stream → (doc, cluster) labels broadcast as sorted numpy arrays (labels
    are bounded by docs-appearing-in-pairs, a small fraction of the
    corpus); docs outside any pair are their own representative. One
    streaming pass tags docs; per batch only (split, rep)-distinct partials
    and counters leave. Returns (split, n_docs, n_clusters) per split."""
    import ray

    from . import sampling as _  # noqa: F401  (same-package convention)
    from .sampling import _hash_frac

    splits = splits or {"train": 0.8, "val": 0.1, "test": 0.1}
    names = list(splits)
    cuts = np.cumsum([splits[n] for n in names])
    cuts[-1] = 1.0 + 1e-9
    labels = connected_components(pairs_ds).to_pandas()
    lab_docs = labels["doc_id"].to_numpy(np.int64)
    lab_reps = labels["cluster_id"].to_numpy(np.int64)
    order = np.argsort(lab_docs)
    ref = ray.put((lab_docs[order], lab_reps[order]))

    def tag(t: pa.Table) -> pa.Table:
        ld, lr = ray.get(ref)
        ids = np.asarray(t[id_col].combine_chunks().cast(pa.int64()))
        idx = np.searchsorted(ld, ids)
        idx_c = np.clip(idx, 0, max(ld.size - 1, 0))
        hit = (ld.size > 0) & (ld[idx_c] == ids)
        rep = np.where(hit, lr[idx_c] if ld.size else ids, ids)
        frac = _hash_frac(rep, salt)
        sidx = np.searchsorted(cuts, frac, side="right")
        # batch-local distinct (split, rep) partial — lexsort + boundary
        # diff, no packed-key range assumption on doc ids
        o = np.lexsort((rep, sidx))
        rs, ss = rep[o], sidx[o]
        new = np.ones(rs.size, dtype=bool)
        new[1:] = (rs[1:] != rs[:-1]) | (ss[1:] != ss[:-1])
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, rs.size))
        return pa.table({
            "split": pa.array(
                np.array(names, dtype=object)[ss[starts]], pa.string()
            ),
            "rep": pa.array(rs[starts], pa.int64()),
            "n_docs": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    parts = docs_ds.map_batches(
        tag, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    import pandas as pd

    if parts.empty:
        return pd.DataFrame({
            "split": pd.Series(dtype=object),
            "n_docs": pd.Series(dtype=np.int64),
            "n_clusters": pd.Series(dtype=np.int64),
        })
    g = parts.groupby(["split", "rep"], as_index=False)["n_docs"].sum()
    out = g.groupby("split", as_index=False).agg(
        n_docs=("n_docs", "sum"), n_clusters=("rep", "nunique")
    )
    out = out.sort_values("split").reset_index(drop=True)
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["n_clusters"] = out["n_clusters"].astype(np.int64)
    return out


def cluster_safe_split_sql(
    pairs_sql: str,
    table: str = "documents",
    *,
    splits: dict[str, float] | None = None,
    salt: int = 424242,
    id_col: str = "doc_id",
) -> str:
    """Oracle for cluster_safe_split: recursive-closure labels, identical
    representative hash and range cuts."""
    from .sampling import _sql_frac

    splits = splits or {"train": 0.8, "val": 0.1, "test": 0.1}
    names = list(splits)
    cuts = np.cumsum([splits[n] for n in names])
    frac = _sql_frac("rep", salt)
    cases = " ".join(
        f"WHEN {frac} < {cuts[i]!r} THEN '{names[i]}'"
        for i in range(len(names) - 1)
    )
    split_expr = f"CASE {cases} ELSE '{names[-1]}' END"
    return f"""
WITH RECURSIVE nd_pairs AS ({_pairs_cte(pairs_sql)}),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM nd_pairs
  UNION
  SELECT doc_b, doc_a FROM nd_pairs
),
reach(node, r) AS (
  SELECT a, a FROM edges
  UNION
  SELECT reach.node, edges.b FROM reach JOIN edges ON reach.r = edges.a
),
labels AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node),
rep_t AS (
  SELECT d.{id_col} AS doc_id, coalesce(l.cluster_id, d.{id_col}) AS rep
  FROM {table} d LEFT JOIN labels l ON d.{id_col} = l.doc_id
),
tagged AS (SELECT doc_id, rep, {split_expr} AS split FROM rep_t)
SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT rep) AS BIGINT) AS n_clusters
FROM tagged GROUP BY split ORDER BY split
""".strip()
