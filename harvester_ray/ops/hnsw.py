"""Graph-based ANN serving tier: per-shard deterministic HNSW.

The reference serves kNN through OpenSearch, whose Lucene codec builds one
HNSW graph PER SEGMENT and fans queries out across segments
(`search/models/index.py:94-111` delegates everything past the bulk push).
This module is the Ray-native re-expression of that layout (VERDICT r3
item 6): vectors are hash-bucketed into shards, ONE Ray task per shard
builds a small-world graph (embarrassingly parallel — the same reason
Lucene scopes graphs to segments: global graph builds don't distribute),
and queries fan out over shard graphs through an actor pool that loads
each graph once, merging per-shard top-k exactly like ``QueryService``.

Determinism (the repo's resume/partition-independence discipline — no RNG
anywhere):

- shard assignment: ``crc32-style integer hash of vec_id % n_shards`` —
  independent of block layout;
- level assignment: the standard geometric level draw with the uniform
  replaced by a vec_id hash, ``level = floor(-ln(u(id)) / ln(M))`` (Malkov
  & Yashunin 2016, §4.1 — public algorithm);
- insertion order: ascending vec_id within the shard;
- every candidate ordering ties on (distance, id).

So the graph — and therefore every query result — is a pure function of
(shard membership, M, ef_construction), byte-stable across runs, resumes
and repartitions.

Scale shape: build is one task per shard over that shard's vectors only
(O(n·ef·log n) per shard, shards in parallel); serving holds
``d·4 + M·8`` bytes per vector per actor and answers a query with
O(ef·M) vectorized distance evaluations — no corpus scan. Approximate by
design, so the driver gate is rows-only; recall is asserted against
``knn_brute`` in tests (the ``knn_ivf_pruned`` precedent) and the
recall/latency trade vs IVF-PQ is recorded in BASELINE.md.
"""

from __future__ import annotations

import heapq
import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .similarity import _batch_matrix, _normalize, _topk_reduce_ds

_HASH_P = 2654435761  # Knuth multiplicative (same constant family as packing)
_HASH_M = 2**32


def _id_hash(ids: np.ndarray) -> np.ndarray:
    return ((ids % _HASH_M) * _HASH_P) % _HASH_M


def _levels_for(ids: np.ndarray, m: int) -> np.ndarray:
    """Deterministic geometric level per vector: the HNSW level draw with
    u = (hash(id)+1)/2^32 instead of an RNG."""
    u = (_id_hash(ids).astype(np.float64) + 1.0) / float(_HASH_M)
    ml = 1.0 / math.log(m)
    return np.floor(-np.log(u) * ml).astype(np.int64)


def hnsw_partition(
    ds,
    out_dir: str,
    *,
    n_shards: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Hash-bucket the embedding table into ``shard=K`` parquet dirs (the
    ``ivf_partition`` layout, but layout-independent hash buckets instead
    of centroid clusters — graph quality needs iid samples per shard, not
    geometric ones). Streaming pass, no shuffle: each block appends to its
    buckets' files."""

    def assign(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col].combine_chunks().cast(pa.int64()))
        shard = (_id_hash(ids) % n_shards).astype(np.int64)
        return t.append_column("shard", pa.array(shard, pa.int64()))

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["shard"]
    )
    _write_manifest(
        os.path.join(out_dir, _PART_MANIFEST),
        {"n_shards": n_shards, "id_col": id_col, "vec_col": vec_col},
    )
    return out_dir


# Completion/params sentinels: a crashed partial run leaves no manifest, and
# a params change (n_shards/m/...) mismatches it — either way the artifacts
# are rebuilt instead of silently reused (the build-fingerprint discipline of
# index/build.py applied to the ANN scratch dirs).
_PART_MANIFEST = "partition.manifest.json"
_BUILD_MANIFEST = "hnsw.manifest.json"


def _write_manifest(path: str, params: dict) -> None:
    import json

    with open(path + ".tmp", "w") as f:
        json.dump(params, f)
    os.replace(path + ".tmp", path)


def _manifest_matches(path: str, params: dict) -> bool:
    import json

    try:
        with open(path) as f:
            return json.load(f) == params
    except (OSError, ValueError):
        return False


class _ShardGraph:
    """One shard's HNSW graph over L2-normalized vectors (cosine space).

    Layers are dense int32 neighbor tables padded with -1; ``vecs`` is the
    (n, d) float32 matrix in local-index order; ``ids`` maps local index →
    vec_id."""

    def __init__(self, ids: np.ndarray, vecs: np.ndarray, m: int, ef_construction: int):
        order = np.argsort(ids, kind="stable")
        self.ids = ids[order].astype(np.int64)
        self.vecs = _normalize(vecs[order]).astype(np.float32)
        self.m = int(m)
        self.m0 = 2 * int(m)  # level-0 degree, the Lucene/hnswlib default
        self.ef_c = int(ef_construction)
        n = self.ids.size
        self.levels = _levels_for(self.ids, self.m)
        max_level = int(self.levels.max()) if n else 0
        # neighbors[l]: (n, m or m0) int32, -1 padded
        self.neighbors = [
            np.full((n, self.m0 if l == 0 else self.m), -1, np.int32)
            for l in range(max_level + 1)
        ]
        self.entry = -1
        self.entry_level = -1
        for i in range(n):
            self._insert(i)

    # -- construction ------------------------------------------------------

    def _dist(self, q: np.ndarray, idx: np.ndarray) -> np.ndarray:
        # cosine distance = 1 - dot over unit vectors; float64 accumulate
        return 1.0 - self.vecs[idx].astype(np.float64) @ q

    def _search_layer(self, q: np.ndarray, eps: list[int], ef: int, level: int):
        """Best-first search: returns [(dist, idx)] of ≤ ef closest,
        ascending. Every ordering ties on (dist, idx) — res is a max-heap
        keyed (-dist, -idx) so equal-distance eviction drops the LARGER
        id, keeping results deterministic."""
        nbrs = self.neighbors[level]
        visited = set(eps)
        d0 = self._dist(q, np.array(eps, np.int64))
        cand = [(float(d), int(i)) for d, i in zip(d0, eps)]
        heapq.heapify(cand)
        res = [(-d, -i) for d, i in cand]
        heapq.heapify(res)
        while len(res) > ef:
            heapq.heappop(res)
        while cand:
            d, c = heapq.heappop(cand)
            if len(res) >= ef and (d, c) > (-res[0][0], -res[0][1]):
                break
            nb = nbrs[c]
            nb = nb[nb >= 0]
            fresh = [int(x) for x in nb if int(x) not in visited]
            if not fresh:
                continue
            visited.update(fresh)
            fd = self._dist(q, np.array(fresh, np.int64))
            for dd, ii in zip(fd.tolist(), fresh):
                if len(res) < ef or (dd, ii) < (-res[0][0], -res[0][1]):
                    heapq.heappush(cand, (dd, ii))
                    heapq.heappush(res, (-dd, -ii))
                    if len(res) > ef:
                        heapq.heappop(res)
        return sorted((-nd, -ni) for nd, ni in res)

    def _select(self, cands, m: int) -> list[int]:
        """Malkov & Yashunin Algorithm 4 (SELECT-NEIGHBORS-HEURISTIC):
        keep a candidate only if it is closer to q than to every
        already-kept neighbor — the diversity rule that preserves
        long-range links. Plain closest-M measured recall@10 = 0.08 on a
        200k-vector noisy shard set (graph loses navigability); with the
        heuristic the same sweep is ≥0.95. Iteration is ascending
        (dist, id), so selection is deterministic; pruned-but-closest
        candidates pad the list if fewer than m survive
        (keepPrunedConnections)."""
        sel: list[int] = []
        for d, i in cands:
            if len(sel) >= m:
                break
            vi = self.vecs[i].astype(np.float64)
            diverse = True
            for j in sel:
                dij = 1.0 - float(self.vecs[j].astype(np.float64) @ vi)
                if dij < d:
                    diverse = False
                    break
            if diverse:
                sel.append(i)
        if len(sel) < m:
            have = set(sel)
            for _, i in cands:
                if i not in have:
                    sel.append(i)
                    have.add(i)
                    if len(sel) >= m:
                        break
        return sel

    def _insert(self, i: int) -> None:
        l = int(self.levels[i])
        if self.entry < 0:
            self.entry, self.entry_level = i, l
            return
        q = self.vecs[i].astype(np.float64)
        ep = [self.entry]
        for lc in range(self.entry_level, l, -1):
            ep = [self._search_layer(q, ep, 1, min(lc, len(self.neighbors) - 1))[0][1]]
        for lc in range(min(l, self.entry_level), -1, -1):
            cands = self._search_layer(q, ep, self.ef_c, lc)
            mmax = self.m0 if lc == 0 else self.m
            sel = self._select(cands, mmax)
            nbrs = self.neighbors[lc]
            nbrs[i, : len(sel)] = sel
            # bidirectional links; over-full lists re-pruned with the SAME
            # diversity heuristic (hnswlib does likewise — closest-only
            # pruning re-introduces the navigability failure sideways)
            for j in sel:
                row = nbrs[j]
                slot = np.flatnonzero(row < 0)
                if slot.size:
                    row[slot[0]] = i
                else:
                    cur = row[row >= 0].astype(np.int64)
                    allc = np.append(cur, i)
                    dd = self._dist(self.vecs[j].astype(np.float64), allc)
                    keep = self._select(sorted(zip(dd.tolist(), allc.tolist())), mmax)
                    row[:] = -1
                    row[: len(keep)] = keep
            ep = [i for _, i in cands]
        if l > self.entry_level:
            self.entry, self.entry_level = i, l

    # -- serving -----------------------------------------------------------

    def search(self, q: np.ndarray, k: int, ef: int):
        if self.entry < 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        qn = np.asarray(q, np.float64)
        qn = qn / (np.linalg.norm(qn) or 1.0)
        ep = [self.entry]
        for lc in range(self.entry_level, 0, -1):
            ep = [self._search_layer(qn, ep, 1, lc)[0][1]]
        res = self._search_layer(qn, ep, max(ef, k), 0)[:k]
        idx = np.array([i for _, i in res], np.int64)
        sims = 1.0 - np.array([d for d, _ in res], np.float64)
        return self.ids[idx], sims

    # -- persistence -------------------------------------------------------

    def save(self, path: str) -> None:
        arrs = {
            "ids": self.ids,
            "vecs": self.vecs,
            "levels": self.levels,
            "meta": np.array([self.m, self.ef_c, self.entry, self.entry_level], np.int64),
        }
        for l, nb in enumerate(self.neighbors):
            arrs[f"nb{l}"] = nb
        np.savez_compressed(path + ".tmp.npz", **arrs)
        os.replace(path + ".tmp.npz", path)

    @classmethod
    def load(cls, path: str) -> "_ShardGraph":
        z = np.load(path)
        g = cls.__new__(cls)
        g.ids = z["ids"]
        g.vecs = z["vecs"]
        g.levels = z["levels"]
        m, ef_c, entry, entry_level = (int(x) for x in z["meta"])
        g.m, g.ef_c, g.entry, g.entry_level = m, ef_c, entry, entry_level
        g.m0 = 2 * m
        g.neighbors = []
        l = 0
        while f"nb{l}" in z:
            g.neighbors.append(z[f"nb{l}"])
            l += 1
        return g


def hnsw_build(
    part_dir: str,
    *,
    m: int = 8,
    ef_construction: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Build one graph per ``shard=K`` dir — one Ray task each, parallel
    across shards (the per-segment Lucene shape). Writes
    ``shard-K.hnsw.npz`` next to the partitions. Idempotent on a COMPLETED
    matching build (manifest check); on params mismatch or a missing/partial
    manifest every ``*.hnsw.npz`` (including orphans from a previous
    n_shards) is removed and rebuilt."""
    import ray

    shards = sorted(
        d for d in os.listdir(part_dir)
        if d.startswith("shard=") and os.path.isdir(os.path.join(part_dir, d))
    )
    params = {
        "shards": shards, "m": m, "ef_construction": ef_construction,
        "id_col": id_col, "vec_col": vec_col,
    }
    manifest = os.path.join(part_dir, _BUILD_MANIFEST)
    if _manifest_matches(manifest, params):
        return part_dir
    for f in os.listdir(part_dir):
        if f.endswith(".hnsw.npz"):
            os.remove(os.path.join(part_dir, f))

    @ray.remote
    def build_one(shard_dir: str, out_path: str) -> str:
        import pyarrow.dataset as pads

        tbl = pads.dataset(shard_dir).to_table(columns=[id_col, vec_col])
        ids = np.asarray(tbl[id_col].combine_chunks().cast(pa.int64()))
        vecs = _batch_matrix(tbl, vec_col)
        g = _ShardGraph(ids, vecs, m, ef_construction)
        g.save(out_path)
        return out_path

    futures = []
    for d in shards:
        out = os.path.join(part_dir, f"{d.replace('=', '-')}.hnsw.npz")
        futures.append(build_one.remote(os.path.join(part_dir, d), out))
    ray.get(futures)
    _write_manifest(manifest, params)
    return part_dir


class HnswService:
    """Serving pool: each actor loads a subset of shard graphs once
    (``QueryService`` shape); a query fans out and merges per-actor top-k.
    Call ``shutdown()`` before running Dataset pipelines in-process (the
    QueryService CPU-reservation rule)."""

    def __init__(self, part_dir: str, num_actors: int = 2):
        import ray

        graph_files = sorted(
            os.path.join(part_dir, f)
            for f in os.listdir(part_dir)
            if f.endswith(".hnsw.npz")
        )
        if not graph_files:
            raise FileNotFoundError(
                f"no *.hnsw.npz shard graphs under {part_dir!r} — run "
                "hnsw_build(part_dir) first"
            )
        num_actors = max(1, min(num_actors, len(graph_files)))
        groups = [graph_files[i::num_actors] for i in range(num_actors)]

        @ray.remote(num_cpus=1)
        class ShardActor:
            def __init__(self, paths: list[str]):
                self.graphs = [_ShardGraph.load(p) for p in paths]

            def search(self, q: np.ndarray, k: int, ef: int):
                ids, sims = [], []
                for g in self.graphs:
                    i, s = g.search(q, k, ef)
                    ids.append(i)
                    sims.append(s)
                return np.concatenate(ids), np.concatenate(sims)

        self.actors = [ShardActor.remote(g) for g in groups]

    def search(self, query_vec: np.ndarray, k: int = 10, ef: int = 64) -> pa.Table:
        import ray

        parts = ray.get([a.search.remote(query_vec, k, ef) for a in self.actors])
        ids = np.concatenate([p[0] for p in parts])
        sims = np.concatenate([p[1] for p in parts])
        order = np.lexsort((ids, -sims))[:k]
        return pa.table({
            "vec_id": pa.array(ids[order], pa.int64()),
            "cosine": pa.array(np.round(sims[order], 6), pa.float64()),
        })

    def shutdown(self) -> None:
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []


def knn_hnsw(
    ds,
    query_vecs: np.ndarray,
    k: int = 10,
    *,
    n_shards: int = 4,
    m: int = 8,
    ef_construction: int = 64,
    ef: int = 64,
    work_dir: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """One-call batch entry: partition → per-shard graph build → fan-out
    search for each query vector. Approximate (rows-only gate; recall
    asserted in tests vs knn_brute). Returns (query_id, vec_id, cosine)
    like the other kNN variants, cosine rounded 6, ties by vec_id."""
    import tempfile

    import ray

    wd = work_dir or tempfile.mkdtemp(prefix="hnsw-", dir="/tmp")
    part = os.path.join(wd, "parts")
    part_params = {"n_shards": n_shards, "id_col": id_col, "vec_col": vec_col}
    if not _manifest_matches(os.path.join(part, _PART_MANIFEST), part_params):
        # missing/partial/mismatched partitioning: wipe and redo (a crashed
        # partial write or an n_shards change must never be reused)
        if os.path.isdir(part):
            import shutil

            shutil.rmtree(part)
        hnsw_partition(ds, part, n_shards=n_shards, id_col=id_col, vec_col=vec_col)
    hnsw_build(part, m=m, ef_construction=ef_construction, id_col=id_col, vec_col=vec_col)

    graph_files = sorted(
        os.path.join(part, f) for f in os.listdir(part) if f.endswith(".hnsw.npz")
    )
    q = np.atleast_2d(np.asarray(query_vecs, np.float64))

    @ray.remote
    def search_shard(path: str) -> pa.Table:
        g = _ShardGraph.load(path)
        rq, rv, rs = [], [], []
        for qi in range(q.shape[0]):
            ids, sims = g.search(q[qi], k, ef)
            rq.append(np.full(ids.size, qi, np.int64))
            rv.append(ids)
            rs.append(sims)
        return pa.table({
            "query_id": pa.array(np.concatenate(rq), pa.int64()),
            "vec_id": pa.array(np.concatenate(rv), pa.int64()),
            "cosine": pa.array(np.concatenate(rs), pa.float64()),
        })

    parts_tbl = pa.concat_tables(ray.get([search_shard.remote(p) for p in graph_files]))
    import ray.data as rd

    return _topk_reduce_ds(rd.from_arrow(parts_tbl), k)
