"""ANN serving-tier decision curve (VERDICT r3 item 6).

Measures recall@10 vs per-query latency for the two candidate serving
tiers over a deterministic clustered embedding corpus:

- per-shard HNSW graphs (ops/hnsw.py — the Lucene-per-segment shape), at
  ef ∈ {16, 32, 64, 128};
- in-memory IVF (deterministic k-means centroids, cluster-major vector
  arrays — the resident-serving analog of knn_ivf_partitioned), at
  nprobe ∈ {1, 2, 4, 8, 16, 32, 64, 128};
- exact brute matmul as the floor.

Both tiers are measured IN-PROCESS (no actor RPC) so the comparison is
pure algorithm cost; the ~4.5 ms RPC floor applies equally to either in
real serving. Ground truth is exact cosine top-10. Results go to stdout
as one JSON line; record the table in BASELINE.md.

Usage: python scripts/ann_curve.py [n_vectors] [dim]   (default 200000 64)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
D = int(sys.argv[2]) if len(sys.argv) > 2 else 64
N_QUERIES = 32
K = 10
N_SHARDS = 8
N_CENTROIDS = 256


def make_corpus(n: int, d: int, seed: int = 7):
    """Clustered Gaussian mixture (ANN is trivial on uniform noise): 512
    centers, per-point cluster draw + noise. Deterministic for a seed."""
    rng = np.random.default_rng(seed)
    n_centers = 512
    centers = rng.standard_normal((n_centers, d)).astype(np.float32)
    assign = rng.integers(0, n_centers, n)
    # noise comparable to center norm: clusters overlap heavily, so probe
    # selection and graph navigation are genuinely hard (0.35 noise made
    # nprobe=1 recall 1.0 — no separation to measure)
    vecs = centers[assign] + 0.9 * rng.standard_normal((n, d)).astype(np.float32)
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    return (vecs / np.maximum(norms, 1e-12)).astype(np.float32)


def main() -> None:
    from harvester_ray.ops.hnsw import _ShardGraph, _id_hash

    vecs = make_corpus(N, D)
    ids = np.arange(N, dtype=np.int64)
    rng = np.random.default_rng(99)
    qidx = rng.integers(0, N, N_QUERIES)
    queries = vecs[qidx] + 0.45 * rng.standard_normal((N_QUERIES, D)).astype(np.float32)
    queries = queries / np.linalg.norm(queries, axis=1, keepdims=True)

    # ---- exact ground truth + brute latency ------------------------------
    t0 = time.time()
    sims = queries.astype(np.float64) @ vecs.astype(np.float64).T
    truth = np.argsort(-sims, axis=1)[:, :K]
    brute_ms = (time.time() - t0) / N_QUERIES * 1000

    out = {"n": N, "d": D, "n_queries": N_QUERIES, "k": K,
           "brute_ms_per_query": round(brute_ms, 3)}

    # ---- HNSW: build per shard, sweep ef ---------------------------------
    shard_of = _id_hash(ids) % N_SHARDS
    t0 = time.time()
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=min(N_SHARDS, 8), include_dashboard=False)

    @ray.remote
    def _build(s: int) -> bytes:
        import pickle

        m = shard_of == s
        return pickle.dumps(_ShardGraph(ids[m], vecs[m], m=8, ef_construction=64))

    import pickle as _pkl

    graphs = [_pkl.loads(b) for b in ray.get([_build.remote(s) for s in range(N_SHARDS)])]
    ray.shutdown()
    hnsw_build_s = time.time() - t0
    out["hnsw"] = {"build_sec": round(hnsw_build_s, 1), "shards": N_SHARDS,
                   "m": 8, "ef_construction": 64, "sweep": {}}
    for ef in (16, 32, 64, 128):
        hits = 0
        t0 = time.time()
        for qi in range(N_QUERIES):
            got = []
            for g in graphs:
                gids, gsims = g.search(queries[qi], K, ef)
                got.extend(zip(gsims.tolist(), gids.tolist()))
            got = [i for _, i in sorted(got, key=lambda x: (-x[0], x[1]))[:K]]
            hits += len(set(got) & set(truth[qi].tolist()))
        ms = (time.time() - t0) / N_QUERIES * 1000
        out["hnsw"]["sweep"][str(ef)] = {
            "recall": round(hits / (N_QUERIES * K), 4),
            "ms_per_query": round(ms, 3),
        }

    # ---- IVF resident serving: centroids + cluster-major arrays ----------
    t0 = time.time()
    rngc = np.random.default_rng(3)
    cent = vecs[rngc.choice(N, N_CENTROIDS, replace=False)].astype(np.float64)
    for _ in range(6):  # Lloyd iterations, deterministic given the seed
        a = np.argmax(vecs.astype(np.float64) @ cent.T, axis=1)
        for c in range(N_CENTROIDS):
            m = a == c
            if m.any():
                v = vecs[m].astype(np.float64).mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    assign = np.argmax(vecs.astype(np.float64) @ cent.T, axis=1)
    order = np.argsort(assign, kind="stable")
    cm_vecs = vecs[order]
    cm_ids = ids[order]
    bounds = np.searchsorted(assign[order], np.arange(N_CENTROIDS + 1))
    ivf_build_s = time.time() - t0
    out["ivf"] = {"build_sec": round(ivf_build_s, 1),
                  "n_centroids": N_CENTROIDS, "sweep": {}}
    for nprobe in (1, 2, 4, 8, 16, 32, 64, 128):
        hits = 0
        t0 = time.time()
        for qi in range(N_QUERIES):
            cd = cent @ queries[qi].astype(np.float64)
            probe = np.argsort(-cd)[:nprobe]
            cand_sims, cand_ids = [], []
            for c in probe:
                lo, hi = bounds[c], bounds[c + 1]
                if hi > lo:
                    cand_sims.append(cm_vecs[lo:hi].astype(np.float64) @ queries[qi])
                    cand_ids.append(cm_ids[lo:hi])
            s = np.concatenate(cand_sims)
            i = np.concatenate(cand_ids)
            top = i[np.lexsort((i, -s))[:K]]
            hits += len(set(top.tolist()) & set(truth[qi].tolist()))
        ms = (time.time() - t0) / N_QUERIES * 1000
        out["ivf"]["sweep"][str(nprobe)] = {
            "recall": round(hits / (N_QUERIES * K), 4),
            "ms_per_query": round(ms, 3),
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
