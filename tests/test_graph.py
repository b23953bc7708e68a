"""Distributed PageRank (pipelines/graph.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from harvester_ray.pipelines import graph


def _edges(pairs):
    import ray.data as rd

    src, dst = zip(*pairs) if pairs else ((), ())
    return rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )


def _reference_pagerank(pairs, n_iter=5, d=0.85):
    """Dense numpy mirror of the same fixed-point iteration."""
    pairs = sorted(set(pairs))
    nodes = sorted({x for p in pairs for x in p})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n, np.int64)
    for s, _ in pairs:
        deg[idx[s]] += 1
    r = np.round(np.full(n, 1.0 / n), 12)
    for _ in range(n_iter):
        per_src = np.zeros(n, np.int64)
        nz = deg > 0
        per_src[nz] = np.floor(r[nz] * 1e12 / deg[nz] + 0.5).astype(np.int64)
        contrib = np.zeros(n, np.int64)
        for s, t in pairs:
            contrib[idx[t]] += per_src[idx[s]]
        dang = int(np.floor(r[~nz] * 1e12 + 0.5).astype(np.int64).sum())
        r = np.round((1 - d) / n + d * (contrib / 1e12 + dang / 1e12 / n), 12)
    return pd.DataFrame({"node": nodes, "rank": np.round(r, 8)})


def test_cycle_uniform(ray_session):
    # pure cycle: stationary distribution is uniform
    out = graph.pagerank(_edges([(0, 1), (1, 2), (2, 0)]))
    assert np.allclose(out["rank"], 1 / 3, atol=1e-6)


def test_matches_dense_reference(ray_session):
    rng = np.random.default_rng(11)
    pairs = [tuple(map(int, p)) for p in rng.integers(0, 30, size=(200, 2))]
    pairs = [(s, t) for s, t in pairs if s != t]
    out = graph.pagerank(_edges(pairs)).sort_values("node").reset_index(drop=True)
    exp = _reference_pagerank(pairs)
    pd.testing.assert_frame_equal(out, exp)


def test_dangling_mass_conserved(ray_session):
    # star into a sink: total rank stays ~1 because the sink redistributes
    out = graph.pagerank(_edges([(i, 99) for i in range(10)]))
    assert abs(out["rank"].sum() - 1.0) < 1e-6
    sink = out.set_index("node").loc[99, "rank"]
    assert sink > out.set_index("node").loc[0, "rank"]


def test_duplicate_edges_ignored(ray_session):
    a = graph.pagerank(_edges([(0, 1), (0, 1), (1, 0)]))
    b = graph.pagerank(_edges([(0, 1), (1, 0)]))
    pd.testing.assert_frame_equal(a, b)


def test_partition_independence(ray_session):
    pairs = [(i % 13, (i * 7 + 1) % 13) for i in range(60)]
    pairs = [(s, t) for s, t in pairs if s != t]
    a = graph.pagerank(_edges(pairs))
    b = graph.pagerank(_edges(pairs).repartition(6))
    pd.testing.assert_frame_equal(a, b)


def _reference_hits(pairs, n_iter=4):
    """Dense exact-int mirror of graph.hits."""
    pairs = sorted(set(pairs))
    nodes = sorted({x for p in pairs for x in p})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    scale = 1_000_000
    hub = [scale] * n
    auth = [0] * n
    for _ in range(n_iter):
        raw = [0] * n
        for s, t in pairs:
            raw[idx[t]] += hub[idx[s]]
        m = max(raw)
        auth = [(v * scale) // m if m else v for v in raw]
        raw = [0] * n
        for s, t in pairs:
            raw[idx[s]] += auth[idx[t]]
        m = max(raw)
        hub = [(v * scale) // m if m else v for v in raw]
    return pd.DataFrame({
        "node": nodes,
        "hub": [v / scale for v in hub],
        "authority": [v / scale for v in auth],
    })


def test_hits_matches_dense_reference(ray_session):
    pairs = [
        (1, 101), (1, 102), (1, 103),
        (2, 101), (2, 102),
        (3, 103), (3, 104),
        (4, 104),
        (104, 1),  # a supplier-side node that also points back: mixed roles
    ]
    got = graph.hits(_edges(pairs), n_iter=4).reset_index(drop=True)
    want = _reference_hits(pairs, n_iter=4)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_hits_hub_is_not_out_degree(ray_session):
    # 1 and 2 both have out-degree 2, but 1 points at the popular node 101
    # (cited by everyone) while 2 points at fringe nodes: HITS must rank
    # hub(1) > hub(2), which plain degree cannot distinguish.
    pairs = [
        (1, 101), (1, 102),
        (2, 103), (2, 104),
        (3, 101), (4, 101), (5, 101),
        (3, 102),
    ]
    out = graph.hits(_edges(pairs), n_iter=4).set_index("node")
    assert out.loc[1, "hub"] > out.loc[2, "hub"]


def test_hits_empty_edges(ray_session):
    out = graph.hits(_edges([]), n_iter=3)
    assert list(out.columns) == ["node", "hub", "authority"]
    assert len(out) == 0


def _reference_lpa(pairs, n_iter=4):
    """Dense mirror of synchronous min-tie-break label propagation."""
    und = sorted({(min(s, d), max(s, d)) for s, d in pairs if s != d})
    nodes = sorted({x for p in und for x in p})
    lab = {v: v for v in nodes}
    for _ in range(n_iter):
        cnt = {}
        for u, w in und:
            cnt.setdefault(u, {}).setdefault(lab[w], 0)
            cnt[u][lab[w]] += 1
            cnt.setdefault(w, {}).setdefault(lab[u], 0)
            cnt[w][lab[u]] += 1
        lab = {
            v: min(c, key=lambda l: (-c[l], l)) if (c := cnt.get(v)) else lab[v]
            for v in nodes
        }
    return pd.DataFrame({"node": nodes, "label": [lab[v] for v in nodes]})


def test_label_propagation_two_triangles(ray_session):
    # two triangles joined by one bridge edge: LPA should give each
    # triangle one community (min node id), not collapse across the bridge
    pairs = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)]
    got = graph.label_propagation(_edges(pairs), n_iter=4).reset_index(drop=True)
    want = _reference_lpa(pairs, n_iter=4)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    labs = got.set_index("node")["label"]
    assert labs[1] == labs[2] == labs[3]
    assert labs[10] == labs[11] == labs[12]
    assert labs[1] != labs[10]


def test_label_propagation_matches_dense_reference(ray_session):
    rng = np.random.default_rng(3)
    pairs = [tuple(map(int, p)) for p in rng.integers(0, 25, size=(80, 2))]
    got = graph.label_propagation(_edges(pairs), n_iter=4).reset_index(drop=True)
    want = _reference_lpa(pairs, n_iter=4)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_label_propagation_self_loops_only(ray_session):
    out = graph.label_propagation(_edges([(5, 5), (6, 6)]), n_iter=2)
    assert len(out) == 0
