"""Connected-components clustering + corpus dedup (ops/cluster.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from harvester_ray.ops import cluster


def _pairs_ds(pairs):
    import ray.data as rd

    a, b = (list(x) for x in zip(*pairs)) if pairs else ([], [])
    return rd.from_arrow(
        pa.table({"doc_a": pa.array(a, pa.int64()), "doc_b": pa.array(b, pa.int64())})
    )


def test_chain_collapses_to_one_cluster(ray_session):
    # 1-2, 2-3, 3-4, 4-5: diameter-4 chain → all label 1 (needs >1 round)
    got = (
        cluster.connected_components(_pairs_ds([(1, 2), (2, 3), (3, 4), (4, 5)]))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [1, 2, 3, 4, 5]
    assert got["cluster_id"].tolist() == [1, 1, 1, 1, 1]


def test_disjoint_components_and_ordering(ray_session):
    got = (
        cluster.connected_components(_pairs_ds([(7, 3), (10, 20), (20, 15), (100, 99)]))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = {3: 3, 7: 3, 10: 10, 15: 10, 20: 10, 99: 99, 100: 99}
    assert dict(zip(got["doc_id"], got["cluster_id"])) == exp


def test_matches_recursive_cte_oracle(ray_session):
    import duckdb

    rng = np.random.default_rng(11)
    pairs = [
        (int(p[0]), int(p[1]))
        for p in rng.integers(0, 60, size=(80, 2))
        if p[0] != p[1]
    ]
    got = (
        cluster.connected_components(_pairs_ds(pairs))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE pr (doc_a BIGINT, doc_b BIGINT)")
    con.executemany("INSERT INTO pr VALUES (?, ?)", pairs)
    exp = con.execute(cluster.cluster_sql("SELECT doc_a, doc_b FROM pr")).df()
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


def test_dedup_corpus_keeps_min_representative(ray_session):
    import ray.data as rd

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(8)), pa.int64()),
                "text": pa.array([f"t{i}" for i in range(8)]),
            }
        )
    )
    # clusters {1,2,5} and {6,7}; 0,3,4 isolated → survivors 0,1,3,4,6
    out = (
        cluster.dedup_corpus(docs, _pairs_ds([(1, 2), (2, 5), (6, 7)]))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [0, 1, 3, 4, 6]
    assert out["text"].tolist() == ["t0", "t1", "t3", "t4", "t6"]


def test_empty_pairs_labels_nothing(ray_session):
    got = cluster.connected_components(_pairs_ds([])).to_pandas()
    assert len(got) == 0


def test_cluster_safe_split_no_leakage(ray_session):
    """No near-dup cluster may span splits; singletons follow the rep hash."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from harvester_ray.ops import cluster
    from harvester_ray.ops.sampling import _hash_frac

    # 300 docs; pairs chain docs (3i, 3i+1, 3i+2) into 100 clusters
    pairs = pd.DataFrame({
        "doc_a": [3 * i for i in range(100)] * 2,
        "doc_b": [3 * i + 1 for i in range(100)] + [3 * i + 2 for i in range(100)],
    })
    docs = rd.from_arrow(pa.table({"doc_id": pa.array(list(range(300)), pa.int64())}))
    out = cluster.cluster_safe_split(docs, rd.from_pandas(pairs))
    assert int(out["n_docs"].sum()) == 300
    assert int(out["n_clusters"].sum()) == 100  # every doc is clustered
    # every cluster contributes exactly 3 docs to exactly one split →
    # each split's doc count is exactly 3× its cluster count
    assert (out["n_docs"] == 3 * out["n_clusters"]).all()
    # representative-hash determinism: recompute expected split sizes
    reps = np.array([3 * i for i in range(100)], dtype=np.int64)
    frac = _hash_frac(reps, 424242)
    exp_train = int((frac < 0.8).sum())
    got = dict(zip(out["split"], out["n_clusters"]))
    assert got.get("train", 0) == exp_train
