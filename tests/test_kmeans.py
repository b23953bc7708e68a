"""Distributed Lloyd's k-means (ops/kmeans.py)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from harvester_ray.ops import kmeans


def _vecs(mat):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(len(mat)), pa.int64()),
                "embedding": pa.array([list(map(float, r)) for r in mat], pa.list_(pa.float32())),
            }
        )
    )


def _blob_data():
    # two well-separated blobs in 4-d, deterministic
    rng = np.random.default_rng(11)
    a = rng.normal(0.0, 0.05, (20, 4)) + np.array([1, 0, 0, 0])
    b = rng.normal(0.0, 0.05, (20, 4)) + np.array([0, 1, 0, 0])
    return np.vstack([a[:1], b[:1], a[1:], b[1:]])  # ids 0,1 seed opposite blobs


def test_separated_blobs_recovered():
    mat = _blob_data()
    out = (
        kmeans.kmeans_assign(_vecs(mat), k=2, iters=3)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    blob = np.array([0, 1] + [0] * 19 + [1] * 19)
    # cluster labels must be constant within each blob
    assert out.loc[blob == 0, "cluster"].nunique() == 1
    assert out.loc[blob == 1, "cluster"].nunique() == 1
    assert out.loc[0, "cluster"] != out.loc[1, "cluster"]


def test_matches_sql_oracle():
    mat = _blob_data()
    eng = (
        kmeans.kmeans_assign(_vecs(mat), k=3, iters=2)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame({"vec_id": range(len(mat)), "embedding": [list(map(float, r)) for r in mat]}),
    )
    ora = con.sql(kmeans.kmeans_sql("embeddings", k=3, iters=2)).df()
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)


def test_block_count_invariance():
    mat = _blob_data()
    one = kmeans.kmeans_assign(_vecs(mat).repartition(1), k=2, iters=2).to_pandas()
    many = kmeans.kmeans_assign(_vecs(mat).repartition(7), k=2, iters=2).to_pandas()
    pd.testing.assert_frame_equal(
        one.sort_values("vec_id").reset_index(drop=True),
        many.sort_values("vec_id").reset_index(drop=True),
    )


def test_semantic_dedup_flags_near_duplicates():
    rng = np.random.default_rng(3)
    base = rng.normal(0, 1, (6, 8))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # vec 6 is a near-copy of vec 2 (tiny perturbation, re-normalized)
    near = base[2] + 1e-4
    near /= np.linalg.norm(near)
    mat = np.vstack([base, near])
    out = (
        kmeans.semantic_dedup(_vecs(mat), k=2, iters=2, threshold_pct=90)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert out.loc[6, "is_dup"] == 1  # dominated by lower-id vec 2
    assert out.loc[2, "is_dup"] == 0
    assert out["is_dup"].sum() == 1  # random unit vecs in 8-d are far apart


def test_semantic_dedup_matches_sql_oracle():
    rng = np.random.default_rng(5)
    mat = rng.normal(0, 1, (15, 6))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    mat[9] = mat[4]  # exact dup pair
    eng = (
        kmeans.semantic_dedup(_vecs(mat), k=3, iters=2, threshold_pct=80)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame({"vec_id": range(len(mat)), "embedding": [list(map(float, r)) for r in mat]}),
    )
    ora = con.sql(kmeans.semantic_dedup_sql("embeddings", k=3, iters=2, threshold_pct=80)).df()
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    assert eng.loc[9, "is_dup"] == 1


def test_cluster_sample_quota_and_determinism():
    mat = _blob_data()
    out = (
        kmeans.cluster_sample(_vecs(mat), k=2, iters=2, n_per_cluster=5)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert (out.groupby("cluster").size() <= 5).all()
    assert len(out) == 10  # both blobs have >5 members -> full quota
    again = (
        kmeans.cluster_sample(_vecs(mat).repartition(5), k=2, iters=2, n_per_cluster=5)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, again)
