import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from harvester_ray.ops import pca


def test_trunc_div_matches_duckdb_semantics():
    import duckdb

    cases = [(-7, 2), (7, 2), (-7, -2), (7, -2), (0, 3), (-9, 3)]
    got = [pca._trunc_div(a, b) for a, b in cases]
    want = [
        duckdb.sql(
            f"SELECT CAST({a} AS HUGEINT) // CAST({b} AS HUGEINT)"
        ).fetchone()[0]
        for a, b in cases
    ]
    assert got == want


def test_power_direction_finds_dominant_axis():
    rng = np.random.default_rng(7)
    d = 8
    base = rng.normal(size=(400, d)) * 0.05
    base[:, 3] += rng.normal(size=400) * 0.4  # dominant variance on axis 3
    q = pca._quantize(base)
    cnt = q.shape[0]
    sx = [int(x) for x in q.sum(axis=0)]
    gram = [[int(x) for x in row] for row in (q.T @ q)]
    v = np.asarray(pca.power_direction(cnt, sx, gram, iters=32), dtype=np.float64)
    v /= np.linalg.norm(v)
    xc = base - base.mean(axis=0)
    _, vecs = np.linalg.eigh(xc.T @ xc)
    assert abs(float(v @ vecs[:, -1])) > 0.999


def test_power_direction_zero_matrix_is_identity_start():
    d = 4
    # all rows identical -> scatter matrix is exactly zero
    q = np.tile(np.array([[5, -3, 2, 7]], dtype=np.int64), (10, 1))
    sx = [int(x) for x in q.sum(axis=0)]
    gram = [[int(x) for x in row] for row in (q.T @ q)]
    assert pca.power_direction(10, sx, gram, iters=8) == [pca.SCALE] * d


def test_quantize_overflow_guard():
    with pytest.raises(ValueError):
        pca._quantize(np.array([[3.0]]))  # 3e6 >= 2^21


def test_pca_project_matches_local_reference(ray_session, tmp_path):
    rng = np.random.default_rng(11)
    mat = rng.normal(size=(60, 6)) * 0.1
    mat[:, 1] += np.linspace(-0.5, 0.5, 60)  # dominant axis
    path = str(tmp_path / "emb.parquet")
    pq.write_table(
        pa.table({
            "vec_id": pa.array(range(60), pa.int64()),
            "embedding": pa.array([row.tolist() for row in mat],
                                  pa.list_(pa.float32())),
        }),
        path,
    )
    out = pca.pca_project(path, k=5, iters=32).to_pandas()
    assert len(out) == 5

    # local exact-int replica
    q = pca._quantize(np.stack(
        pq.read_table(path)["embedding"].to_pandas().to_numpy()
    ).astype(np.float64))
    cnt = q.shape[0]
    sx = [int(x) for x in q.sum(axis=0)]
    gram = [[int(x) for x in row] for row in (q.T @ q)]
    v = pca.power_direction(cnt, sx, gram, iters=32)
    a = q @ np.asarray(v, dtype=np.int64)
    s = sum(sx[i] * v[i] for i in range(6))
    order = np.lexsort((np.arange(60), -a))[:5]
    want = [
        math.floor(float(cnt * int(a[i]) - s)
                   / float(cnt * pca.SCALE * pca.SCALE) * 10000.0 + 0.5) / 10000.0
        for i in order
    ]
    assert out["vec_id"].tolist() == [int(i) for i in order]
    assert out["pc1"].tolist() == want


def test_pca_residual_prefers_orthogonal_outlier(ray_session, tmp_path):
    rng = np.random.default_rng(23)
    mat = rng.normal(size=(50, 4)) * 0.02
    mat[:, 0] += np.linspace(-0.5, 0.5, 50)        # dominant axis 0
    mat[7] = [1.5e-1, 0.0, 0.0, 0.0]               # big but ON the component
    mat[13] = [0.0, 0.0, 0.0, 1.2]                 # off-component outlier
    path = str(tmp_path / "emb.parquet")
    pq.write_table(
        pa.table({
            "vec_id": pa.array(range(50), pa.int64()),
            "embedding": pa.array([r.tolist() for r in mat],
                                  pa.list_(pa.float32())),
        }),
        path,
    )
    out = pca.pca_residual_outliers(path, k=5, iters=32).to_pandas()
    assert out["vec_id"].iloc[0] == 13      # orthogonal outlier wins
    assert 7 not in out["vec_id"].tolist()  # on-component doc is explained

    # numpy cross-check: the exact key ordering equals the float residual
    # ordering on this well-separated fixture
    X = np.stack(pq.read_table(path)["embedding"].to_pandas().to_numpy()).astype(np.float64)
    Xc = X - X.mean(0)
    _, V = np.linalg.eigh(Xc.T @ Xc)
    pc1 = V[:, -1]
    resid = Xc - np.outer(Xc @ pc1, pc1)
    want = np.argsort(-np.einsum("ij,ij->i", resid, resid))[:5]
    assert out["vec_id"].tolist() == [int(i) for i in want]


def test_srp_preserves_cosine_order_roughly(ray_session, tmp_path):
    """JL sanity: projected cosine must correlate with true cosine."""
    rng = np.random.default_rng(31)
    mat = rng.normal(size=(40, 32)) * 0.05
    path = str(tmp_path / "emb.parquet")
    pq.write_table(
        pa.table({
            "vec_id": pa.array(range(40), pa.int64()),
            "embedding": pa.array([r.tolist() for r in mat],
                                  pa.list_(pa.float32())),
        }),
        path,
    )
    out = pca.srp_project(path, out_dim=16, n_rows=40).to_pandas()
    proj = out.pivot(index="vec_id", columns="j", values="p").to_numpy(np.float64)
    def cosmat(m):
        n = m / np.linalg.norm(m, axis=1, keepdims=True)
        return n @ n.T
    true_c = cosmat(mat)[np.triu_indices(40, 1)]
    srp_c = cosmat(proj)[np.triu_indices(40, 1)]
    r = np.corrcoef(true_c, srp_c)[0, 1]
    assert r > 0.5, r
