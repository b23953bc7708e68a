"""Greedy k-center coreset selection (ops/coreset.py)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from harvester_ray.ops import coreset


def _emb(vectors):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(len(vectors)), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vectors], pa.list_(pa.float32())
                ),
            }
        )
    )


def test_farthest_point_order(ray_session):
    # 1-D line: seed=0 at x=0; farthest is x=10, then x=5 (midpoint), ...
    xs = [0.0, 1.0, 5.0, 9.0, 10.0]
    out = coreset.kcenter_select(_emb([[x] for x in xs]), k=3, seed_id=0)
    assert list(out.vec_id) == [0, 4, 2]
    # mind2 in quantized units (scale=1e4): (10*1e4)^2, then min(5e4^2, 5e4^2)
    assert out.mind2[1] == (10 * 10**4) ** 2
    assert out.mind2[2] == (5 * 10**4) ** 2


def test_tie_breaks_lower_id(ray_session):
    # two symmetric farthest candidates -> lower vec_id wins
    vecs = [[0.0, 0.0], [1.0, 0.0], [-1.0, 0.0]]
    out = coreset.kcenter_select(_emb(vecs), k=2, seed_id=0)
    assert list(out.vec_id) == [0, 1]


def test_k_exceeds_corpus(ray_session):
    out = coreset.kcenter_select(_emb([[0.0], [1.0]]), k=5, seed_id=0)
    assert len(out) == 2


def test_matches_oracle_and_partition_independent(ray_session):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(40, 8)).round(3)
    a = coreset.kcenter_select(_emb(vecs), k=5, seed_id=0)
    b = coreset.kcenter_select(_emb(vecs).repartition(7), k=5, seed_id=0)
    pd.testing.assert_frame_equal(a, b)
    con = duckdb.connect()
    con.register(
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
                ),
            }
        ),
    )
    ora = con.execute(coreset.kcenter_select_sql("embeddings", k=5)).df()
    pd.testing.assert_frame_equal(a, ora.reset_index(drop=True))
    # degeneracy probe: k-center differs from plain farthest-from-seed top-k
    d2_seed = ((vecs - vecs[0]) ** 2).sum(axis=1)
    topk = list(np.argsort(-d2_seed)[:4])
    assert list(a.vec_id[1:]) != topk
