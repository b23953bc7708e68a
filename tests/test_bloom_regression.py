"""Bloom semi-join (ops/bloom.py) + OLS regression partials
(pipelines/analytics.regression_by_group)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from harvester_ray.ops import bloom
from harvester_ray.pipelines import analytics


def _ds(tbl: dict):
    import ray.data as rd

    return rd.from_arrow(pa.table(tbl))


def test_bloom_counts_exact_membership(ray_session):
    build = _ds({"k": pa.array([1, 2, 3], pa.int64())})
    probe = _ds({"k": pa.array([1, 1, 2, 4, 5, 6, 7, 8], pa.int64())})
    out = bloom.bloom_semijoin_stats(probe, build, probe_key="k", build_key="k", m=1 << 20, k=2)
    row = out.iloc[0]
    assert row["n_build_keys"] == 3 and row["n_probe"] == 8
    # true matches are rows with key in {1,2,3}: two 1s and one 2
    assert row["n_true"] == 3
    # with m = 1M bits and 3 keys, false positives are essentially impossible
    assert row["n_pass"] == 3 and row["n_false_pos"] == 0


def test_bloom_false_positives_counted(ray_session):
    # tiny filter → guaranteed false positives, but n_true stays exact
    build = _ds({"k": pa.array(list(range(50)), pa.int64())})
    probe = _ds({"k": pa.array(list(range(1000, 1200)), pa.int64())})
    out = bloom.bloom_semijoin_stats(probe, build, probe_key="k", build_key="k", m=64, k=2)
    row = out.iloc[0]
    assert row["n_true"] == 0
    assert row["n_false_pos"] == row["n_pass"] > 0  # saturated filter


def test_bloom_partition_independent(ray_session):
    build = _ds({"k": pa.array(list(range(0, 400, 3)), pa.int64())})
    probe = _ds({"k": pa.array(list(range(400)), pa.int64())})
    a = bloom.bloom_semijoin_stats(probe, build, probe_key="k", build_key="k", m=512, k=2)
    b = bloom.bloom_semijoin_stats(
        probe.repartition(7), build.repartition(3), probe_key="k", build_key="k", m=512, k=2
    )
    assert a.equals(b)


def _events(n=120, types=("a", "b")):
    import ray.data as rd

    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(np.arange(n), unit="min")
    # value = 2·minutes + 5 for type a (slope 2), constant 7 for type b
    et = np.array([types[i % 2] for i in range(n)])
    val = np.where(et == "a", 2.0 * np.arange(n) + 5.0, 7.0)
    return rd.from_arrow(
        pa.table({"event_type": pa.array(et), "ts": pa.array(ts), "value": pa.array(val)})
    )


def test_regression_recovers_slope(ray_session):
    out = analytics.regression_by_group(_events())
    a = out[out["event_type"] == "a"].iloc[0]
    assert abs(a["slope"] - 2.0) < 1e-9 and abs(a["intercept"] - 5.0) < 1e-9
    b = out[out["event_type"] == "b"].iloc[0]
    assert b["slope"] == 0.0 and abs(b["intercept"] - 7.0) < 1e-9


def test_regression_degenerate_x(ray_session):
    import ray.data as rd

    ts = pd.to_datetime(["2024-01-01 10:00:10", "2024-01-01 10:00:40"])  # same minute
    ds = rd.from_arrow(
        pa.table({"event_type": pa.array(["z", "z"]), "ts": pa.array(ts), "value": pa.array([1.0, 2.0])})
    )
    out = analytics.regression_by_group(ds)
    assert out.iloc[0]["slope"] is None or pd.isna(out.iloc[0]["slope"])


def test_regression_partition_independent(ray_session):
    a = analytics.regression_by_group(_events(200))
    b = analytics.regression_by_group(_events(200).repartition(9))
    assert a.equals(b)


def test_centroid_cosine(ray_session):
    import ray.data as rd

    from harvester_ray.ops import embstats

    vecs = [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]
    labs = [0, 0, 1, 2]
    ds = rd.from_arrow(
        pa.table(
            {
                "label": pa.array(labs, pa.int32()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
            }
        )
    )
    out = embstats.centroid_cosine(ds)
    m = {(r["label_a"], r["label_b"]): r["cosine"] for _, r in out.iterrows()}
    assert m[(0, 1)] == 0.0  # orthogonal centroids
    assert abs(m[(0, 2)] - np.round(1 / np.sqrt(2), 6)) < 1e-9
    assert abs(m[(1, 2)] - np.round(1 / np.sqrt(2), 6)) < 1e-9
    assert list(out["n_a"]) == [2, 2, 1]


def test_centroid_cosine_partition_independent(ray_session):
    import ray.data as rd

    from harvester_ray.ops import embstats

    rng_vals = [[(i * 7 % 13) * 0.1, (i * 5 % 11) * 0.2, 1.0] for i in range(60)]
    ds = rd.from_arrow(
        pa.table(
            {
                "label": pa.array([i % 4 for i in range(60)], pa.int32()),
                "embedding": pa.array(rng_vals, pa.list_(pa.float32())),
            }
        )
    )
    a = embstats.centroid_cosine(ds)
    b = embstats.centroid_cosine(ds.repartition(7))
    assert a.equals(b)


def test_embedding_quantize(ray_session):
    import ray.data as rd

    from harvester_ray.ops import embstats

    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([0, 1], pa.int64()),
                "embedding": pa.array(
                    [[1.0, -0.5, 0.0], [0.5, 0.25, 0.0]], pa.list_(pa.float32())
                ),
            }
        )
    )
    out = embstats.quantize_embeddings_int8(ds)
    m = {(r["vec_id"], r["i"]): r["q"] for _, r in out.iterrows()}
    # dim scales: 1.0, 0.5, 0 (all-zero dim → q = 0)
    assert m[(0, 1)] == 127 and m[(1, 1)] == 64  # floor(0.5·127+0.5)=64
    assert m[(0, 2)] == -127 and m[(1, 2)] == 64  # floor(0.25/0.5·127+0.5)
    assert m[(0, 3)] == 0 and m[(1, 3)] == 0
    assert len(out) == 6


def test_embedding_quantize_partition_independent(ray_session):
    import ray.data as rd

    from harvester_ray.ops import embstats

    vecs = [[(i * 3 % 7) * 0.3 - 1.0, (i % 5) * 0.1] for i in range(50)]
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(50), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
            }
        )
    )
    a = embstats.quantize_embeddings_int8(ds)
    b = embstats.quantize_embeddings_int8(ds.repartition(7))
    assert a.equals(b)


def test_full_outer_join_vs_oracle():
    """Broadcast full-outer composition: inner + right-anti stream out of
    the map pass, left-anti from the broadcast minus matched fold."""
    import duckdb
    import numpy as np

    from harvester_ray.pipelines import relational

    sf = "/root/testdata/sf0.001"
    got = relational.events_customers_full_outer(sf)
    con = duckdb.connect()
    for t in ("events", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    exp = con.execute(relational.FULL_OUTER_EVENTS_CUSTOMERS_SQL).fetchdf()
    assert len(got) == len(exp)
    assert list(got["key"]) == list(exp["key"])
    for c in ("n_events", "c_acctbal"):
        np.testing.assert_allclose(
            got[c].to_numpy(np.float64), exp[c].to_numpy(np.float64),
            rtol=1e-9, equal_nan=True,
        )
    # all three row classes are present
    assert got["n_events"].isna().any(), "no right-only rows"
    assert got["c_acctbal"].isna().any(), "no left-only rows"
    assert (got["n_events"].notna() & got["c_acctbal"].notna()).any(), "no inner rows"
