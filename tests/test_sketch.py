"""KMV distinct sketch (ops/sketch.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from harvester_ray.ops import sketch


def _ds(vals):
    import ray.data as rd

    return rd.from_arrow(pa.table({"v": pa.array(vals)}))


def test_exact_below_k(ray_session):
    out = sketch.kmv_distinct(_ds(["a", "b", "c", "a", "b", None]), "v", k=16)
    assert out.loc[0, "n_kept"] == 3
    assert out.loc[0, "estimate"] == 3.0


def test_estimate_within_error(ray_session):
    vals = [f"user-{i}" for i in range(5000)] * 2  # 5000 distinct, repeated
    out = sketch.kmv_distinct(_ds(vals), "v", k=256)
    assert out.loc[0, "n_kept"] == 256
    est = out.loc[0, "estimate"]
    # KMV standard error ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert abs(est - 5000) / 5000 < 0.25


def test_partition_independent(ray_session):
    vals = [f"x{i % 700}" for i in range(3000)]
    a = sketch.kmv_distinct(_ds(vals), "v", k=64)
    b = sketch.kmv_distinct(_ds(vals).repartition(7), "v", k=64)
    assert a.equals(b)


def test_empty_input(ray_session):
    out = sketch.kmv_distinct(_ds([]).filter(lambda r: True), "v", k=8)
    assert out.loc[0, "n_kept"] == 0 and out.loc[0, "estimate"] == 0.0


def test_hll_estimate_within_error(ray_session):
    vals = [f"user-{i}" for i in range(5000)] * 2
    out = sketch.hll_distinct(_ds(vals), "v", p=8)  # m=256, rse ~6.5%
    est = out.loc[0, "estimate"]
    assert abs(est - 5000) / 5000 < 0.26  # 4 sigma
    assert out.loc[0, "m"] == 256 and out.loc[0, "n_zero"] == 0


def test_hll_partition_independent(ray_session):
    vals = [f"x{i % 700}" for i in range(3000)]
    a = sketch.hll_distinct(_ds(vals), "v", p=6)
    b = sketch.hll_distinct(_ds(vals).repartition(7), "v", p=6)
    assert a.equals(b)


def test_hll_small_range_correction(ray_session):
    # 3 distinct values, m=64: linear-counting branch
    out = sketch.hll_distinct(_ds(["a", "b", "c", "a", None]), "v", p=6)
    assert out.loc[0, "n_zero"] >= 61
    assert abs(out.loc[0, "estimate"] - 3) < 1.5


def test_hll_empty(ray_session):
    out = sketch.hll_distinct(_ds([]).filter(lambda r: True), "v", p=6)
    assert out.loc[0, "rho_sum"] == 0 and out.loc[0, "n_zero"] == 64


def test_hll_by_key_matches_exact_for_small_groups():
    import ray.data as rd

    t = pa.table(
        {
            "k": pa.array([1, 1, 1, 2, 2, 3] * 4, pa.int64()),
            "v": pa.array(["a", "b", "a", "c", "c", "d"] * 4, pa.string()),
        }
    )
    out = (
        sketch.hll_distinct_by(rd.from_arrow(t).repartition(3), "k", "v", p=6)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # tiny cardinalities land in the exact small-range regime
    assert list(out["k"]) == [1, 2, 3]
    est = out["estimate"].to_numpy()
    assert abs(est[0] - 2) < 0.2 and abs(est[1] - 1) < 0.2 and abs(est[2] - 1) < 0.2


def test_hll_by_key_partition_invariance():
    import ray.data as rd

    t = pa.table(
        {
            "k": pa.array([i % 5 for i in range(200)], pa.int64()),
            "v": pa.array([f"v{i % 37}" for i in range(200)], pa.string()),
        }
    )
    a = sketch.hll_distinct_by(rd.from_arrow(t).repartition(1), "k", "v").to_pandas()
    b = sketch.hll_distinct_by(rd.from_arrow(t).repartition(9), "k", "v").to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("k").reset_index(drop=True),
        b.sort_values("k").reset_index(drop=True),
    )


def _labeled(pairs):
    import ray.data as rd

    import pandas as pd

    return rd.from_arrow(
        pa.table(
            {
                "k": pa.array([p[0] for p in pairs], pa.int64()),
                "lab": pa.array([p[1] for p in pairs], pa.string()),
            }
        )
    )


def test_kmv_overlap_exact_when_small(ray_session):
    # A = {0..9}, B = {5..14}: |A∪B| = 15 < k → everything exact
    pairs = [(i, "a") for i in range(10)] + [(i, "b") for i in range(5, 15)]
    out = sketch.kmv_overlap(
        _labeled(pairs), key_col="k", label_col="lab", label_a="a", label_b="b", k=64
    )
    r = out.iloc[0]
    assert r["n_kept"] == 15 and r["n_common"] == 5
    assert r["union_est"] == 15.0 and r["jaccard_est"] == round(5 / 15, 6)
    assert abs(r["inter_est"] - 5.0) < 0.01


def test_kmv_overlap_estimates(ray_session):
    # |A| = |B| = 3000 with 1500 shared → J = 1/3, |A∪B| = 4500
    pairs = [(i, "a") for i in range(3000)] + [(i, "b") for i in range(1500, 4500)]
    out = sketch.kmv_overlap(
        _labeled(pairs), key_col="k", label_col="lab", label_a="a", label_b="b", k=256
    )
    r = out.iloc[0]
    assert abs(r["union_est"] - 4500) / 4500 < 0.25
    assert abs(r["jaccard_est"] - 1 / 3) < 0.12
    assert abs(r["inter_est"] - 1500) / 1500 < 0.4


def test_kmv_overlap_partition_independent(ray_session):
    pairs = [(i * 7, "a") for i in range(800)] + [(i * 11, "b") for i in range(800)]
    a = sketch.kmv_overlap(_labeled(pairs), key_col="k", label_col="lab", label_a="a", label_b="b", k=128)
    b = sketch.kmv_overlap(
        _labeled(pairs).repartition(9), key_col="k", label_col="lab", label_a="a", label_b="b", k=128
    )
    assert a.equals(b)


def test_kmv_overlap_disjoint_and_empty(ray_session):
    pairs = [(i, "a") for i in range(20)] + [(i + 100, "b") for i in range(20)]
    out = sketch.kmv_overlap(_labeled(pairs), key_col="k", label_col="lab", label_a="a", label_b="b", k=64)
    assert out.iloc[0]["n_common"] == 0 and out.iloc[0]["jaccard_est"] == 0.0
    empty = sketch.kmv_overlap(
        _labeled([(1, "x")]), key_col="k", label_col="lab", label_a="a", label_b="b", k=8
    )
    assert empty.iloc[0]["n_kept"] == 0 and empty.iloc[0]["inter_est"] == 0.0


def test_cms_counts_one_sided(ray_session):
    import ray.data as rd

    vals = [i % 50 for i in range(2000)]  # 50 keys × 40 each
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.int64())}))
    out = sketch.cms_counts(ds, "v", width=64, depth=4)
    assert len(out) == 50
    assert (out["exact"] == 40).all()
    assert (out["overcount"] >= 0).all()  # CMS never undercounts
    assert (out["est"] >= out["exact"]).all()


def test_cms_exact_when_wide(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"v": pa.array([1, 1, 2, 3, 3, 3], pa.int64())}))
    out = sketch.cms_counts(ds, "v", width=4096, depth=4)
    m = dict(zip(out["key"], out["est"]))
    assert m == {1: 2, 2: 1, 3: 3}
    assert (out["overcount"] == 0).all()  # no collisions at this width


def test_cms_partition_independent(ray_session):
    import ray.data as rd

    vals = [(i * 17) % 97 for i in range(3000)]
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.int64())}))
    a = sketch.cms_counts(ds, "v", width=128, depth=3)
    b = sketch.cms_counts(ds.repartition(8), "v", width=128, depth=3)
    assert a.equals(b)


def test_heavy_hitters_exact_when_capacity_suffices(ray_session):
    import pandas as pd
    import ray.data as rd

    from harvester_ray.ops import sketch

    rng = np.random.RandomState(5)
    keys = rng.zipf(1.5, size=5000) % 100  # skewed over ≤100 keys
    df = pd.DataFrame({"k": keys.astype(np.int64)})
    got = sketch.heavy_hitters(rd.from_pandas(df), "k", n=10, capacity=512)
    truth = (
        df["k"].astype(str).value_counts().rename_axis("key").reset_index(name="cnt")
    )
    truth = truth.sort_values(["cnt", "key"], ascending=[False, True],
                              kind="mergesort").head(10).reset_index(drop=True)
    assert list(got["key"]) == list(truth["key"])
    np.testing.assert_array_equal(got["cnt"], truth["cnt"].to_numpy(np.int64))


def test_heavy_hitters_small_capacity_keeps_top(ray_session):
    """With tiny capacity, true heavy hitters above N/(c+1) still surface
    with EXACT counts (rescreen pass)."""
    import pandas as pd
    import ray.data as rd

    from harvester_ray.ops import sketch

    # one dominant key + noise tail
    df = pd.DataFrame({"k": ["hot"] * 400 + [f"n{i}" for i in range(200)]})
    got = sketch.heavy_hitters(rd.from_pandas(df), "k", n=3, capacity=8)
    assert got["key"].iloc[0] == "hot"
    assert int(got["cnt"].iloc[0]) == 400  # exact despite sketch underestimates
