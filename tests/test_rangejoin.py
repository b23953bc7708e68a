"""Range (interval) join (pipelines/rangejoin.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from harvester_ray.pipelines import rangejoin


def _pts(vals):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "pid": pa.array(range(len(vals)), pa.int64()),
                "v": pa.array(vals, pa.float64()),
            }
        )
    )


def _ivs(rows):
    import ray.data as rd

    ks, los, his = zip(*rows) if rows else ((), (), ())
    return rd.from_arrow(
        pa.table(
            {
                "k": pa.array(ks, pa.int64()),
                "lo": pa.array(los, pa.float64()),
                "hi": pa.array(his, pa.float64()),
            }
        )
    )


def _join(pts, ivs, **kw):
    out = rangejoin.range_join(
        pts,
        ivs,
        value_col="v",
        lo_col="lo",
        hi_col="hi",
        left_cols=["pid", "v"],
        right_cols=["k"],
        **kw,
    ).to_pandas()
    return out.sort_values(["pid", "k"]).reset_index(drop=True)


def _oracle(vals, rows):
    recs = [
        (p, v, k)
        for p, v in enumerate(vals)
        if v is not None
        for k, lo, hi in rows
        if lo <= v <= hi
    ]
    return (
        pd.DataFrame(recs, columns=["pid", "v", "k"])
        .sort_values(["pid", "k"])
        .reset_index(drop=True)
    )


def test_basic_overlaps(ray_session):
    vals = [0.0, 5.0, 10.0, 15.0, 99.0]
    rows = [(1, 0.0, 6.0), (2, 4.0, 12.0), (3, 50.0, 100.0)]
    out = _join(_pts(vals), _ivs(rows), n_partitions=4)
    exp = _oracle(vals, rows)
    pd.testing.assert_frame_equal(
        out[["pid", "v", "k"]].astype({"k": np.int64}), exp, check_dtype=False
    )


def test_fat_interval_replication_no_dups(ray_session):
    # one interval spanning the whole domain must match each point once
    vals = [float(i) for i in range(100)]
    rows = [(7, -1.0, 1000.0)]
    out = _join(_pts(vals), _ivs(rows), n_partitions=16)
    assert len(out) == 100 and out["pid"].is_unique


def test_partition_independence(ray_session):
    rng = np.random.default_rng(3)
    vals = list(np.round(rng.uniform(0, 100, 300), 3))
    rows = [(k, float(k * 7 % 90), float(k * 7 % 90 + 12.5)) for k in range(30)]
    a = _join(_pts(vals), _ivs(rows), n_partitions=8)
    b = _join(_pts(vals).repartition(11), _ivs(rows).repartition(5), n_partitions=8)
    pd.testing.assert_frame_equal(a, b)
    exp = _oracle(vals, rows)
    assert len(a) == len(exp)


def test_empty_and_inverted_intervals(ray_session):
    vals = [1.0, 2.0]
    out = rangejoin.range_join(
        _pts(vals),
        _ivs([(1, 5.0, 3.0)]),  # lo > hi: dropped, so no matches
        value_col="v",
        lo_col="lo",
        hi_col="hi",
        left_cols=["pid", "v"],
        right_cols=["k"],
        n_partitions=4,
    ).to_pandas()
    assert len(out) == 0
