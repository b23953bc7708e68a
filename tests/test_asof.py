"""As-of join operator (pipelines/asof.py): hash-bucket co-partition +
per-bucket vectorized merge_asof."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from harvester_ray.pipelines.asof import asof_join


def _ts(s):
    return pd.Timestamp(s)


def test_asof_basic_latest_at_or_before():
    left = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 2, 3], pa.int64()),
                "lts": pa.array([_ts("2024-01-05"), _ts("2024-01-01"), _ts("2024-01-10"), _ts("2024-01-02")]),
                "payload": pa.array([10, 11, 12, 13], pa.int64()),
            }
        )
    )
    right = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 1, 2], pa.int64()),
                "rts": pa.array([_ts("2024-01-01"), _ts("2024-01-04"), _ts("2024-01-06"), _ts("2024-01-03")]),
                "v": pa.array([100.0, 104.0, 106.0, 203.0]),
                "rid": pa.array([1, 2, 3, 4], pa.int64()),
            }
        )
    )
    out = (
        asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            value_cols=["v", "rid"], tiebreak=["rid"], n_partitions=4,
        )
        .to_pandas()
        .sort_values(["k", "lts"])
        .reset_index(drop=True)
    )
    # left dtypes survive the null-padded union
    assert out["payload"].dtype == "int64" and out["k"].dtype == "int64"
    # k=1 @ Jan5 -> Jan4 event (v=104); k=1 @ Jan1 -> exact match Jan1 (v=100)
    k1 = out[out.k == 1].sort_values("lts")
    assert k1["v"].tolist() == [100.0, 104.0]
    # k=2 @ Jan10 -> Jan3 event; k=3 has no right rows -> NaN
    assert out[out.k == 2]["v"].tolist() == [203.0]
    assert out[out.k == 3]["v"].isna().all()
    assert len(out) == 4


def test_asof_tiebreak_max_wins():
    left = rd.from_arrow(
        pa.table({"k": pa.array([7], pa.int64()), "lts": pa.array([_ts("2024-02-01")])})
    )
    # two right rows at the identical (k, ts): max rid must win
    right = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([7, 7], pa.int64()),
                "rts": pa.array([_ts("2024-01-15"), _ts("2024-01-15")]),
                "v": pa.array([1.0, 2.0]),
                "rid": pa.array([5, 9], pa.int64()),
            }
        )
    )
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        value_cols=["v", "rid"], tiebreak=["rid"], n_partitions=2,
    ).to_pandas()
    assert len(out) == 1
    assert out["rid"].iloc[0] == 9 and out["v"].iloc[0] == 2.0


def test_asof_matches_duckdb_oracle():
    import duckdb

    import __ray_entry__ as entrymod

    sf_dir = "/root/testdata/sf0.001"
    got = entrymod._asof_events(sf_dir)
    con = duckdb.connect()
    for t in ("orders", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    exp = con.execute(entrymod.oracle_sql()["asof_join"]).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=True
    )
