"""Deterministic hash splits + stratified sampling (ops/sampling.py)."""

import numpy as np
import pyarrow as pa

from harvester_ray.ops import sampling


def _docs(n=1000):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(n)), pa.int64()),
                "lang": pa.array(["en" if i % 2 else "de" for i in range(n)]),
            }
        )
    )


def test_split_partition_independent(ray_session):
    a = sampling.assign_split(_docs()).to_pandas().sort_values("doc_id")
    b = (
        sampling.assign_split(_docs().repartition(7))
        .to_pandas()
        .sort_values("doc_id")
    )
    assert a["split"].tolist() == b["split"].tolist()


def test_split_fractions_roughly_match(ray_session):
    out = sampling.assign_split(_docs(4000)).to_pandas()["split"].value_counts()
    assert abs(out.get("train", 0) / 4000 - 0.8) < 0.05
    assert abs(out.get("val", 0) / 4000 - 0.1) < 0.04
    assert abs(out.get("test", 0) / 4000 - 0.1) < 0.04


def test_split_exhaustive_and_disjoint(ray_session):
    out = sampling.assign_split(_docs(500)).to_pandas()
    assert len(out) == 500
    assert set(out["split"]) <= {"train", "val", "test"}


def test_stratified_rates_and_determinism(ray_session):
    out1 = sampling.stratified_sample(
        _docs(2000), strata_col="lang", rates={"en": 0.2}
    ).to_pandas()
    out2 = sampling.stratified_sample(
        _docs(2000).repartition(5), strata_col="lang", rates={"en": 0.2}
    ).to_pandas()
    assert sorted(out1["doc_id"]) == sorted(out2["doc_id"])
    en = (out1["lang"] == "en").sum()
    de = (out1["lang"] == "de").sum()
    assert de == 1000  # default rate 1.0 keeps every de row
    assert abs(en / 1000 - 0.2) < 0.05


def test_zero_rate_drops_stratum(ray_session):
    out = sampling.stratified_sample(
        _docs(200), strata_col="lang", rates={"en": 0.0}
    ).to_pandas()
    assert not (out["lang"] == "en").any()


def _src_docs():
    import ray.data as rd

    # skewed sources: one giant, one mid, one tiny
    sizes = {"big": 900, "mid": 90, "tiny": 10}
    rows_src, rows_id = [], []
    i = 0
    for s, n in sizes.items():
        for _ in range(n):
            rows_src.append(s)
            rows_id.append(i)
            i += 1
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(rows_id, pa.int64()),
        "source": pa.array(rows_src),
    }))


def test_source_mixture_rebalances(ray_session):
    out = sampling.source_mixture(_src_docs(), target_total=300)
    got = dict(zip(out["source"], zip(out["n_total"], out["n_sampled"])))
    assert got["big"][0] == 900 and got["tiny"][0] == 10
    assert all(s <= t for t, s in got.values())
    # temperature alpha=0.5 keeps ALL of a tiny source (rate hits 1) while
    # downsampling the giant far below its proportional share
    assert got["tiny"][1] == 10
    prop_big = 300 * 900 / 1000  # proportional share would be 270
    assert got["big"][1] < 0.8 * prop_big
    # deterministic + partition-independent
    again = sampling.source_mixture(_src_docs().repartition(7), target_total=300)
    assert out.equals(again)


def test_source_mixture_matches_oracle(ray_session, tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    t = pa.table({
        "doc_id": pa.array(list(range(500)), pa.int64()),
        "source": pa.array([f"s{i % 7}" for i in range(500)]),
    })
    p = str(tmp_path / "docs.parquet")
    pq.write_table(t, p)
    import ray.data as rd

    got = sampling.source_mixture(rd.read_parquet(p), target_total=120)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
    exp = con.execute(
        sampling.source_mixture_sql("documents", target_total=120)
    ).fetchdf()
    import pandas as pd

    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_interleave_sources_fairness_and_order(ray_session):
    import pandas as pd
    import ray.data as rd

    sizes = {"a": 200, "b": 100, "c": 50}
    weights = {"a": 3, "b": 2}  # c defaults to 1
    rows_s, rows_i = [], []
    i = 0
    for s, n in sizes.items():
        for _ in range(n):
            rows_s.append(s)
            rows_i.append(i)
            i += 1
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(rows_i, pa.int64()),
        "source": pa.array(rows_s),
    }))
    res = sampling.interleave_sources(ds, weights, n=120)
    assert list(res["seq"]) == list(range(1, 121))
    # (a) within each source the original doc order is preserved
    for s in sizes:
        ids = res.loc[res["source"] == s, "doc_id"].tolist()
        assert ids == sorted(ids)
    # (b) stride fairness: every prefix's per-source share tracks the
    # weights within one stride's worth of items
    W = 3 + 2 + 1
    counts = {s: 0 for s in sizes}
    for p, s in enumerate(res["source"], start=1):
        counts[s] += 1
        for src, w in (("a", 3), ("b", 2), ("c", 1)):
            assert abs(counts[src] - p * w / W) <= 2, (p, src, counts)
    # (c) partition-independent
    again = sampling.interleave_sources(ds.repartition(5), weights, n=120)
    pd.testing.assert_frame_equal(res, again)
