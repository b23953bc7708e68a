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
