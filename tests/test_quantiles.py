"""Distributed order statistics + perplexity buckets (ops/quantiles.py)."""

import numpy as np
import pyarrow as pa
import pytest

from harvester_ray.ops import quantiles


def _scored(keys, ids=None):
    import ray.data as rd

    ids = list(range(len(keys))) if ids is None else ids
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(ids), pa.int64()),
                "key": pa.array(list(keys), pa.int64()),
            }
        )
    ).repartition(4)


def test_kth_pairs_match_sorted_reference(ray_session):
    rng = np.random.RandomState(7)
    keys = rng.randint(0, 1_000_000_000, size=300).tolist()
    ids = list(range(300))
    ref = sorted(zip(keys, ids))
    got = quantiles.kth_smallest_pairs(_scored(keys, ids), [1, 100, 150, 300])
    assert got == [ref[0], ref[99], ref[149], ref[299]]


def test_kth_pairs_tiny_collect_cap_forces_refinement(ray_session):
    keys = [5, 5, 5, 5, 5, 5, 5, 5, 2, 9]
    ids = [17, 3, 40, 8, 22, 51, 4, 30, 99, 1]
    ref = sorted(zip(keys, ids))
    # cap=2 → histogram refinement must narrow to width 1, then refine on id
    got = quantiles.kth_smallest_pairs(
        _scored(keys, ids), [3, 6, 9], collect_cap=2
    )
    assert got == [ref[2], ref[5], ref[8]]


def test_kth_pairs_edges(ray_session):
    assert quantiles.kth_smallest_pairs(_scored([4, 7]), [0]) == [None]
    with pytest.raises(ValueError):
        quantiles.kth_smallest_pairs(_scored([4, 7]), [3])


def _docs(rows):
    import ray.data as rd

    ids, texts = zip(*rows) if rows else ((), ())
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(ids), pa.int64()),
                "text": pa.array(list(texts), pa.string()),
            }
        )
    )


def test_perplexity_buckets_ordering_and_small_n(ray_session):
    # doc 1: all common tokens → lowest NLL → most head-ward
    # doc 3: all rare tokens → highest NLL → most tail-ward
    out = quantiles.perplexity_buckets(
        _docs(
            [
                (1, "the the the the the the"),
                (2, "the the rare the the the"),
                (3, "zeta qoph xylem vug"),
            ]
        )
    )
    assert out["bucket"].tolist() == ["head", "middle", "tail"]
    nll = out["nll_per_token"].to_numpy()
    assert nll[0] < nll[1] < nll[2]
    # N=2: rule 3*rn<=N gives no head
    out2 = quantiles.perplexity_buckets(_docs([(1, "a a a a"), (2, "a b")]))
    assert out2["bucket"].tolist() == ["middle", "tail"]


def test_perplexity_buckets_zero_token_docs_rank_first(ray_session):
    out = quantiles.perplexity_buckets(
        _docs([(1, ""), (2, "w w w"), (3, "w w q")])
    )
    assert out.loc[out["doc_id"] == 1, "bucket"].item() == "head"
    assert out.loc[out["doc_id"] == 1, "nll_per_token"].item() == 0.0


def _events(values, ids=None):
    import ray.data as rd

    ids = list(range(len(values))) if ids is None else ids
    return rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array(list(ids), pa.int64()),
                "value": pa.array([float(v) for v in values], pa.float64()),
            }
        )
    ).repartition(4)


def test_column_percentiles_matches_sorted_reference(ray_session):
    rng = np.random.RandomState(11)
    vals = np.round(rng.uniform(0, 1000, size=200), 6)
    out = quantiles.column_percentiles(_events(vals.tolist()))
    s = np.sort(np.floor(vals * 1e6 + 0.5).astype(np.int64))
    for pct, got in zip(out["pct"], out["value"]):
        k = (pct * 200 + 99) // 100  # ceil(p·N/100)
        assert got == s[k - 1] / 1e6, (pct, got, s[k - 1] / 1e6)
    assert list(out["pct"]) == [50, 90, 99]


def test_column_percentiles_small_and_empty(ray_session):
    out = quantiles.column_percentiles(_events([42.5]))
    # N=1 → every percentile is the single value
    assert (out["value"] == 42.5).all()
    empty = quantiles.column_percentiles(_events([]))
    assert empty.empty and list(empty.columns) == ["pct", "value"]


def test_column_percentiles_duplicate_heavy(ray_session):
    vals = [5.0] * 90 + [1.0] * 5 + [9.0] * 5
    out = quantiles.column_percentiles(_events(vals))
    m = dict(zip(out["pct"], out["value"]))
    assert m[50] == 5.0 and m[90] == 5.0 and m[99] == 9.0
