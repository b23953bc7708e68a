"""Duplicated-substring coverage (ops/substring.py)."""

import duckdb
import pandas as pd
import pyarrow as pa

from harvester_ray.ops import substring


def _docs(texts):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def _run(texts, min_len):
    out = substring.substring_dup_coverage(_docs(texts), min_len=min_len).to_pandas()
    return (
        out.reindex(columns=["doc_id", "n_chars", "covered", "dup_frac"])
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_planted_shared_span(ray_session):
    # docs 0/1 share one 10-char span at different offsets; doc 2 is unique
    shared = "XXXXYYYYZZ"
    texts = [
        "abcdefgh" + shared + "ijklmnop",
        "qrstuvwx" + shared + "yz012345",
        "the quick brown fox jumps over it",
    ]
    out = _run(texts, min_len=10)
    # only the shared span's single window duplicates (flanks differ)
    assert list(out["doc_id"]) == [0, 1]
    assert list(out["covered"]) == [10, 10]
    assert list(out["n_chars"]) == [26, 26]
    # 10/26 -> floor(384615.38.. + .5)/1e6
    assert list(out["dup_frac"]) == [0.384615, 0.384615]


def test_within_doc_repeat_counts(ray_session):
    # the same window twice inside ONE doc is a duplicate (Lee et al.)
    t = "ABCDEFGHIJ--middle--ABCDEFGHIJ"
    out = _run([t, "no duplicated content in here!"], min_len=10)
    assert list(out["doc_id"]) == [0]
    assert out["covered"][0] == 20  # two disjoint 10-char occurrences


def test_overlap_union_not_double_counted(ray_session):
    # long run of 'a' duplicates everywhere; union must cap at n_chars
    texts = ["a" * 40, "a" * 25]
    out = _run(texts, min_len=10)
    assert list(out["covered"]) == [40, 25]
    assert list(out["dup_frac"]) == [1.0, 1.0]


def test_short_docs_produce_no_row(ray_session):
    out = _run(["tiny", "also small", "x" * 9], min_len=10)
    assert len(out) == 0


def test_matches_duckdb_oracle_and_partition_independent(ray_session):
    texts = [
        f"prefix{i % 4} common boilerplate sentence shared across documents "
        f"tail{i} unique trailing content {i * 17}"
        for i in range(30)
    ] + ["ünïcödé repeated span ünïcödé repeated span ünïcödé repeated span"] * 2
    a = _run(texts, min_len=12)
    b = (
        substring.substring_dup_coverage(_docs(texts).repartition(7), min_len=12)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[["doc_id", "n_chars", "covered", "dup_frac"]]
    )
    pd.testing.assert_frame_equal(a, b)

    con = duckdb.connect()
    con.register(
        "documents",
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
    )
    ora = con.execute(substring.substring_dup_coverage_sql(min_len=12)).df()
    pd.testing.assert_frame_equal(a, ora.reset_index(drop=True))
