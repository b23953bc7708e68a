"""Broadcast phrase-dictionary tagging (ops/tagging.py)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from harvester_ray.ops import tagging


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


def _run(texts, phrases):
    out = tagging.keyword_tags(_docs(texts), phrases).to_pandas()
    return out.sort_values(["doc_id", "phrase"]).reset_index(drop=True)


def test_basic_and_overlapping(ray_session):
    out = _run(
        [
            "the quick brown fox",  # one hit
            "a a a",  # "a a" overlaps: 2 hits
            "nothing relevant here",
        ],
        ("quick brown", "a a"),
    )
    assert list(out.doc_id) == [0, 1]
    assert list(out.phrase) == ["quick brown", "a a"]
    assert list(out.n_hits) == [1, 2]


def test_tokenizer_normalization(ray_session):
    # phrase matching goes through the analyzer: case and punctuation fold
    out = _run(["Quick, BROWN!"], ("quick brown",))
    assert list(out.n_hits) == [1]


def test_single_token_and_short_doc(ray_session):
    out = _run(["spark", "spa"], ("spark", "big query engine"))
    assert list(out.phrase) == ["spark"]
    assert list(out.doc_id) == [0]


def test_empty_phrase_rejected(ray_session):
    with pytest.raises(ValueError):
        tagging.keyword_tags(_docs(["x"]), ("!!!",)).to_pandas()


def test_oracle_and_partition_independent(ray_session):
    texts = [f"w{i % 3} spark merge batch w{i} table part spark" for i in range(40)]
    phrases = ("spark", "merge batch", "table part", "absent phrase")
    a = _run(texts, phrases)
    b = (
        tagging.keyword_tags(_docs(texts).repartition(7), phrases)
        .to_pandas()
        .sort_values(["doc_id", "phrase"])
        .reset_index(drop=True)
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
    ora = con.execute(tagging.keyword_tags_sql("documents", phrases)).df()
    pd.testing.assert_frame_equal(a, ora.reset_index(drop=True))
    assert set(a.phrase) == {"spark", "merge batch", "table part"}
    assert (a[a.phrase == "spark"].n_hits == 2).all()
