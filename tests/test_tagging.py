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


def test_watermark_greenlist_oracle(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from harvester_ray.ops import text_analysis

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "alpha beta gamma delta eps zeta eta theta",
            "one two one two one two one two one two",
            "solo",
            "",
        ],
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = text_analysis.watermark_greenlist(ds)
    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute(text_analysis.watermark_greenlist_sql("documents")).fetchdf()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # single-token and empty docs: T = 0, z NULL
    assert got.iloc[2]["n_scored"] == 0 and np.isnan(got.iloc[2]["z"])
    assert got.iloc[3]["n_scored"] == 0
    # a "watermarked" doc: craft tokens where every bigram is green by
    # searching greedily for green successors — its z must exceed 3
    import hashlib

    vocab = [f"w{i}" for i in range(200)]
    cur, toks = "w0", ["w0"]
    for _ in range(60):
        for cand in vocab:
            h = int(hashlib.md5(f"{cur} {cand}".encode()).hexdigest()[:16], 16)
            if h % 4 == 0:
                toks.append(cand)
                cur = cand
                break
    wm = pd.DataFrame({"doc_id": [0], "text": [" ".join(toks)]})
    z = text_analysis.watermark_greenlist(
        rd.from_arrow(pa.Table.from_pandas(wm, preserve_index=False))
    ).iloc[0]["z"]
    assert z > 3.0
    # partition-independence
    again = text_analysis.watermark_greenlist(ds.repartition(3))
    pd.testing.assert_frame_equal(got, again, check_dtype=False)
