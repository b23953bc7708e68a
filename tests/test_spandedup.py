"""Corpus-wide exact span dedup (ops/spandedup.py)."""

import duckdb
import pandas as pd
import pyarrow as pa

from harvester_ray.ops import spandedup


def _docs(texts, ids=None):
    import ray.data as rd

    ids = list(range(len(texts))) if ids is None else ids
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def _run(texts, **kw):
    out = spandedup.span_dedup(_docs(texts), **kw).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_first_occurrence_wins_and_reassembly():
    # span size 2: doc0 = [a b][c d], doc1 repeats [a b] then adds [e f]
    out = _run(["a b c d", "a b e f"], span_words=2)
    assert out.loc[0, "text_dedup"] == "a b c d"
    assert out.loc[0, "n_dropped"] == 0
    assert out.loc[1, "text_dedup"] == "e f"
    assert out.loc[1, "n_dropped"] == 1
    assert out.loc[1, "n_spans"] == 2


def test_all_spans_dropped_yields_null():
    out = _run(["a b c d", "a b c d"], span_words=2)
    assert pd.isna(out.loc[1, "text_dedup"])
    assert out.loc[1, "n_dropped"] == 2


def test_short_tail_span_and_empty_doc():
    # doc0's tail span is a single token; doc2 has no tokens -> no row
    out = _run(["a b c", "c", ""], span_words=2)
    assert len(out) == 2
    assert out.loc[0, "text_dedup"] == "a b c"
    assert out.loc[0, "n_spans"] == 2
    # doc1's lone span "c" duplicates doc0's tail span
    assert pd.isna(out.loc[1, "text_dedup"])


def test_matches_sql_oracle():
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown cat naps all day long here",
        "lorem ipsum dolor sit amet the quick brown fox",
        "jumps over the lazy dog again and again now",
    ]
    eng = _run(texts, span_words=3)
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
    )
    sql = spandedup.span_dedup_sql("documents", span_words=3)
    ora = con.sql(sql).df()
    pd.testing.assert_frame_equal(
        eng[["doc_id", "text_dedup", "n_spans", "n_dropped"]],
        ora,
        check_dtype=False,
    )


def test_partition_independence():
    texts = ["a b c d e f", "c d x y", "e f c d"]
    one = spandedup.span_dedup(_docs(texts), span_words=2, n_partitions=1).to_pandas()
    many = spandedup.span_dedup(_docs(texts), span_words=2, n_partitions=64).to_pandas()
    one = one.sort_values("doc_id").reset_index(drop=True)
    many = many.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(one, many)
