"""Multi-field weighted BM25 (index/bm25f.py)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from harvester_ray.index import bm25f, build as ib, query as iq


def _corpus(tmp_path):
    t = pa.table(
        {
            "doc_id": pa.array(list(range(8)), pa.int64()),
            "title": pa.array(
                [
                    "alpha report", "beta summary", "alpha beta notes", "gamma",
                    "delta alpha", "beta beta beta", "epsilon", "alpha",
                ]
            ),
            "body": pa.array(
                [
                    "the quick brown fox", "alpha appears here in the body",
                    "nothing relevant", "alpha alpha alpha dense body",
                    "beta only body", "unrelated words entirely",
                    "alpha and beta both present", "empty",
                ]
            ),
        }
    )
    path = os.path.join(tmp_path, "corpus.parquet")
    pq.write_table(t, path)
    return path


def test_weighted_fields_match_sql_oracle(ray_session, tmp_path):
    import ray.data as rd

    path = _corpus(str(tmp_path))
    readers = {}
    for col in ("title", "body"):
        root = os.path.join(str(tmp_path), f"idx-{col}")
        ib.build_index(
            rd.read_parquet(path, columns=["doc_id", col]), root, text_col=col
        )
        readers[col] = iq.IndexReader(root)
    weights = {"title": 2.0, "body": 1.0}
    got = bm25f.search_weighted_fields(readers, weights, "alpha beta", k=5)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW corpus AS SELECT * FROM read_parquet('{path}')")
    exp = con.execute(bm25f.bm25f_sql("corpus", "alpha beta", weights, k=5)).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype({"doc_id": "int64"}),
        exp.astype({"doc_id": "int64"}),
    )
    # boost actually applied: title hit (doc 2, alpha+beta in title) must
    # outrank the comparable body-only hit (doc 6, alpha+beta in body)
    rank = {d: i for i, d in enumerate(got["doc_id"].tolist())}
    assert rank[2] < rank[6]


def test_empty_query_returns_empty(ray_session, tmp_path):
    import ray.data as rd

    path = _corpus(str(tmp_path))
    root = os.path.join(str(tmp_path), "idx-t")
    ib.build_index(rd.read_parquet(path, columns=["doc_id", "title"]), root, text_col="title")
    out = bm25f.search_weighted_fields(
        {"title": iq.IndexReader(root)}, {"title": 1.0}, "zzznope", k=5
    )
    assert len(out) == 0


def test_dis_max_matches_sql_oracle(ray_session, tmp_path):
    import ray.data as rd

    path = _corpus(str(tmp_path))
    readers = {}
    for col in ("title", "body"):
        root = os.path.join(str(tmp_path), f"dmidx-{col}")
        ib.build_index(
            rd.read_parquet(path, columns=["doc_id", col]), root, text_col=col
        )
        readers[col] = iq.IndexReader(root)
    weights = {"title": 2.0, "body": 1.0}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW corpus AS SELECT * FROM read_parquet('{path}')")
    for tie in (0.0, 0.3, 1.0):
        got = bm25f.search_dis_max(
            readers, weights, "alpha beta", k=8, tie_breaker=tie
        )
        exp = con.execute(
            bm25f.dis_max_sql("corpus", "alpha beta", weights, 8, tie_breaker=tie)
        ).fetchdf()
        assert list(got["doc_id"]) == list(exp["doc_id"]), tie
        np.testing.assert_allclose(got["score"], exp["score"], atol=1e-9)
    # tie_breaker=1.0 must equal the weighted-sum combiner's ranking
    full = bm25f.search_weighted_fields(readers, weights, "alpha beta", k=8)
    dm1 = bm25f.search_dis_max(readers, weights, "alpha beta", k=8, tie_breaker=1.0)
    assert list(full["doc_id"]) == list(dm1["doc_id"])
    np.testing.assert_allclose(full["score"], dm1["score"], atol=2e-4)
