import os

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from harvester_ray.index import build, oracle, query, similarities

SF_DIR = "/root/testdata/sf0.001"
DOCS = os.path.join(SF_DIR, "documents.parquet")
Q = "spark window"


@pytest.fixture(scope="module")
def idx(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("simidx"))
    ds = rd.read_parquet(DOCS, columns=["doc_id", "text"])
    build.build_index(ds, root, concurrency=2)
    return root


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DOCS}')")
    return c


@pytest.mark.parametrize("model", ["lm_dirichlet", "classic", "lm_jelinek_mercer"])
@pytest.mark.parametrize("mode", ["or", "and"])
def test_similarity_matches_oracle(idx, con, model, mode):
    r = query.IndexReader(idx)
    got = similarities.search_similarity(r, Q, model=model, k=10, mode=mode)
    exp = con.execute(
        oracle.similarity_sql("documents", Q, model=model, k=10, mode=mode)
    ).fetchdf()
    assert len(got) == len(exp) > 0
    np.testing.assert_array_equal(got["doc_id"].to_numpy(), exp["doc_id"].to_numpy())
    np.testing.assert_allclose(
        got["score"].to_numpy(), exp["score"].to_numpy(), rtol=0, atol=0
    )


def test_similarity_rankings_differ_from_bm25(idx):
    """Fixture degeneracy check: each model must produce a top-10 that is
    NOT identical to the BM25 ordering, or the gates couldn't detect a
    model regression."""
    r = query.IndexReader(idx)
    bm25_ids = list(r.search(Q, k=10, mode="or").to_pandas()["doc_id"])
    lmd = list(
        similarities.search_similarity(r, Q, model="lm_dirichlet", k=10, mode="or")["doc_id"]
    )
    classic = list(
        similarities.search_similarity(r, Q, model="classic", k=10, mode="or")["doc_id"]
    )
    jm = list(
        similarities.search_similarity(
            r, Q, model="lm_jelinek_mercer", k=10, mode="or"
        )["doc_id"]
    )
    assert lmd != bm25_ids
    assert classic != bm25_ids
    assert jm != bm25_ids
    assert lmd != classic
    assert jm != lmd


def test_lm_dirichlet_prefers_shorter_docs_at_equal_tf(idx):
    """The doc-norm term ln(mu/(dl+mu)) must penalize longer docs: among
    matched docs with identical tf vectors, the shorter one scores
    higher."""
    r = query.IndexReader(idx)
    out = similarities.search_similarity(
        r, Q, model="lm_dirichlet", k=1000, mode="and"
    )
    assert (out["score"].diff().dropna() <= 1e-12).all()
