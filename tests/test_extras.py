import os

import duckdb
import numpy as np
import pytest
import ray.data as rd

from harvester_ray.index import build, extras, query

SF_DIR = "/root/testdata/sf0.001"
DOCS = os.path.join(SF_DIR, "documents.parquet")


@pytest.fixture(scope="module")
def idx(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("xidx"))
    ds = rd.read_parquet(DOCS, columns=["doc_id", "text", "source", "lang"])
    build.build_index(ds, root, concurrency=2, attr_cols=["source", "lang"])
    return root


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DOCS}')")
    return c


def test_more_like_this(idx):
    reader = query.IndexReader(idx)
    out = extras.more_like_this(reader, doc_id=0, k=5).to_pandas()
    assert len(out) == 5
    assert 0 not in set(out["doc_id"])
    assert (out["score"].diff().dropna() <= 1e-12).all()  # descending
    # deterministic
    out2 = extras.more_like_this(reader, doc_id=0, k=5).to_pandas()
    assert list(out["doc_id"]) == list(out2["doc_id"])


def test_suggest_matches_oracle(idx, con):
    reader = query.IndexReader(idx)
    got = extras.suggest(reader, "s", limit=10)
    exp = con.execute(
        """
        WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM documents),
        stats AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term)
        SELECT term, df FROM stats WHERE term LIKE 's%'
        ORDER BY df DESC, term ASC LIMIT 10
        """
    ).fetchdf()
    assert list(got["term"]) == list(exp["term"])
    np.testing.assert_array_equal(got["df"].to_numpy(), exp["df"].to_numpy())


def test_match_counts_exact(idx, con):
    reader = query.IndexReader(idx)
    got = extras.match_counts(reader, "spark window", mode="and", count_fields=["source"])
    exp_total = con.execute(
        """
        WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM documents)
        SELECT count(*) FROM (
          SELECT doc_id FROM toks WHERE term IN ('spark','window')
          GROUP BY doc_id HAVING count(DISTINCT term) = 2)
        """
    ).fetchone()[0]
    assert got["results_total"] == {"value": exp_total, "is_precise": True}
    exp_counts = con.execute(
        """
        WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM documents),
        m AS (SELECT doc_id FROM toks WHERE term IN ('spark','window')
              GROUP BY doc_id HAVING count(DISTINCT term) = 2)
        SELECT d.source, count(*) AS n FROM documents d JOIN m ON d.doc_id = m.doc_id
        GROUP BY d.source ORDER BY d.source
        """
    ).fetchdf()
    assert got["filter_counts"]["source"] == dict(
        zip(exp_counts["source"], (int(x) for x in exp_counts["n"]))
    )


def test_match_counts_with_filters(idx):
    reader = query.IndexReader(idx)
    all_m = extras.match_counts(reader, "table", count_fields=["source"])
    filt = extras.match_counts(
        reader, "table", count_fields=["source"], filters={"source": ["src0"]}
    )
    assert filt["results_total"]["value"] == all_m["filter_counts"]["source"].get("src0", 0)
    assert set(filt["filter_counts"]["source"]) <= {"src0"}


def test_match_counts_absent_term(idx):
    reader = query.IndexReader(idx)
    got = extras.match_counts(reader, "table zzzabsent", mode="and")
    assert got["results_total"]["value"] == 0


def test_more_like_this_matches_sql_oracle(idx, con):
    from harvester_ray.index import oracle

    reader = query.IndexReader(idx)
    got = extras.more_like_this(reader, doc_id=0, k=10).to_pandas()
    exp = con.execute(oracle.more_like_this_sql("documents", 0, 10)).fetchdf()
    assert list(got["doc_id"]) == list(exp["doc_id"])
    np.testing.assert_allclose(
        got["score"].round(4).to_numpy(), exp["score"].to_numpy(), atol=1e-6
    )


def test_ranking_eval_ndcg(idx, con):
    from harvester_ray.index import evaluate

    reader = query.IndexReader(idx)
    got = evaluate.evaluate_ranking(reader, k=10)
    assert ((got["ndcg"] >= 0) & (got["ndcg"] <= 1)).all()
    exp = con.execute(
        evaluate.evaluate_ranking_sql("documents", k=10)
    ).fetchdf().sort_values("query").reset_index(drop=True)
    assert list(got["query"]) == list(exp["query"])
    np.testing.assert_allclose(got["ndcg"].to_numpy(), exp["ndcg"].to_numpy(), atol=1e-6)
    np.testing.assert_allclose(got["mean_rel"].to_numpy(), exp["mean_rel"].to_numpy(), atol=1e-6)
    # the fixture must be able to DETECT a ranking regression: at least one
    # query's top-10 must have non-trivial ideal ordering (ndcg < 1)
    assert (got["ndcg"] < 1.0).any(), "query set is degenerate: every ndcg == 1"


def test_ndcg_unit():
    from harvester_ray.index.evaluate import ndcg_at_k

    assert ndcg_at_k(np.array([], dtype=float)) == 0.0
    assert ndcg_at_k(np.array([3.0, 2.0, 1.0])) == 1.0  # already ideal order
    worse = ndcg_at_k(np.array([1.0, 2.0, 3.0]))
    assert 0 < worse < 1.0
    assert ndcg_at_k(np.array([0.0, 0.0])) == 0.0  # no relevant docs
