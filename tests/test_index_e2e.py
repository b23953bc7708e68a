import os

import duckdb
import numpy as np
import pytest
import ray.data as rd

from harvester_ray.index import build, manifest as mf, oracle, query

SF_DIR = "/root/testdata/sf0.001"
DOCS = os.path.join(SF_DIR, "documents.parquet")


@pytest.fixture(scope="module")
def index_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx"))
    ds = rd.read_parquet(DOCS, columns=["doc_id", "text"])
    man = build.build_index(ds, root, concurrency=2, input_desc=DOCS)
    assert man["n_docs"] == 500
    return root


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DOCS}')")
    return c


QUERIES = [
    "spark window",
    "table",
    "vector stream sort",
    "customer query big",
    "nosuchterm",
    "table nosuchterm",  # AND with an absent term → empty
]


def _oracle_exact(con, q, k, mode="and"):
    sql = oracle.bm25_sql("documents", q, k, mode=mode, round_digits=12)
    return con.execute(sql).fetchdf()


@pytest.mark.parametrize("q", QUERIES)
def test_and_search_matches_duckdb_oracle(index_root, con, q):
    reader = query.IndexReader(index_root)
    got = reader.search(q, k=10, mode="and").to_pandas()
    exp = _oracle_exact(con, q, 10, mode="and")
    assert list(got["doc_id"]) == list(exp["doc_id"]), f"query={q!r}"
    np.testing.assert_allclose(got["score"], exp["score"], rtol=1e-9)


@pytest.mark.parametrize("q", ["spark window", "table", "vector stream sort"])
def test_or_search_matches_duckdb_oracle(index_root, con, q):
    reader = query.IndexReader(index_root)
    got = reader.search(q, k=10, mode="or").to_pandas()
    exp = _oracle_exact(con, q, 10, mode="or")
    assert list(got["doc_id"]) == list(exp["doc_id"]), f"query={q!r}"
    np.testing.assert_allclose(got["score"], exp["score"], rtol=1e-9)


@pytest.mark.parametrize("q", ["spark window", "table"])
def test_brute_force_matches_index(index_root, q):
    reader = query.IndexReader(index_root)
    ds = rd.read_parquet(DOCS, columns=["doc_id", "text"])
    brute = query.brute_force_topk(ds, q, k=10, mode="and").to_pandas()
    idx = reader.search(q, k=10, mode="and").to_pandas()
    assert list(brute["doc_id"]) == list(idx["doc_id"])
    np.testing.assert_allclose(brute["score"], idx["score"], rtol=1e-9)


def test_query_service_actor_pool(index_root):
    svc = query.QueryService(index_root, num_actors=2)
    reader = query.IndexReader(index_root)
    for q in ["spark window", "table"]:
        got = svc.search(q, k=10).to_pandas()
        exp = reader.search(q, k=10).to_pandas()
        assert list(got["doc_id"]) == list(exp["doc_id"])
        np.testing.assert_allclose(got["score"], exp["score"], rtol=1e-12)


def test_corpus_stats_match_oracle(index_root, con):
    man = mf.read_manifest(index_root)
    exp = con.execute(oracle.corpus_stats_sql("documents")).fetchdf().iloc[0]
    assert man["n_docs"] == exp["n_docs"]
    assert man["dl_sum"] == exp["dl_sum"]
    assert abs(man["avgdl"] - exp["avgdl"]) < 1e-5


def test_termstats_match_oracle(index_root, con):
    import pyarrow.dataset as pads

    man = mf.read_manifest(index_root)
    ts = (
        pads.dataset(os.path.join(index_root, man["termstats"]))
        .to_table()
        .to_pandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    exp = con.execute(
        f"""
        WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM documents)
        SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf FROM toks GROUP BY term ORDER BY term
        """
    ).fetchdf()
    assert len(ts) == len(exp)
    assert list(ts["term"]) == list(exp["term"])
    np.testing.assert_array_equal(ts["df"].to_numpy(), exp["df"].to_numpy())
    np.testing.assert_array_equal(ts["cf"].to_numpy(), exp["cf"].to_numpy())


def test_versioning_and_promote(index_root):
    assert mf.current_version(index_root) == 1
    man = mf.read_manifest(index_root)
    assert man["_version"] == 1
    assert man["analyzer"] == "v1"
    assert len(man["segments"]) >= 1
    assert man["metrics"]["docs_per_sec"] is not None


def test_tree_vocab_aggregation_identical(index_root, tmp_path, monkeypatch):
    """GRAFT_VOCAB_TREE_BYTES=0 forces the distributed tree-aggregation
    stage (per-range stage-B tasks, no driver concat); the resulting
    term-stats bucket files must be identical to the small-vocab path."""
    import pyarrow.dataset as pads

    monkeypatch.setenv("GRAFT_VOCAB_TREE_BYTES", "0")
    root2 = str(tmp_path / "idx-tree")
    ds = rd.read_parquet(DOCS, columns=["doc_id", "text"])
    man2 = build.build_index(ds, root2, concurrency=2, input_desc=DOCS)
    man1 = mf.read_manifest(index_root)
    assert man2["n_docs"] == man1["n_docs"]

    def stats(root, man):
        return (
            pads.dataset(os.path.join(root, man["termstats"]))
            .to_table()
            .sort_by([("term", "ascending")])
        )

    t1, t2 = stats(index_root, man1), stats(root2, man2)
    assert t1.equals(t2)


def test_segment_metrics_surface(ray_session, tmp_path):
    import math

    import ray.data as rd

    from harvester_ray.index import build, manifest

    root = str(tmp_path / "metidx")
    ds = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    build.build_index(ds, root, concurrency=2)
    m = build.segment_metrics(root)
    man = manifest.read_manifest(root, None)
    assert len(m) == len(man["segments"]) > 0
    assert (m["bytes"] > 0).all()
    assert (m["n_terms"] > 0).all()
    assert m["encode_sec"].notna().all() and (m["encode_sec"] >= 0).all()
    assert m["n_docs"].sum() == man["n_docs"]
    # resume replay keeps the surface usable (encode_sec may be replayed)
    build.build_index(ds, root, concurrency=2)
    m2 = build.segment_metrics(root)
    assert list(m2["segment"]) == list(m["segment"])
    assert list(m2["bytes"]) == list(m["bytes"])
