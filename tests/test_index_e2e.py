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


def test_actor_death_mid_build_resumes_identically(ray_session, tmp_path):
    """Chaos: a SegmentBuilder actor PROCESS dies mid-__call__ (after
    leaving a partial .tmp file behind). Ray Data's actor pool restarts the
    actor and retries the task; the fingerprinted-marker + atomic-rename
    protocol must yield an index byte-identical to an undisturbed build,
    with no duplicate or stray segment files (VERDICT r3 item 7 — actual
    actor death, complementing the driver-kill resume test)."""
    import glob
    import json as _json

    import pyarrow.parquet as _pq

    ds_cols = ["doc_id", "text"]
    ref_root = str(tmp_path / "ref")
    build.build_index(
        rd.read_parquet(DOCS, columns=ds_cols), ref_root,
        concurrency=2, batch_size=100,
    )

    flag = str(tmp_path / "killed.flag")

    class KillingSegmentBuilder(build.SegmentBuilder):
        def __call__(self, batch):
            # exactly one actor, on one batch, dies mid-write: leave a
            # partial tmp file (atomicity probe) then hard-exit the process
            try:
                fd = os.open(flag, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                ids = np.asarray(batch["doc_id"].combine_chunks().cast("int64"))
                name = f"seg-{ids.min():012d}-{ids.max():012d}"
                with open(os.path.join(self.seg_dir, name + ".bin.tmp"), "wb") as f:
                    f.write(b"partial garbage")
                os._exit(1)
            except FileExistsError:
                pass
            return super().__call__(batch)

    chaos_root = str(tmp_path / "chaos")
    orig = build.SegmentBuilder
    build.SegmentBuilder = KillingSegmentBuilder
    try:
        man = build.build_index(
            rd.read_parquet(DOCS, columns=ds_cols), chaos_root,
            concurrency=2, batch_size=100,
        )
    finally:
        build.SegmentBuilder = orig

    assert os.path.exists(flag), "the chaos actor never fired"
    assert man["n_docs"] == 500

    ref_man = mf.read_manifest(ref_root, mf.current_version(ref_root))
    chaos_man = mf.read_manifest(chaos_root, mf.current_version(chaos_root))
    ref_segs = sorted(s["name"] for s in ref_man["segments"])
    chaos_segs = sorted(s["name"] for s in chaos_man["segments"])
    assert ref_segs == chaos_segs  # no duplicate or missing segments

    ref_paths = {s["name"]: s["path"] for s in ref_man["segments"]}
    chaos_paths = {s["name"]: s["path"] for s in chaos_man["segments"]}
    # byte-identical segment payloads, marker fingerprints equal
    for seg in ref_segs:
        for ext in (".terms.parquet", ".docs.parquet", ".bin"):
            a = os.path.join(ref_root, ref_paths[seg] + ext)
            b = os.path.join(chaos_root, chaos_paths[seg] + ext)
            with open(a, "rb") as fa, open(b, "rb") as fb:
                assert fa.read() == fb.read(), f"{seg}{ext} differs"
        with open(os.path.join(ref_root, ref_paths[seg] + ".done")) as f:
            fa = _json.load(f)["fingerprint"]
        with open(os.path.join(chaos_root, chaos_paths[seg] + ".done")) as f:
            fb = _json.load(f)["fingerprint"]
        assert fa == fb

    # the victim's partial tmp file must not have leaked into the live set:
    # every segment file on disk belongs to the manifest
    live = set()
    for seg in chaos_segs:
        for ext in (".terms.parquet", ".docs.parquet", ".bin", ".done"):
            live.add(seg + ext)
    seg_dir = os.path.dirname(os.path.join(chaos_root, next(iter(chaos_paths.values()))))
    on_disk = {
        os.path.basename(p)
        for p in glob.glob(os.path.join(seg_dir, "seg-*"))
        if not p.endswith(".tmp")
    }
    assert on_disk == live
    # a stray .tmp may remain (the victim died before rename) — it must be
    # ignored by readers; queries on both roots agree
    ra = query.IndexReader(ref_root).search("spark window", k=5).to_pandas()
    rb = query.IndexReader(chaos_root).search("spark window", k=5).to_pandas()
    assert list(ra["doc_id"]) == list(rb["doc_id"])
    np.testing.assert_allclose(ra["score"], rb["score"], rtol=0, atol=0)


def test_msearch_matches_sequential(index_root):
    svc = query.QueryService(index_root, num_actors=2)
    try:
        batch = [("spark window", "and"), ("table", "or"),
                 ("nosuchterm", "and"), ("", "or"),
                 ("vector stream sort", "and")]
        many = svc.msearch(batch, k=10)
        for (q, mode), got in zip(batch, many):
            exp = svc.search(q, k=10, mode=mode)
            assert got.to_pandas().equals(exp.to_pandas()), (q, mode)
    finally:
        svc.shutdown()


def test_query_service_warm(index_root):
    svc = query.QueryService(index_root, num_actors=2)
    try:
        n = svc.warm(["spark window", "table", "nosuchterm"])
        assert n > 0
        got = svc.search("spark window", k=5).to_pandas()
        exp = query.IndexReader(index_root).search("spark window", k=5).to_pandas()
        assert list(got["doc_id"]) == list(exp["doc_id"])
        # warmed terms are cache hits from the first query on
        stats = svc.actor_stats()
        assert sum(a["cache_hits"] for a in stats) > 0
    finally:
        svc.shutdown()
