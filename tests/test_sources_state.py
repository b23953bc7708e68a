"""Seeding merge/back_fill strategies, webhook ingestion, read-back API,
URL prober (reference resource.py:79-96,144-189; views/document.py:22-83;
files/tasks/metadata.py:11-61)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from harvester_ray.index import build, incremental, manifest as mf, readback
from harvester_ray.ops import probe
from harvester_ray.sources import objective

DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_merge_phase_overwrites_and_appends():
    seeds = rd.from_items(
        [
            {"sid": 1, "title": "old-one", "views": 5},
            {"sid": 2, "title": "old-two", "views": 6},
            {"sid": 3, "title": "old-three", "views": 7},
        ]
    )
    extra = pd.DataFrame(
        {"sid": [1, 3], "title": ["new-one", None], "extra_field": ["a", "b"]}
    )
    out = (
        objective.merge_phase(seeds, extra, merge_on="sid")
        .to_pandas()
        .sort_values("sid")
        .reset_index(drop=True)
    )
    assert out.loc[0, "title"] == "new-one"  # non-null extra overwrites
    assert out.loc[1, "title"] == "old-two"  # no match: untouched
    assert out.loc[2, "title"] == "old-three"  # null extra value: keeps seed
    assert out.loc[0, "extra_field"] == "a"
    assert out.loc[1, "extra_field"] is None or pd.isna(out.loc[1, "extra_field"])
    assert list(out["views"]) == [5, 6, 7]


def test_back_fill_phase_expands():
    seeds = rd.from_items([{"sid": 1, "n": 2}, {"sid": 2, "n": 0}, {"sid": 3, "n": 1}])
    schema = pa.schema([("sid", pa.int64()), ("detail", pa.int64())])

    def expand(r):
        return [{"sid": r["sid"], "detail": i} for i in range(r["n"])]

    out = (
        objective.back_fill_phase(seeds, expand, schema=schema)
        .to_pandas()
        .sort_values(["sid", "detail"])
        .reset_index(drop=True)
    )
    assert list(zip(out["sid"], out["detail"])) == [(1, 0), (1, 1), (3, 0)]


def test_webhook_ingest_and_readback(tmp_path):
    root = str(tmp_path / "idx")
    base = rd.read_parquet(DOCS, columns=["doc_id", "text"])
    build.build_index(base, root, input_desc="base")
    v1 = mf.current_version(root)

    man = incremental.ingest_document(
        root, {"doc_id": 90_001, "text": "webhook spark delivery"}
    )
    assert man["lineage"]["input"] == "webhook:90001"
    v2 = mf.current_version(root)
    assert v2 == v1 + 1

    # read-back: modified_since v2 → exactly the webhook doc
    recent = readback.read_documents(root, modified_since_version=v2).to_pandas()
    assert list(recent["doc_id"]) == [90_001]
    assert (recent["created_version"] == v2).all()
    # full listing: all live docs
    all_docs = readback.read_documents(root).to_pandas()
    assert len(all_docs) == man["n_docs"]
    # detail endpoint
    d = readback.get_document(root, 90_001)
    assert d["created_version"] == v2
    # webhook delete → doc disappears from read-back
    incremental.ingest_document(root, {"doc_id": 90_001, "text": None})
    gone = readback.read_documents(root).to_pandas()
    assert 90_001 not in set(gone["doc_id"])
    assert readback.get_document(root, 90_001) is None


def test_url_prober_actor_pool():
    urls = rd.from_items([{"url": f"http://example.org/f/{i}"} for i in range(100)])
    out = probe.check_urls(urls, concurrency=2, batch_size=16).to_pandas()
    assert len(out) == 100
    assert set(out.columns) == {"url", "status", "redirect_url", "content_type", "is_not_found"}
    assert ((out["status"] == 404) == out["is_not_found"]).all()
    redir = out[out["status"].isin([301, 302])]
    assert (redir["redirect_url"].str.endswith("/moved")).all()
    # deterministic: same urls → same probe results
    out2 = probe.check_urls(urls, concurrency=1, batch_size=32).to_pandas()
    a = out.sort_values("url").reset_index(drop=True)
    b = out2.sort_values("url").reset_index(drop=True)
    assert a.equals(b)


def test_vocab_closure_ancestors_and_roots():
    vocab = pd.DataFrame(
        {
            "value": ["root", "a", "b", "a1", "orphan-child"],
            "parent": [None, "root", "root", "a", "missing-parent"],
        }
    )
    from harvester_ray.functions import vocab as vb

    anc, roots = vb.build_closure(vocab)
    assert anc["a1"] == ("a", "a1", "root")
    assert roots["a1"] == "root"
    assert roots["root"] == "root"
    # dangling parent counts as the root (reference DoesNotExist fallback)
    assert roots["orphan-child"] == "missing-parent"

    ds = rd.from_items(
        [
            {"id": 1, "vals": ["a1", "b"]},
            {"id": 2, "vals": ["unknown"]},
            {"id": 3, "vals": []},
        ]
    )
    out = vb.expand_ancestors(ds, vocab, col="vals").to_pandas().sort_values("id")
    assert list(list(out["ancestors"])[0]) == ["a", "a1", "b", "root"]
    assert list(list(out["ancestors"])[1]) == ["unknown"]  # passthrough
    assert len(list(out["ancestors"])[2]) == 0

    import pytest

    cyc = pd.DataFrame({"value": ["x", "y"], "parent": ["y", "x"]})
    with pytest.raises(ValueError, match="cycle"):
        vb.build_closure(cyc)


def test_run_harvest_end_to_end(tmp_path_factory, ray_session):
    """Full lifecycle: paged source -> OBJECTIVE extract -> clean/validate
    -> index -> promote; then a delta harvest with the integrity guard."""
    import numpy as np

    from harvester_ray.index import query
    from harvester_ray.pipelines import harvest

    def fetch(page: int) -> list[dict]:
        out = []
        for i in range(10):
            did = page * 10 + i
            out.append({
                "meta": {"id": did},
                "body": {"content": f"spark window doc {did}"
                         if did % 2 else f"batch stream {did}"},
            })
        if page == 0:  # invalid record: no identity -> validation drops it
            out.append({"meta": {}, "body": {"content": "orphan"}})
        return out

    objective = {
        "@": "$",
        "doc_id": "$.meta.id",
        "text": "$.body.content",
    }
    root = str(tmp_path_factory.mktemp("harvest-idx"))
    man = harvest.run_harvest(fetch, 5, objective, root)
    assert man["n_docs"] == 50  # orphan dropped by validation
    assert man["harvest"]["n_pages"] == 5
    hits = query.IndexReader(root).search("spark window", k=5, mode="and").to_pandas()
    assert len(hits) == 5

    # delta harvest: update one doc, delete one, add one
    def fetch_delta(page: int) -> list[dict]:
        return [
            {"meta": {"id": 1}, "body": {"content": "updated spark text"}},
            {"meta": {"id": 3}, "body": {"content": ""}},   # empty -> delete
            {"meta": {"id": 100}, "body": {"content": "brand new stream"}},
        ]

    man2 = harvest.run_harvest(fetch_delta, 1, objective, root, delta=True)
    r = query.IndexReader(root)
    assert man2["version"] > man["version"]
    got = r.search("stream", k=100, mode="or").to_pandas()
    assert 100 in set(got["doc_id"])
    assert 3 not in set(r.search("batch stream", k=1000, mode="or").to_pandas()["doc_id"])


def test_update_document_partial_merge(ray_session, tmp_path):
    import ray.data as rd

    from harvester_ray.index import build, incremental, manifest, query, readback

    root = str(tmp_path / "updidx")
    ds = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "source"],
    )
    build.build_index(ds, root, concurrency=2, attr_cols=["source"],
                      store_source=True)
    before = readback.get_document(root, 5)
    assert before is not None and before["source"] is not None

    # attr-only partial update: text untouched (merged from stored source)
    incremental.update_document(root, 5, {"source": "patched"})
    after = readback.get_document(root, 5)
    assert after["source"] == "patched"
    assert after["_source"] == before["_source"]
    assert after["dl"] == before["dl"]

    # text update keeps unmentioned attrs
    incremental.update_document(root, 5, {"text": "completely new words"})
    after2 = readback.get_document(root, 5)
    assert after2["source"] == "patched"
    r = query.IndexReader(root)
    hits = r.search("completely new words", k=5, mode="and").to_pandas()
    assert 5 in list(hits["doc_id"])

    # missing id -> document_missing_exception analog
    import pytest as _pytest
    with _pytest.raises(KeyError):
        incremental.update_document(root, 10_000_999, {"source": "x"})

    # _cat/indices lineage: three versions, newest CURRENT, bytes > 0
    cat = build.cat_indices(root)
    assert len(cat) == 3 and bool(cat.iloc[-1]["current"])
    assert (cat["bytes"] > 0).all()
    assert cat.iloc[-1]["n_docs"] == manifest.read_manifest(root, None)["n_docs"]
