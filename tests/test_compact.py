import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from harvester_ray.index import build, compact, incremental, manifest as mf, query

DOCS = "/root/testdata/sf0.001/documents.parquet"

QUERIES = [("spark window", "and"), ("table", "or"), ("customer query big", "or")]


def test_compact_after_incremental_chain(tmp_path):
    root = str(tmp_path / "cidx")
    base = rd.read_parquet(DOCS, columns=["doc_id", "text"]).to_pandas()
    build.build_index(rd.from_pandas(base), root, concurrency=2)

    delta = pd.DataFrame(
        [
            {"doc_id": 3, "text": "rewritten spark window doc", "state": "active"},
            {"doc_id": 7, "text": "", "state": "deleted"},
            {"doc_id": 900, "text": "added spark table row", "state": "active"},
        ]
    )
    incremental.build_incremental(root, rd.from_pandas(delta))
    before = {
        (q, m): query.IndexReader(root).search(q, k=25, mode=m).to_pandas()
        for q, m in QUERIES
    }
    pre_man = mf.read_manifest(root)
    assert len(pre_man["tombstones"]) == 3

    man = compact.compact(root, target_segments=2)
    assert man["tombstones"] == []
    assert len(man["segments"]) <= 2
    assert man["n_docs"] == pre_man["n_docs"]
    after = {
        (q, m): query.IndexReader(root).search(q, k=25, mode=m).to_pandas()
        for q, m in QUERIES
    }
    for key in before:
        assert list(before[key]["doc_id"]) == list(after[key]["doc_id"]), key
        np.testing.assert_allclose(before[key]["score"], after[key]["score"], rtol=0)
    # tombstoned/modified docs behave correctly post-compaction
    r = query.IndexReader(root)
    out = r.search("rewritten", k=5).to_pandas()
    assert list(out["doc_id"]) == [3]
    all_docs = r.search("table", k=1000, mode="or").to_pandas()
    assert 7 not in set(all_docs["doc_id"])


def test_compact_preserves_attrs(tmp_path):
    root = str(tmp_path / "aidx")
    ds = rd.read_parquet(DOCS, columns=["doc_id", "text", "source"])
    build.build_index(ds, root, concurrency=2, attr_cols=["source"])
    before = query.IndexReader(root).search("table", k=10, filters={"source": ["src0"]}).to_pandas()
    compact.compact(root, target_segments=1)
    after = query.IndexReader(root).search("table", k=10, filters={"source": ["src0"]}).to_pandas()
    assert list(before["doc_id"]) == list(after["doc_id"])
    np.testing.assert_allclose(before["score"], after["score"], rtol=0)
