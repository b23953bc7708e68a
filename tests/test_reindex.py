"""ES _source + _reindex analog: stored text survives delta/compaction and
rebuilds a self-contained filtered index (index/reindex.py)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from harvester_ray.index import build as ib
from harvester_ray.index import compact as ic
from harvester_ray.index import incremental, query, readback, reindex

SF_DIR = "/root/testdata/sf0.001"
DOCS = SF_DIR + "/documents.parquet"


@pytest.fixture(scope="module")
def src_index(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("srcidx"))
    ds = rd.read_parquet(DOCS, columns=["doc_id", "text", "lang"])
    man = ib.build_index(ds, root, attr_cols=["lang"], store_source=True)
    assert man["store_source"] is True
    return root


def test_source_not_in_serving_memory(src_index):
    r = query.IndexReader(src_index)
    seg = r._segment(r.manifest["segments"][0])
    assert "_source" not in seg.attrs          # never held in memory
    assert "_source" in seg.stored_cols        # but stored on disk
    docs = seg.doc_ids[:3]
    fetched = seg.stored_values("_source", docs).to_pylist()
    raw = pd.read_parquet(DOCS).set_index("doc_id")["text"]
    assert fetched == [raw[int(d)] for d in docs]


def test_reindex_filtered_matches_direct_build(src_index, tmp_path):
    dest = str(tmp_path / "re")
    reindex.reindex(src_index, dest, filters={"lang": ["en"]})
    direct = str(tmp_path / "direct")
    ds = rd.read_parquet(DOCS, columns=["doc_id", "text", "lang"])
    ds = ds.filter(expr="lang == 'en'")
    ib.build_index(ds, direct, attr_cols=["lang"], store_source=True)
    a = query.IndexReader(dest).search("customer query big", k=10, mode="or").to_pandas()
    b = query.IndexReader(direct).search("customer query big", k=10, mode="or").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    # only en docs present
    langs = set()
    for t in readback.read_documents(dest, columns=["doc_id", "lang"]).to_pandas()["lang"]:
        langs.add(t)
    assert langs == {"en"}


def test_reindex_requires_source(tmp_path):
    root = str(tmp_path / "nosrc")
    ds = rd.read_parquet(DOCS, columns=["doc_id", "text"])
    ib.build_index(ds, root)
    with pytest.raises(ValueError, match="store_source"):
        reindex.reindex(root, str(tmp_path / "out"))


def test_source_survives_delta_and_compaction(src_index, tmp_path):
    import shutil

    root = str(tmp_path / "lifecycle")
    shutil.copytree(src_index, root)
    delta = pd.DataFrame([
        {"doc_id": 900001, "text": "alpha bravo charlie", "lang": "en", "state": "active"},
        {"doc_id": 1, "text": "", "lang": "en", "state": "deleted"},
    ])
    man = incremental.build_incremental(
        root, rd.from_pandas(delta), integrity_check=False
    )
    assert man["store_source"] is True
    ic.compact(root, target_segments=1)
    man2 = query.IndexReader(root).manifest
    assert man2.get("store_source") is True
    # the new doc's _source is fetchable, the deleted one is gone
    docs = readback.read_documents(root, columns=["doc_id", "_source"]).to_pandas()
    by_id = dict(zip(docs["doc_id"], docs["_source"]))
    assert by_id[900001] == "alpha bravo charlie"
    assert 1 not in by_id
    # and a reindex of the evolved root still works end-to-end
    dest = str(tmp_path / "re2")
    reindex.reindex(root, dest)
    out = query.IndexReader(dest).search("alpha bravo", k=5, mode="and").to_pandas()
    assert 900001 in set(out["doc_id"])
