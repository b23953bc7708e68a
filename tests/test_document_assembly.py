import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from harvester_ray.functions import document as fd


def test_nest_dotted_roundtrip():
    t = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            "meta.title": pa.array(["a", "b", None]),
            "meta.stats.n": pa.array([10, 20, 30], pa.int64()),
            "meta.stats.m": pa.array([1.5, 2.5, None]),
            "plain": pa.array(["x", "y", "z"]),
        }
    )
    nested = fd.nest_dotted(t)
    assert nested.column_names == ["id", "meta", "plain"]
    assert pa.types.is_struct(nested["meta"].type)
    meta = nested["meta"].type
    assert [f.name for f in meta] == ["title", "stats"]
    assert pa.types.is_struct(meta.field("stats").type)
    # values preserved through nest + flatten round trip
    flat = fd.flatten_struct(nested)
    assert flat.column_names == ["id", "meta.title", "meta.stats.n", "meta.stats.m", "plain"]
    for c in t.column_names:
        assert flat[c].to_pylist() == t[c].to_pylist()


def test_parse_seed_data_dataset_stage():
    ds = rd.from_arrow(
        pa.table({"a.x": pa.array([1, 2]), "a.y": pa.array(["u", "v"]), "b": pa.array([3, 4])})
    )
    out = fd.parse_seed_data(ds).to_pandas()
    assert list(out.columns) == ["a", "b"]
    assert out["a"].tolist() == [{"x": 1, "y": "u"}, {"x": 2, "y": "v"}]


def test_set_metadata_stamps():
    batch = pa.table(
        {
            "name": pa.array([None, "Uni B", None]),
            "slug": pa.array(["uni-a", None, None]),
            "ext": pa.array(["e1", "e2", "e3"]),
            "text": pa.array(["hello", "world", "same"]),
            "prev_hash": pa.array(
                [
                    hashlib.md5(b"hello").hexdigest(),  # unchanged
                    "0" * 32,  # changed
                    None,  # new doc -> changed
                ]
            ),
            "lang": pa.array(["en", "de", None]),
        }
    )
    out = fd.set_metadata(
        batch,
        provider_cols=["name", "slug", "ext"],
        content_col="text",
        prev_hash_col="prev_hash",
        language_col="lang",
        current_version=7,
        parent_version=3,
    )
    assert out["provider"].to_pylist() == ["uni-a", "Uni B", "e3"]
    assert out["content_hash"].to_pylist() == [
        hashlib.md5(t.encode()).hexdigest() for t in ["hello", "world", "same"]
    ]
    assert out["modified_at_version"].to_pylist() == [3, 7, 7]
    assert out["language"].to_pylist() == ["en", "unk", "unk"]


def test_to_search_actions():
    batch = pa.table(
        {
            "source": pa.array(["s1", "s1", "s2"]),
            "doc_id": pa.array([10, 11, 12], pa.int64()),
            "lang": pa.array(["nl", "xx", "en"]),
            "title": pa.array(["t0", "t1", "t2"]),
        }
    )
    out = fd.to_search(
        batch,
        id_cols=["source", "doc_id"],
        language_col="lang",
        keep_cols=["title"],
        deleted_mask=np.array([False, True, False]),
    )
    assert out["_id"].to_pylist() == ["s1:10", "s1:11", "s2:12"]
    assert out["op"].to_pylist() == ["index", "delete", "index"]
    assert out["language"].to_pylist() == ["nl", "unk", "en"]
    # delete actions carry no payload
    assert out["title"].to_pylist() == ["t0", None, "t2"]
