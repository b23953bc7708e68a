"""Token-window document chunking (ops/chunking.py)."""

import pyarrow as pa

from harvester_ray.ops import chunking


def _ds(texts):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )
    )


def test_chunk_windows_and_overlap(ray_session):
    words = " ".join(f"w{i}" for i in range(10))
    out = chunking.chunk_documents(_ds([words]), chunk_size=4, stride=2)
    # starts 0,2,4,6,8 → 5 chunks; last covers w8 w9 only
    assert list(out["chunk_idx"]) == [0, 1, 2, 3, 4]
    assert list(out["n_tokens"]) == [4, 4, 4, 4, 2]
    assert out.iloc[0]["chunk_text"] == "w0 w1 w2 w3"
    assert out.iloc[1]["chunk_text"] == "w2 w3 w4 w5"  # stride-2 overlap
    assert out.iloc[4]["chunk_text"] == "w8 w9"


def test_chunk_short_and_empty_docs(ray_session):
    out = chunking.chunk_documents(_ds(["one two", ""]), chunk_size=8, stride=4)
    # short doc → one chunk; empty doc → none
    assert list(out["doc_id"]) == [0]
    assert out.iloc[0]["chunk_text"] == "one two" and out.iloc[0]["n_tokens"] == 2


def test_chunk_partition_independent(ray_session):
    texts = [" ".join(f"t{i}{j}" for j in range(i % 40)) for i in range(60)]
    a = chunking.chunk_documents(_ds(texts), chunk_size=8, stride=4)
    b = chunking.chunk_documents(_ds(texts).repartition(7), chunk_size=8, stride=4)
    assert a.equals(b)


def test_chunk_streaming_dataset(ray_session):
    import ray.data

    res = chunking.chunk_documents(_ds(["a b c d e f"]), chunk_size=3, stride=3, collect=False)
    assert isinstance(res, ray.data.Dataset)
    assert res.count() == 2


def test_chunk_dedup_stats(ray_session):
    # two identical docs of 4 tokens, chunk=4/stride=4 → 2 chunks, 1 distinct
    out = chunking.chunk_dedup_stats(
        _ds(["a b c d", "a b c d"]), chunk_size=4, stride=4
    ).iloc[0]
    assert out["n_chunks"] == 2 and out["n_distinct"] == 1
    assert out["dup_fraction"] == 0.5
