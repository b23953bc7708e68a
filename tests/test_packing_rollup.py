"""Sequence packing (ops/packing.py), rollup + highlight extras."""

import numpy as np
import pandas as pd
import pyarrow as pa

from harvester_ray.ops import packing


def _docs(texts, ids=None):
    import ray.data as rd

    ids = list(range(len(texts))) if ids is None else ids
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def test_pack_prefix_sum_exact(ray_session):
    texts = ["a b c", "d e", "f", "g h i j"]  # 3,2,1,4 tokens
    out = (
        packing.pack_sequences(_docs(texts), capacity=4, n_partitions=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["n_tok"]) == [3, 2, 1, 4]
    assert list(out["start_tok"]) == [0, 3, 5, 6]
    assert list(out["bin"]) == [0, 0, 1, 1]


def test_pack_partition_independence(ray_session):
    texts = [f"{'w ' * (i % 9 + 1)}".strip() for i in range(120)]
    a = packing.pack_sequences(_docs(texts), capacity=16, n_partitions=8).to_pandas()
    b = (
        packing.pack_sequences(_docs(texts).repartition(13), capacity=16, n_partitions=8)
        .to_pandas()
    )
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_pack_sparse_ids(ray_session):
    # non-contiguous ids: order is by id, ranges stay monotone
    out = (
        packing.pack_sequences(
            _docs(["a b", "c d", "e f"], ids=[5, 1000, 70]), capacity=3, n_partitions=16
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [5, 70, 1000]
    assert list(out["start_tok"]) == [0, 2, 4]
