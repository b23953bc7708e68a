"""Copy-on-write partitioned table MERGE (state/table.py)."""

import os

import numpy as np
import pandas as pd

from harvester_ray.state import table


def _base(n=100):
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": [f"text {i}" for i in range(n)],
        "v": np.arange(n, dtype=np.int64) * 10,
    })


def test_merge_equals_pandas_oracle(tmp_path, ray_session):
    root = str(tmp_path / "tbl")
    base = _base()
    table.write_partitioned(base, root, n_partitions=8)
    delta = pd.DataFrame({
        "doc_id": np.array([3, 5, 200, 201], dtype=np.int64),
        "text": ["updated 3", "ignored", "new 200", "new 201"],
        "v": np.array([33, 0, 2000, 2010], dtype=np.int64),
        "state": ["active", "deleted", "active", "active"],
    })
    res = table.merge(root, delta)
    assert res["touched"] and res["skipped"] + len(res["touched"]) == 8
    got = table.read_table(root)
    # pandas oracle: drop delta keys, append non-deleted delta rows
    exp = pd.concat(
        [base[~base["doc_id"].isin(delta["doc_id"])],
         delta[delta["state"] != "deleted"][["doc_id", "text", "v"]]],
        ignore_index=True,
    ).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_merge_prunes_untouched_partitions(tmp_path, ray_session):
    root = str(tmp_path / "tbl2")
    table.write_partitioned(_base(), root, n_partitions=8)
    mtimes = {
        p: os.path.getmtime(os.path.join(root, f"p={p}", "part.parquet"))
        for p in range(8)
    }
    delta = pd.DataFrame({
        "doc_id": np.array([7], dtype=np.int64),
        "text": ["updated 7"], "v": np.array([77], dtype=np.int64),
        "state": ["active"],
    })
    res = table.merge(root, delta)
    assert len(res["touched"]) == 1
    for p in range(8):
        mt = os.path.getmtime(os.path.join(root, f"p={p}", "part.parquet"))
        if p in res["touched"]:
            assert mt != mtimes[p]
        else:
            assert mt == mtimes[p], f"partition {p} rewritten needlessly"
    assert table.read_table(root).loc[7, "text"] == "updated 7"


def test_merge_idempotent_and_repeated(tmp_path, ray_session):
    root = str(tmp_path / "tbl3")
    table.write_partitioned(_base(20), root, n_partitions=4)
    delta = pd.DataFrame({
        "doc_id": np.array([1, 2], dtype=np.int64),
        "text": ["a", "b"], "v": np.array([1, 2], dtype=np.int64),
        "state": ["active", "deleted"],
    })
    table.merge(root, delta)
    once = table.read_table(root)
    table.merge(root, delta)
    twice = table.read_table(root)
    pd.testing.assert_frame_equal(once, twice)
    assert 2 not in set(twice["doc_id"])
