"""Ordered fan-in join + per-parent child dedup/split
(reference products/models/datatypes/product.py:82-167, 119-143)."""

import numpy as np
import pandas as pd
import ray.data as rd

from harvester_ray.pipelines import fanin


def _parents():
    return rd.from_items(
        [
            {"pid": 1, "title": "one"},
            {"pid": 2, "title": "two"},
            {"pid": 3, "title": "childless"},
        ]
    )


def _children():
    return rd.from_items(
        [
            {"pid": 1, "cid": 10, "priority": 1, "url": "a", "text": "alpha", "is_link": False},
            {"pid": 1, "cid": 11, "priority": 9, "url": "b", "text": "beta", "is_link": True},
            {"pid": 1, "cid": 12, "priority": 5, "url": "c", "text": "gamma", "is_link": False},
            {"pid": 2, "cid": 20, "priority": 2, "url": "a", "text": "delta", "is_link": False},
        ]
    )


def test_merge_child_table_first_and_concat():
    out = (
        fanin.merge_child_table(
            _parents(), _children(), key="pid",
            order_by=["priority", "cid"], descending=[True, False],
            take_first=["url", "cid"], concat={"texts": ("text", " ")},
        )
        .to_pandas()
        .sort_values("pid")
        .reset_index(drop=True)
    )
    # parent 1: priority order is cid 11 (9), 12 (5), 10 (1)
    assert out.loc[0, "first_url"] == "b"
    assert out.loc[0, "texts"] == "beta gamma alpha"
    assert out.loc[0, "n_children"] == 3
    assert out.loc[1, "first_url"] == "a"
    # childless parent survives with null firsts and 0 children
    assert out.loc[2, "title"] == "childless"
    assert out.loc[2, "n_children"] == 0
    assert pd.isna(out.loc[2, "first_url"])
    assert out["pid"].dtype == np.int64


def test_split_children_dedup_and_ranks():
    kids = rd.from_items(
        [
            {"pid": 1, "cid": 1, "url": "x", "is_link": False},
            {"pid": 1, "cid": 2, "url": "x", "is_link": False},  # dup url, dropped
            {"pid": 1, "cid": 3, "url": "y", "is_link": True},
            {"pid": 1, "cid": 4, "url": "z", "is_link": True},
            {"pid": 2, "cid": 5, "url": "x", "is_link": False},  # other parent keeps url x
        ]
    )
    out = (
        fanin.split_children(kids, key="pid", dedup_col="url", order_col="cid", is_link_col="is_link")
        .to_pandas()
        .sort_values("cid")
        .reset_index(drop=True)
    )
    assert list(out["cid"]) == [1, 3, 4, 5]  # first occurrence of dup kept
    assert list(out["kind"]) == ["file", "link", "link", "file"]
    assert list(out["kind_rank"]) == [1, 1, 2, 1]  # "URL {n}" numbering input
