"""Prefix-cache reuse accounting (ops/prefixcache.py)."""

import duckdb
import pandas as pd
import pyarrow as pa

from harvester_ray.ops import prefixcache


def _convs(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows], pa.string()),
                "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                "role": pa.array([r[2] for r in rows], pa.string()),
                "text": pa.array([r[3] for r in rows], pa.string()),
            }
        )
    )


def _run(rows):
    out = prefixcache.prefix_cache_stats(_convs(rows)).to_pandas()
    return out.sort_values("depth").reset_index(drop=True)


def test_shared_prefix_accounting(ray_session):
    # two conversations share turns 1-2 verbatim, diverge at turn 3;
    # a third shares nothing
    rows = [
        ("a", 0, "system", "you are helpful"),   # 3 tokens
        ("a", 1, "user", "hello there"),          # 2 tokens
        ("a", 2, "assistant", "hi friend"),       # 2 tokens
        ("b", 0, "system", "you are helpful"),
        ("b", 1, "user", "hello there"),
        ("b", 2, "assistant", "different reply today"),  # 3 tokens
        ("c", 0, "user", "completely unrelated opener"),  # 3 tokens
    ]
    out = _run(rows)
    assert list(out.depth) == [1, 2, 3]
    assert list(out.n_requests) == [3, 2, 2]
    assert list(out.n_prefixes) == [2, 1, 2]
    # depth1: a+b share "system: you are helpful" (3 tok computed once,
    # 3 cached), c computed (3). total 9, computed 6, cached 3.
    assert list(out.tokens_total) == [9, 4, 5]
    assert list(out.tokens_computed) == [6, 2, 5]
    assert list(out.tokens_cached) == [3, 2, 0]
    assert out.hit_ratio[0] == round(3 / 9, 6) or out.hit_ratio[0] == 0.333333


def test_role_breaks_sharing(ray_session):
    # same text, different role => different prefix
    rows = [
        ("a", 0, "user", "hello world"),
        ("b", 0, "system", "hello world"),
    ]
    out = _run(rows)
    assert out.n_prefixes[0] == 2 and out.tokens_cached[0] == 0


def test_turn_boundary_identity(ray_session):
    # "ab"+"c" vs "a"+"bc" must NOT share depth-2 prefixes
    rows = [
        ("a", 0, "user", "ab"),
        ("a", 1, "user", "c"),
        ("b", 0, "user", "a"),
        ("b", 1, "user", "bc"),
    ]
    out = _run(rows)
    assert list(out.n_prefixes) == [2, 2]
    assert list(out.tokens_cached) == [0, 0]


def test_partition_independent_and_oracle(ray_session):
    rows = []
    for i in range(24):
        cid = f"c{i:02d}"
        rows.append((cid, 0, "system", "shared template header %d" % (i % 3)))
        rows.append((cid, 1, "user", f"question number {i % 6} please"))
        rows.append((cid, 2, "assistant", f"answer {i}"))
    a = _run(rows)
    b = (
        prefixcache.prefix_cache_stats(_convs(rows).repartition(5))
        .to_pandas()
        .sort_values("depth")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    con = duckdb.connect()
    con.register(
        "turns",
        pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows], pa.string()),
                "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                "role": pa.array([r[2] for r in rows], pa.string()),
                "text": pa.array([r[3] for r in rows], pa.string()),
            }
        ),
    )
    ora = con.execute(prefixcache.prefix_cache_stats_sql("turns")).df()
    pd.testing.assert_frame_equal(a, ora.reset_index(drop=True))
    # non-degenerate: depth-1 sharing (3 templates over 24 convs)
    assert a.n_prefixes[0] == 3 and a.tokens_cached[0] > 0
