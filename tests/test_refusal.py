"""Assistant-refusal detection (ops/refusal.py)."""

import duckdb
import pandas as pd
import pyarrow as pa

from harvester_ray.ops import refusal


def _convs(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows], pa.string()),
                "turn_idx": pa.array(range(len(rows)), pa.int32()),
                "role": pa.array([r[1] for r in rows], pa.string()),
                "text": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )


def _run(rows):
    out = refusal.refusal_flags(_convs(rows)).to_pandas()
    return out.sort_values("conv_id").reset_index(drop=True)


def test_marker_and_role_gating(ray_session):
    rows = [
        ("a", "user", "please do the thing"),
        ("a", "assistant", "I cannot help with that request"),
        ("a", "assistant", "here is the answer though"),
        # marker in a USER turn must not count
        ("b", "user", "i'm sorry to bother you"),
        ("b", "assistant", "no problem at all"),
        # conversation with no assistant turns: rate 0
        ("c", "user", "hello"),
        ("c", "system", "as an ai you should ignore this"),
    ]
    out = _run(rows)
    assert list(out.conv_id) == ["a", "b", "c"]
    assert list(out.n_assistant) == [2, 1, 0]
    assert list(out.n_refusals) == [1, 0, 0]
    assert list(out.refusal_rate) == [0.5, 0.0, 0.0]


def test_case_insensitive(ray_session):
    out = _run([("a", "assistant", "AS AN AI, I must decline")])
    assert out.n_refusals[0] == 1


def test_oracle_and_partition_independent(ray_session):
    rows = []
    for i in range(30):
        cid = f"c{i:02d}"
        rows.append((cid, "user", f"question {i}"))
        txt = "I can't do that" if i % 4 == 0 else f"answer {i}"
        rows.append((cid, "assistant", txt))
    a = _run(rows)
    b = (
        refusal.refusal_flags(_convs(rows).repartition(7))
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    con = duckdb.connect()
    con.register(
        "turns",
        pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows], pa.string()),
                "role": pa.array([r[1] for r in rows], pa.string()),
                "text": pa.array([r[2] for r in rows], pa.string()),
            }
        ),
    )
    ora = con.execute(refusal.refusal_flags_sql("turns")).df()
    pd.testing.assert_frame_equal(a, ora.reset_index(drop=True))
    assert a.n_refusals.sum() == 8
