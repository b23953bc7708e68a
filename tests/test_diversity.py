"""Per-source distinct-n-gram diversity (ops/diversity.py)."""

import duckdb
import pandas as pd
import pyarrow as pa

from harvester_ray.ops import diversity


def _docs(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "text": pa.array([r[0] for r in rows], pa.string()),
                "source": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def _run(rows, n=2):
    out = diversity.distinct_ngrams(_docs(rows), shingle_n=n).to_pandas()
    return (
        out[["source", "n_total", "n_distinct", "distinct_ratio"]]
        .sort_values("source")
        .reset_index(drop=True)
    )


def test_template_source_scores_low(ray_session):
    rows = [("the same line again", "tmpl")] * 5 + [
        ("alpha beta gamma delta", "var"),
        ("epsilon zeta eta theta", "var"),
    ]
    out = _run(rows)
    tmpl = out[out.source == "tmpl"].iloc[0]
    var = out[out.source == "var"].iloc[0]
    assert tmpl.n_total == 15 and tmpl.n_distinct == 3
    assert var.n_total == 6 and var.n_distinct == 6
    assert tmpl.distinct_ratio == 0.2 and var.distinct_ratio == 1.0


def test_short_and_empty_docs(ray_session):
    # one-token doc -> one fallback gram; empty doc -> nothing
    out = _run([("word", "a"), ("word", "a"), ("", "a")], n=3)
    assert list(out.n_total) == [2]
    assert list(out.n_distinct) == [1]


def test_partition_independent_and_oracle(ray_session):
    rows = [
        (f"w{i % 5} w{(i + 1) % 5} w{(i + 2) % 7} tail{i % 3}", f"s{i % 4}")
        for i in range(60)
    ]
    a = _run(rows)
    b = (
        diversity.distinct_ngrams(_docs(rows).repartition(7), shingle_n=2)
        .to_pandas()[["source", "n_total", "n_distinct", "distinct_ratio"]]
        .sort_values("source")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    con = duckdb.connect()
    con.register(
        "documents",
        pa.table(
            {
                "text": pa.array([r[0] for r in rows], pa.string()),
                "source": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
    )
    ora = con.execute(diversity.distinct_ngrams_sql()).df()
    pd.testing.assert_frame_equal(a, ora.reset_index(drop=True))
