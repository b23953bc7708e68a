"""C4 line-level cleaning rules (ops/c4.py)."""

import duckdb
import pandas as pd
import pyarrow as pa

from harvester_ray import synth
from harvester_ray.ops import c4


def _pages(texts):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "page_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def _run(texts, **kw):
    out = c4.c4_clean(_pages(texts), **kw).to_pandas()
    return out.sort_values("page_id").reset_index(drop=True)


def test_line_rules(ray_session):
    page = "\n".join(
        [
            "this line ends with a period.",  # kept
            "no terminal punctuation here",  # dropped: punct
            "too short.",  # dropped: < 3 words
            "please enable JavaScript to continue.",  # dropped: javascript
            'a quoted ending counts as terminal."',  # kept
        ]
    )
    out = _run([page], min_kept_lines=2)
    assert out.n_lines[0] == 5 and out.n_kept[0] == 2
    assert out.page_kept[0] == 1
    assert out.kept_text[0] == (
        'this line ends with a period.\na quoted ending counts as terminal."'
    )


def test_page_rules(ray_session):
    good = "\n".join(["one good line number %d is here." % i for i in range(6)])
    out = _run(
        [
            good,
            good + "\nLorem IPSUM dolor.",
            good + "\ncode { display: none; }",
            good + "\nan unsafeword appears in this text.",
            "only two good lines survive here.\nanother good line is right here.",
        ]
    )
    assert list(out.page_kept) == [1, 0, 0, 0, 0]
    assert list(out.lorem) == [0, 1, 0, 0, 0]
    assert list(out.brace) == [0, 0, 1, 0, 0]
    assert list(out.badword) == [0, 0, 0, 1, 0]


def test_empty_and_no_kept_lines(ray_session):
    out = _run(["", "no punct at all", "word."])
    assert list(out.n_kept) == [0, 0, 0]
    assert list(out.kept_text) == ["", "", ""]
    assert list(out.page_kept) == [0, 0, 0]


def test_fixture_matches_oracle(ray_session):
    path = synth.webpages_parquet("/tmp/harvester_ray_entry", n_pages=300, seed=7)
    import ray.data as rd

    eng = (
        c4.c4_clean(rd.read_parquet(path))
        .to_pandas()
        .sort_values("page_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    ora = con.execute(c4.c4_clean_sql(f"read_parquet('{path}/*.parquet')")).df()
    pd.testing.assert_frame_equal(eng, ora.reset_index(drop=True))
    # non-degenerate: every rule fires somewhere, and some pages survive
    assert 0 < eng.page_kept.sum() < len(eng)
    assert eng.lorem.sum() > 0 and eng.brace.sum() > 0 and eng.badword.sum() > 0
