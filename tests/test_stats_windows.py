import os

import duckdb
import numpy as np
import pytest
import ray.data as rd

from harvester_ray.index import stats
from harvester_ray.pipelines import windows

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "events"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_salted_shuffle_term_stats_match_oracle(con):
    ds = rd.read_parquet(os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text"])
    got = (
        stats.term_stats_shuffle(ds, hot_threshold=20, n_salts=4)
        .to_pandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    exp = con.execute(
        """
        WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM documents)
        SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf
        FROM toks GROUP BY term ORDER BY term
        """
    ).fetchdf()
    assert list(got["term"]) == list(exp["term"])
    np.testing.assert_array_equal(got["df"].to_numpy(), exp["df"].to_numpy())
    np.testing.assert_array_equal(got["cf"].to_numpy(), exp["cf"].to_numpy())


def test_sliding_windows_match_oracle(con):
    ds = rd.read_parquet(os.path.join(SF_DIR, "events.parquet"), columns=["user_id", "ts", "value"])
    got = (
        windows.sliding_window_counts(ds)
        .to_pandas()
        .sort_values(["user_id", "window_start"])
        .reset_index(drop=True)
    )
    exp = con.execute(windows.sliding_window_sql("events")).fetchdf()
    assert len(got) == len(exp)
    assert list(got["user_id"]) == list(exp["user_id"])
    assert list(got["window_start"]) == list(exp["window_start"])
    np.testing.assert_array_equal(got["n_events"].to_numpy(), exp["n_events"].to_numpy())
    np.testing.assert_allclose(got["sum_value"].to_numpy(), exp["sum_value"].to_numpy(), rtol=1e-6)
    # every event lands in exactly size/step windows
    n_events = con.execute("SELECT count(*) FROM events").fetchone()[0]
    assert got["n_events"].sum() == n_events * 2


def test_session_windows_match_oracle(con):
    ds = rd.read_parquet(os.path.join(SF_DIR, "events.parquet"), columns=["user_id", "event_id", "ts"])
    got = (
        windows.session_windows(ds)
        .to_pandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    exp = con.execute(
        """
        WITH ordered AS (
          SELECT user_id, event_id, ts,
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          FROM events
        ),
        marked AS (
          SELECT user_id, ts,
                 sum(CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess
          FROM ordered
        )
        SELECT user_id, min(ts) AS session_start, max(ts) AS session_end, count(*) AS n_events
        FROM marked GROUP BY user_id, sess ORDER BY user_id, session_start
        """
    ).fetchdf()
    assert len(got) == len(exp)
    assert list(got["user_id"]) == list(exp["user_id"])
    assert list(got["session_start"]) == list(exp["session_start"])
    assert list(got["n_events"]) == list(exp["n_events"])


def test_late_arrivals_prefix_scan(ray_session, tmp_path):
    import os

    import numpy as np
    import pandas as pd

    from harvester_ray.pipelines import windows

    rng = np.random.default_rng(7)
    n = 3000
    ts = (
        np.datetime64("2024-01-01", "us")
        + (np.cumsum(rng.integers(0, 5_000_000, n))
           + rng.integers(-7_200_000_000, 0, n)).astype("timedelta64[us]")
    )
    df = pd.DataFrame({"event_id": np.arange(n, dtype=np.int64), "ts": ts})
    d = str(tmp_path)
    df.to_parquet(os.path.join(d, "all.parquet"))
    parts = [os.path.join(d, f"p{i}.parquet") for i in range(3)]
    for i, p in enumerate(parts):
        df.iloc[i * 1000:(i + 1) * 1000].to_parquet(p)
    one = windows.late_arrivals(
        [os.path.join(d, "all.parquet")], allowed_lateness_us=1_800_000_000
    )
    multi = windows.late_arrivals(parts, allowed_lateness_us=1_800_000_000)
    # the prefix max crosses file boundaries: multi-file == single-file
    assert one.values.tolist() == multi.values.tolist()
    # non-degenerate: BOTH late and on-time rows exist
    assert 0 < int(one["n_late"].sum()) < int(one["n_events"].sum())
    # oracle identity on the same frame
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{os.path.join(d, 'all.parquet')}')"
    )
    exp = con.execute(
        windows.late_arrivals_sql("events", allowed_lateness_us=1_800_000_000)
    ).fetchdf()
    assert one.values.tolist() == exp.values.tolist()


def test_window_gaps(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from harvester_ray.pipelines import windows

    base = np.datetime64("2024-01-01T00:00:00", "us")
    hours = [0, 1, 2, 5, 6, 9]  # gaps at 3, 4, 7, 8
    ts = np.array([base + np.timedelta64(h, "h") for h in hours])
    ds = rd.from_pandas(pd.DataFrame({"ts": ts}))
    out = windows.window_gaps(ds, interval_us=3_600_000_000)
    got_h = [(b - int(ts[0].astype("datetime64[us]").astype(np.int64)))
             // 3_600_000_000 for b in out["bucket_us"]]
    assert got_h == [3, 4, 7, 8]
    # partition independence + empty input
    out2 = windows.window_gaps(ds.repartition(3), interval_us=3_600_000_000)
    assert out.values.tolist() == out2.values.tolist()
    empty = rd.from_pandas(pd.DataFrame({"ts": ts[:0]}))
    assert len(windows.window_gaps(empty)) == 0
