"""Matomo visits→download-query-rankings DFA (reference
core/analysis/matomo.py:30-69): handcrafted visits exercising every branch
of the search → result-view → download state machine."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from harvester_ray.pipelines import relational


def _write_fixture(tmp_path):
    """One user, one visit (events 1 min apart). k encodes the action:
    view: query q<k%8>, NULL when k%10==0; click/purchase: ext_id (k*7)%600.
    """
    rows = []  # (event_type, k)
    # span A: search(q1) -> view(result) -> download        => HIT ext (9*7)%600=63
    rows += [("view", 1), ("click", 9), ("purchase", 9)]
    # span B: search(q2) -> view -> view                    => death (R at even rn)
    rows += [("view", 2), ("click", 9), ("click", 9), ("purchase", 9)]
    # span C: search(q3) -> download -> download            => first D sets result,
    #                                                          second D HITs ext 63
    rows += [("view", 3), ("purchase", 9), ("purchase", 9)]
    # span D: categorised search (k%10==0 -> query None): everything skipped
    rows += [("view", 10), ("click", 9), ("purchase", 9)]
    # span E: search(q4) -> unrelated -> view -> download   => death at rn 1
    rows += [("view", 4), ("error", 0), ("click", 9), ("purchase", 9)]
    # span F: search(q5) -> view -> download of MISSING doc => dropped in join
    #   ext id (86*7)%600 = 2 ... pick k so ext >= n_docs: k=98 -> 686%600=86?
    rows += [("view", 5), ("click", 9), ("purchase", 514)]  # (514*7)%600=598
    ts0 = np.datetime64("2024-01-01T00:00:00", "us")
    events = pd.DataFrame({
        "event_id": np.arange(len(rows), dtype=np.int64),
        "ts": [ts0 + np.timedelta64(i, "m") for i in range(len(rows))],
        "user_id": np.zeros(len(rows), dtype=np.int64),
        "event_type": [r[0] for r in rows],
        "value": np.zeros(len(rows)),
        "props": ['{"k": %d}' % r[1] for r in rows],
    })
    # a second user whose only visit has no download -> filtered out
    extra = pd.DataFrame({
        "event_id": np.arange(100, 104, dtype=np.int64),
        "ts": [ts0 + np.timedelta64(i, "m") for i in range(4)],
        "user_id": np.full(4, 1, dtype=np.int64),
        "event_type": ["view", "click", "click", "view"],
        "value": np.zeros(4),
        "props": ['{"k": 1}'] * 4,
    })
    # a third user with a 2-action visit (min_actions filter)
    tiny = pd.DataFrame({
        "event_id": np.arange(200, 202, dtype=np.int64),
        "ts": [ts0 + np.timedelta64(i, "m") for i in range(2)],
        "user_id": np.full(2, 2, dtype=np.int64),
        "event_type": ["view", "purchase"],
        "value": np.zeros(2),
        "props": ['{"k": 1}', '{"k": 9}'],
    })
    ev = pd.concat([events, extra, tiny], ignore_index=True)
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                   os.path.join(tmp_path, "events.parquet"))
    docs = pd.DataFrame({
        "doc_id": np.arange(100, dtype=np.int64),  # ext 598 is missing
        "text": ["doc"] * 100,
        "lang": ["en" if i % 2 == 0 else "de" for i in range(100)],
    })
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))


def test_visits_to_rankings_dfa(ray_session, tmp_path):
    _write_fixture(str(tmp_path))
    out = relational.visits_to_rankings(str(tmp_path), gap_minutes=30)
    # hits: span A (q1, ext 63) and span C (q3, ext 63); 63 is odd -> lang de -> unk
    got = {(r.query, r.ranking_key, r.cnt) for r in out.itertuples()}
    assert got == {
        ("q1", "edusources-unk:63", 1),
        ("q3", "edusources-unk:63", 1),
    }
    # oracle agreement on the identical fixture
    import duckdb

    con = duckdb.connect()
    for t in ["events", "documents"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/{t}.parquet')")
    exp = con.execute(relational.visits_to_rankings_sql(gap_minutes=30)).df()
    assert out.reset_index(drop=True).equals(exp.reset_index(drop=True))
