"""Event analytics: running totals, funnel, histogram, MAD outliers,
ordered timelines (pipelines/analytics.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from harvester_ray.pipelines import analytics


def _events(rows):
    import ray.data as rd

    df = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "ts", "value"])
    df["ts"] = pd.to_datetime(df["ts"])
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


ROWS = [
    # user 1: view → click → purchase (complete funnel)
    (1, 1, "view", "2024-01-01 10:00", 1.5),
    (2, 1, "click", "2024-01-01 10:05", 2.25),
    (3, 1, "purchase", "2024-01-01 10:10", 100.0),
    # user 2: click before view → only reaches stage 1 (view at 11:00)
    (4, 2, "click", "2024-01-01 09:00", 3.0),
    (5, 2, "view", "2024-01-01 11:00", 4.0),
    # user 3: view only
    (6, 3, "view", "2024-01-01 12:00", 5.5),
]


def test_running_total_exact(ray_session):
    out = analytics.running_total(_events(ROWS))
    u1 = out[out["user_id"] == 1]
    assert list(u1["cum_micros"]) == [1_500_000, 3_750_000, 103_750_000]
    assert list(u1["cum_value"]) == [1.5, 3.75, 103.75]
    # order within user is by (ts, event_id), output sorted by (user, id)
    assert list(out["event_id"]) == [1, 2, 3, 4, 5, 6]


def test_running_total_partition_independent(ray_session):
    rows = [(i, i % 7, "view", f"2024-01-01 {i % 24:02d}:00", 0.1 * i) for i in range(200)]
    a = analytics.running_total(_events(rows))
    b = analytics.running_total(_events(rows).repartition(5))
    assert a.equals(b)


def test_funnel_counts(ray_session):
    out = analytics.funnel(_events(ROWS))
    assert list(out["stage"]) == [1, 2, 3]
    assert list(out["event_type"]) == ["view", "click", "purchase"]
    # u1 completes all; u2's click precedes its view; u3 views only
    assert list(out["n_users"]) == [3, 1, 1]


def test_funnel_missing_stage(ray_session):
    out = analytics.funnel(_events(ROWS), stages=("purchase", "view"))
    # only u1 purchases; nobody views after purchasing
    assert list(out["n_users"]) == [1, 0]


def test_value_histogram_bins(ray_session):
    rows = [(i, 1, "a" if i % 2 else "b", "2024-01-01", float(i)) for i in range(10)]
    out = analytics.value_histogram(_events(rows), nbins=3)
    # span [0,9], width 3: bins {0,1,2}; value 9 clamps into bin 2
    total = out.groupby("bin")["n"].sum()
    assert list(total) == [3, 3, 4]
    assert out[out["bin"] == 0]["bin_lo"].iloc[0] == 0.0
    # constant-value edge: everything lands in bin 0
    const = analytics.value_histogram(_events([(1, 1, "a", "2024-01-01", 2.0), (2, 1, "a", "2024-01-01", 2.0)]), nbins=4)
    assert list(const["bin"]) == [0] and list(const["n"]) == [2]


def test_outliers_mad(ray_session):
    rows = [(i, 1, "a", "2024-01-01", 10.0 + (i % 3)) for i in range(20)]
    rows.append((99, 1, "a", "2024-01-01", 500.0))
    out = analytics.outliers_mad(_events(rows), k=3.0)
    assert list(out["event_id"]) == [99]
    assert out.iloc[0]["med"] == 11.0


def test_user_timeline(ray_session):
    out = analytics.user_timeline(_events(ROWS))
    m = dict(zip(out["user_id"], out["timeline"]))
    assert m[1] == "view>click>purchase"
    assert m[2] == "click>view"  # time order, not input order
    assert m[3] == "view"
    assert list(out["n_events"]) == [3, 2, 1]


def test_event_transitions(ray_session):
    out = analytics.event_transitions(_events(ROWS))
    m = {(r["prev_type"], r["next_type"]): r["n"] for _, r in out.iterrows()}
    # u1: view>click, click>purchase; u2 (time order): click>view
    assert m == {("view", "click"): 1, ("click", "purchase"): 1, ("click", "view"): 1}


def test_pivot_hourly(ray_session):
    out = analytics.pivot_hourly(_events(ROWS), types=("view", "click", "purchase"))
    assert len(out) == 24 and list(out["hour"]) == list(range(24))
    assert out.loc[10, "n_view"] == 1 and out.loc[10, "n_click"] == 1 and out.loc[10, "n_purchase"] == 1
    assert out.loc[9, "n_click"] == 1 and out.loc[11, "n_view"] == 1 and out.loc[12, "n_view"] == 1
    assert out.drop(columns="hour").to_numpy().sum() == len(ROWS)


def test_zscore_normalize(ray_session):
    rows = [(i, 1, "a", "2024-01-01", float(v)) for i, v in enumerate([1, 2, 3, 4])]
    out = analytics.zscore_normalize(_events(rows))
    # mean 2.5, population std sqrt(1.25)
    exp = np.round((np.array([1, 2, 3, 4]) - 2.5) / np.sqrt(1.25), 4)
    assert list(out["z"]) == list(exp)
    # constant group → z = 0 everywhere, no div-by-zero
    const = analytics.zscore_normalize(_events([(1, 1, "c", "2024-01-01", 5.0), (2, 1, "c", "2024-01-01", 5.0)]))
    assert list(const["z"]) == [0.0, 0.0]


def test_zscore_partition_independent(ray_session):
    rows = [(i, i % 3, "t" + str(i % 2), "2024-01-01", 0.37 * i) for i in range(300)]
    a = analytics.zscore_normalize(_events(rows))
    b = analytics.zscore_normalize(_events(rows).repartition(8))
    assert a.equals(b)


def test_ntile_buckets(ray_session):
    rows = [(i, 1, "a", "2024-01-01", float(i)) for i in range(10)]
    out = analytics.ntile_buckets(_events(rows), n=4)
    # 10 rows into 4 tiles → sizes 3,3,2,2 in value order
    assert list(out["tile"]) == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]
    tiny = analytics.ntile_buckets(_events(rows[:3]), n=4)
    assert list(tiny["tile"]) == [1, 2, 3]


def test_ntile_partition_independent(ray_session):
    rows = [(i, 1, "t" + str(i % 3), "2024-01-01", float((i * 17) % 23)) for i in range(90)]
    a = analytics.ntile_buckets(_events(rows), n=5)
    b = analytics.ntile_buckets(_events(rows).repartition(6), n=5)
    assert a.equals(b)


def test_global_sort_page(ray_session, tmp_path):
    import pyarrow.parquet as pq

    n = 50
    t = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "event_type": pa.array(["x"] * n),
            "value": pa.array([float((i * 13) % 29) for i in range(n)]),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    from harvester_ray.pipelines import relational

    out = relational.global_sort_page(str(tmp_path), offset=5, page=7)
    df = t.to_pandas().sort_values(["value", "event_id"], ascending=[False, True])
    exp = df.iloc[5:12].reset_index(drop=True)
    assert list(out["event_id"]) == list(exp["event_id"])
    assert list(out["value"]) == list(exp["value"])


def test_rolling_mean(ray_session):
    rows = [(i, 1, "a", f"2024-01-01 00:{i:02d}", float(i + 1)) for i in range(6)]
    out = analytics.rolling_mean(_events(rows), window=3)
    # values 1..6, trailing-3 means: 1, 1.5, 2, 3, 4, 5
    assert list(out["roll_mean"]) == [1.0, 1.5, 2.0, 3.0, 4.0, 5.0]


def test_event_gaps(ray_session):
    out = analytics.event_gaps(_events(ROWS))
    m = dict(zip(out["event_id"], out["gap_us"]))
    assert m[1] == -1 and m[2] == 300_000_000 and m[3] == 300_000_000
    assert m[4] == -1 and m[5] == 7_200_000_000  # u2: 09:00 → 11:00
    assert m[6] == -1


def test_rolling_gaps_partition_independent(ray_session):
    rows = [(i, i % 5, "a", f"2024-01-0{1 + i % 9}", 0.25 * i) for i in range(200)]
    a1 = analytics.rolling_mean(_events(rows), window=5)
    b1 = analytics.rolling_mean(_events(rows).repartition(7), window=5)
    assert a1.equals(b1)
    a2 = analytics.event_gaps(_events(rows))
    b2 = analytics.event_gaps(_events(rows).repartition(7))
    assert a2.equals(b2)


def test_user_set_ops(ray_session):
    rows = [
        (1, 1, "click", "2024-01-01", 0.0),
        (2, 1, "purchase", "2024-01-01", 0.0),
        (3, 2, "click", "2024-01-01", 0.0),
        (4, 3, "purchase", "2024-01-01", 0.0),
        (5, 4, "view", "2024-01-01", 0.0),
    ]
    out = analytics.user_set_ops(_events(rows)).iloc[0]
    assert out["n_a"] == 2 and out["n_b"] == 2 and out["n_both"] == 1
    assert out["n_a_only"] == 1 and out["n_b_only"] == 1 and out["n_union"] == 3
    assert out["jaccard"] == np.floor(1e6 / 3 + 0.5) / 1e6


def test_hourly_correlation(ray_session):
    # a peaks where b peaks (same hours) → r = 1; c anti-correlates
    rows = []
    eid = 0
    for h in range(24):
        for _ in range(h):
            rows.append((eid, 1, "a", f"2024-01-01 {h:02d}:00", 0.0)); eid += 1
            rows.append((eid, 1, "b", f"2024-01-01 {h:02d}:00", 0.0)); eid += 1
        for _ in range(23 - h):
            rows.append((eid, 1, "c", f"2024-01-01 {h:02d}:00", 0.0)); eid += 1
    out = analytics.hourly_correlation(_events(rows), types=("a", "b", "c"))
    m = {(r["type_a"], r["type_b"]): r["r"] for _, r in out.iterrows()}
    assert m[("a", "b")] == 1.0
    assert m[("a", "c")] == -1.0 and m[("b", "c")] == -1.0


def test_trimmed_mean(ray_session):
    rows = [(i, 1, "a", "2024-01-01", float(v)) for i, v in enumerate([0, 1, 2, 3, 4, 5, 6, 7, 8, 1000])]
    out = analytics.trimmed_mean(_events(rows), trim=0.1)
    r = out.iloc[0]
    # n=10, k=1: drop 0 and 1000 → mean of 1..8 = 4.5
    assert r["n"] == 10 and r["n_trimmed"] == 2 and r["tmean"] == 4.5
    # trim=0 is the plain mean
    out0 = analytics.trimmed_mean(_events(rows), trim=0.0)
    assert out0.iloc[0]["tmean"] == round(sum([0, 1, 2, 3, 4, 5, 6, 7, 8, 1000]) / 10, 6)


def test_distinct_users_by_type(ray_session):
    rows = [
        (1, 1, "a", "2024-01-01", 0.0),
        (2, 1, "a", "2024-01-01", 0.0),
        (3, 2, "a", "2024-01-01", 0.0),
        (4, 1, "b", "2024-01-01", 0.0),
    ]
    out = analytics.distinct_users_by_type(_events(rows))
    m = dict(zip(out["event_type"], out["n_users"]))
    assert m == {"a": 2, "b": 1}


def test_distinct_users_partition_independent(ray_session):
    rows = [(i, i % 37, "t" + str(i % 4), "2024-01-01", 0.0) for i in range(400)]
    a = analytics.distinct_users_by_type(_events(rows))
    b = analytics.distinct_users_by_type(_events(rows).repartition(9))
    assert a.equals(b)


def test_collect_false_returns_streaming_dataset(ray_session):
    import ray.data

    rows = [(i, i % 3, "a", "2024-01-01", 1.0 * i) for i in range(30)]
    res = analytics.running_total(_events(rows), collect=False)
    assert isinstance(res, ray.data.Dataset)
    assert res.count() == 30
    res2 = analytics.zscore_normalize(_events(rows), collect=False)
    assert isinstance(res2, ray.data.Dataset)


def test_cohort_retention(ray_session):
    rows = [
        # u1 signs up week 0, active weeks 0 and 1
        (1, 1, "signup", "2024-01-02", 0.0),
        (2, 1, "view", "2024-01-10", 0.0),
        # u2 signs up week 1, active week 1 only
        (3, 2, "signup", "2024-01-09", 0.0),
        # u3 never signs up → excluded; pre-signup activity ignored
        (4, 3, "view", "2024-01-02", 0.0),
        (5, 1, "view", "2024-01-01", 0.0),  # week 0 activity (same week as signup)
    ]
    out = analytics.cohort_retention(_events(rows))
    m = {(r["cohort_week"], r["active_week"]): r["n_users"] for _, r in out.iterrows()}
    assert m == {(0, 0): 1, (0, 1): 1, (1, 1): 1}


def test_chi_square_independent_uniform(ray_session):
    # perfectly proportional table → chi2 == 0
    rows = []
    eid = 0
    for h in (1, 2):
        for t, k in (("a", 2), ("b", 4)):
            for _ in range(k):
                rows.append((eid, 1, t, f"2024-01-01 {h:02d}:00", 0.0)); eid += 1
    out = analytics.chi_square_hour_type(_events(rows), types=("a", "b"))
    assert out.iloc[0]["chi2"] == 0.0 and out.iloc[0]["dof"] == 1
    assert out.iloc[0]["n"] == 12


def test_weighted_median(ray_session):
    # weights == values: total=1+2+3+4=10; cum 1,3,6 → first 2·cum ≥ 10 is value 3
    rows = [(i, 1, "a", "2024-01-01", float(v)) for i, v in enumerate([1, 2, 3, 4])]
    out = analytics.weighted_median(_events(rows))
    r = out.iloc[0]
    assert r["total_weight_micros"] == 10_000_000 and r["wmedian"] == 3.0
    # a dominant weight pulls the median to it
    rows2 = [(1, 1, "b", "2024-01-01", 1.0), (2, 1, "b", "2024-01-01", 100.0)]
    assert analytics.weighted_median(_events(rows2)).iloc[0]["wmedian"] == 100.0


def test_journey_trigrams(ray_session):
    rows = [
        (1, 1, "view", "2024-01-01 10:00", 0.0),
        (2, 1, "click", "2024-01-01 10:01", 0.0),
        (3, 1, "purchase", "2024-01-01 10:02", 0.0),
        (4, 1, "view", "2024-01-01 10:03", 0.0),
        (5, 2, "view", "2024-01-01 10:00", 0.0),  # only 1 event → no triple
    ]
    out = analytics.journey_trigrams(_events(rows), k=5)
    m = {(r["t1"], r["t2"], r["t3"]): r["n"] for _, r in out.iterrows()}
    assert m == {("view", "click", "purchase"): 1, ("click", "purchase", "view"): 1}


def test_percent_rank(ray_session):
    rows = [(i, 1, "a", "2024-01-01", float(v)) for i, v in enumerate([10, 20, 30, 40, 50])]
    out = analytics.percent_rank(_events(rows))
    assert list(out["prank"]) == [0.0, 0.25, 0.5, 0.75, 1.0]
    single = analytics.percent_rank(_events(rows[:1]))
    assert list(single["prank"]) == [0.0]


def test_key_skew(ray_session):
    # even distribution → gini 0; one dominant key → gini high
    even = [(i, i % 4, "a", "2024-01-01", 0.0) for i in range(40)]
    out = analytics.key_skew(_events(even)).iloc[0]
    assert out["n_keys"] == 4 and out["n_rows"] == 40
    assert out["gini"] == 0.0 and out["max_share"] == 0.25
    skew = [(i, 0 if i < 37 else i, "a", "2024-01-01", 0.0) for i in range(40)]
    s = analytics.key_skew(_events(skew)).iloc[0]
    assert s["n_keys"] == 4 and s["max_count"] == 37
    assert s["gini"] > 0.6 and s["max_share"] == 0.925


def test_type_entropy(ray_session):
    # uniform 2 classes → H = ln 2, normalized 1.0
    rows = [(i, 1, "a" if i % 2 else "b", "2024-01-01", 0.0) for i in range(20)]
    out = analytics.type_entropy(_events(rows)).iloc[0]
    assert out["n"] == 20 and out["k"] == 2
    assert abs(out["entropy"] - np.log(2)) < 1e-6 and out["normalized"] == 1.0
    # single class → zero entropy
    one = analytics.type_entropy(_events([(1, 1, "a", "2024-01-01", 0.0)])).iloc[0]
    assert one["entropy"] == 0.0 and one["normalized"] == 0.0


def test_rate_wilson_ci(ray_session):
    rows = [(i, 1, "hit" if i < 30 else "miss", "2024-01-01", 0.0) for i in range(100)]
    out = analytics.rate_wilson_ci(_events(rows))
    hit = out[out["event_type"] == "hit"].iloc[0]
    assert hit["rate"] == 0.3
    assert hit["lo"] < 0.3 < hit["hi"]
    # Wilson at n=100, p=0.3, z=1.96 ≈ [0.219, 0.396]
    assert abs(hit["lo"] - 0.2189) < 0.005 and abs(hit["hi"] - 0.3961) < 0.005


def test_equidepth_histogram(ray_session):
    rows = [(i, 1, "a", "2024-01-01", float(i)) for i in range(100)]
    out = analytics.equidepth_histogram(_events(rows), nbuckets=4)
    # values 0..99: quartile buckets hold ~25 each
    assert out["n"].sum() == 100 and len(out) == 4
    assert (out["n"] >= 24).all() and (out["n"] <= 26).all()
    assert out.iloc[3]["hi"] == 99.0


def test_geometric_mean(ray_session):
    rows = [(1, 1, "a", "2024-01-01", 2.0), (2, 1, "a", "2024-01-01", 8.0),
            (3, 1, "b", "2024-01-01", 5.0), (4, 1, "b", "2024-01-01", -1.0)]
    out = analytics.geometric_mean(_events(rows))
    m = dict(zip(out["event_type"], out["gmean"]))
    assert abs(m["a"] - 4.0) < 1e-6  # sqrt(2·8)
    assert abs(m["b"] - 5.0) < 1e-6  # negative excluded
    assert dict(zip(out["event_type"], out["n"]))["b"] == 1


def test_winsorize(ray_session):
    rows = [(i, 1, "a", "2024-01-01", float(v)) for i, v in enumerate([1, 2, 3, 4, 1000])]
    out = analytics.winsorize(_events(rows), lo_q=0.0, hi_q=0.5)
    # hi = median = 3.0 → values above clip to 3
    assert list(out["clipped"]) == [1.0, 2.0, 3.0, 3.0, 3.0]


def test_longest_streak(ray_session):
    rows = [
        (1, 1, "a", "2024-01-01 10:00", 0.0),
        (2, 1, "a", "2024-01-01 10:01", 0.0),
        (3, 1, "b", "2024-01-01 10:02", 0.0),
        (4, 1, "a", "2024-01-01 10:03", 0.0),
        # tie between first aa-run and bb-run → earliest wins
        (5, 2, "x", "2024-01-01 10:00", 0.0),
        (6, 2, "x", "2024-01-01 10:01", 0.0),
        (7, 2, "y", "2024-01-01 10:02", 0.0),
        (8, 2, "y", "2024-01-01 10:03", 0.0),
    ]
    out = analytics.longest_streak(_events(rows))
    m = {r["user_id"]: (r["event_type"], r["streak"]) for _, r in out.iterrows()}
    assert m[1] == ("a", 2)
    assert m[2] == ("x", 2)  # tie → earliest run start


def test_mann_whitney_u(ray_session):
    # a-values all above b-values → AUC = 1; reversed → 0
    rows = [(i, 1, "purchase", "2024-01-01", 100.0 + i) for i in range(5)]
    rows += [(10 + i, 1, "click", "2024-01-01", 1.0 + i) for i in range(4)]
    out = analytics.mann_whitney_u(_events(rows)).iloc[0]
    assert out["n_a"] == 5 and out["n_b"] == 4
    assert out["auc"] == 1.0 and out["u2_a"] == 2 * 5 * 4
    # ties split evenly: identical distributions → AUC = 0.5
    rows2 = [(i, 1, "purchase", "2024-01-01", 7.0) for i in range(3)]
    rows2 += [(10 + i, 1, "click", "2024-01-01", 7.0) for i in range(3)]
    out2 = analytics.mann_whitney_u(_events(rows2)).iloc[0]
    assert out2["auc"] == 0.5


def test_spearman(ray_session):
    # perfectly increasing values over time → rho = 1; decreasing → -1
    rows = [(i, 1, "up", f"2024-01-01 00:{i:02d}", float(i)) for i in range(10)]
    rows += [(20 + i, 1, "down", f"2024-01-01 00:{i:02d}", float(-i)) for i in range(10)]
    out = analytics.spearman_by_group(_events(rows))
    m = dict(zip(out["event_type"], out["rho"]))
    assert m["up"] == 1.0 and m["down"] == -1.0
    # constant values → NULL rho
    rows2 = [(i, 1, "flat", f"2024-01-01 00:{i:02d}", 5.0) for i in range(5)]
    out2 = analytics.spearman_by_group(_events(rows2))
    assert pd.isna(out2.iloc[0]["rho"]) or out2.iloc[0]["rho"] is None


def test_events_heatmap(ray_session):
    # 2024-01-01 is a Monday → dow 1; two events at 10:00, one Tue 03:00
    rows = [
        (1, 1, "a", "2024-01-01 10:00", 1.0),
        (2, 1, "a", "2024-01-01 10:30", 1.0),
        (3, 1, "a", "2024-01-02 03:00", 1.0),
    ]
    out = analytics.events_heatmap(_events(rows))
    assert len(out) == 168 and out["n"].sum() == 3
    g = out.set_index(["dow", "hod"])
    assert g.loc[(1, 10)]["n"] == 2
    assert g.loc[(2, 3)]["n"] == 1
    assert g.loc[(7, 23)]["n"] == 0


def test_k_anonymity(ray_session):
    # user 1 has 3 "view" rows (safe at k=3); users 2,3 have singletons
    rows = [
        (1, 1, "view", "2024-01-01 10:00", 1.0),
        (2, 1, "view", "2024-01-01 10:01", 1.0),
        (3, 1, "view", "2024-01-01 10:02", 1.0),
        (4, 2, "click", "2024-01-01 11:00", 1.0),
        (5, 3, "view", "2024-01-01 12:00", 1.0),
    ]
    out = analytics.k_anonymity(_events(rows), k=3)
    r = out.iloc[0]
    assert r["n_groups"] == 3 and r["n_risky_groups"] == 2
    assert r["risky_rows"] == 2 and r["total_rows"] == 5
    assert r["risk_share"] == 0.4


def test_l_diversity(ray_session):
    # (user 1, view): 3 events in ONE hour → homogeneous at l=2;
    # (user 2, view): 2 events across two hours → diverse
    rows = [
        (1, 1, "view", "2024-01-01 10:00", 1.0),
        (2, 1, "view", "2024-01-01 10:10", 1.0),
        (3, 1, "view", "2024-01-01 10:20", 1.0),
        (4, 2, "view", "2024-01-01 11:00", 1.0),
        (5, 2, "view", "2024-01-01 12:00", 1.0),
    ]
    ds = _events(rows)
    import pyarrow as pa2

    def add_hod(batch):
        us = batch["ts"].combine_chunks().cast(pa2.timestamp("us")).cast(pa2.int64())
        h = (us.to_numpy(zero_copy_only=False) // 3_600_000_000) % 24
        return pa2.table({"user_id": batch["user_id"], "event_type": batch["event_type"],
                          "hod": pa2.array(h, pa2.int64())})

    out = analytics.l_diversity(
        ds.map_batches(add_hod, batch_format="pyarrow"),
        group_cols=("user_id", "event_type"), sensitive_col="hod", l=2,
    )
    r = out.iloc[0]
    assert r["n_groups"] == 2 and r["n_homogeneous"] == 1
    assert r["exposed_rows"] == 3 and r["total_rows"] == 5
    assert r["exposed_share"] == 0.6


def test_theil_sen(ray_session):
    # hourly counts 2,4,6,8 → cumulative 2,6,12,20; pairwise slopes
    # [4,5,6,6,7,8] → lower median 6.0
    rows, eid = [], 0
    for h, cnt in enumerate([2, 4, 6, 8]):
        for _ in range(cnt):
            eid += 1
            rows.append((eid, 1, "a", f"2024-01-01 {10 + h}:00", 1.0))
    out = analytics.theil_sen(_events(rows))
    r = out.iloc[0]
    assert r["n_buckets"] == 4 and r["n_pairs"] == 6
    assert r["slope"] == 6.0


def test_psi_drift(ray_session):
    # early hours (10,11) values ~1; late hours (12,13) values ~9 → big PSI;
    # identical halves → PSI ≈ 0 (only smoothing noise)
    rows, eid = [], 0
    for h, v in [(10, 1.0), (11, 1.0), (12, 9.0), (13, 9.0)]:
        for _ in range(8):
            eid += 1
            rows.append((eid, 1, "a", f"2024-01-01 {h}:00", v))
    shifted = analytics.psi_drift(_events(rows))
    assert len(shifted) == 8
    assert shifted["psi"].iloc[0] > 1.0  # full mass moved across bins
    same = [(i + 1, 1, "a", f"2024-01-01 {10 + (i % 4)}:00", float(i % 5))
            for i in range(40)]
    stable = analytics.psi_drift(_events(same))
    assert abs(stable["psi"].iloc[0]) < 0.05


def test_variable_width_histogram(ray_session):
    # two tight value groups → k=2 buckets land exactly on them
    vals = [1.0, 1.0, 1.0, 10.0, 10.0, 10.0]
    rows = [(i + 1, 1, "a", "2024-01-01 10:00", v) for i, v in enumerate(vals)]
    out = analytics.variable_width_histogram(_events(rows), k=2, iters=2)
    assert len(out) == 2
    lo, hi = out.iloc[0], out.iloc[1]
    assert lo["n"] == 3 and lo["min_value"] == 1.0 and lo["max_value"] == 1.0
    assert lo["centroid"] == 1.0
    assert hi["n"] == 3 and hi["centroid"] == 10.0


def test_holt_forecast(ray_session):
    # counts 2,4,6,8 per hour — perfectly linear, Holt recovers it exactly
    rows, eid = [], 0
    for h, cnt in enumerate([2, 4, 6, 8]):
        for _ in range(cnt):
            eid += 1
            rows.append((eid, 1, "lin", f"2024-01-01 {10 + h}:00", 1.0))
    rows.append((99, 1, "solo", "2024-01-01 10:00", 1.0))  # 1 bucket → omitted
    out = analytics.holt_forecast(_events(rows))
    assert list(out["event_type"]) == ["lin"]
    r = out.iloc[0]
    assert r["n_buckets"] == 4
    assert r["level"] == 8.0 and r["trend"] == 2.0
    assert (r["f1"], r["f2"], r["f3"]) == (10.0, 12.0, 14.0)


def test_frequent_itemsets(ray_session):
    # users 1,2 have {view,click}; user 3 only {view,purchase} (support 1)
    rows = [
        (1, 1, "view", "2024-01-01 10:00", 1.0),
        (2, 1, "click", "2024-01-01 10:01", 1.0),
        (3, 1, "click", "2024-01-01 10:02", 1.0),  # dup type, one support
        (4, 2, "view", "2024-01-01 11:00", 1.0),
        (5, 2, "click", "2024-01-01 11:01", 1.0),
        (6, 3, "view", "2024-01-01 12:00", 1.0),
        (7, 3, "purchase", "2024-01-01 12:01", 1.0),
    ]
    out = analytics.frequent_itemsets(_events(rows), min_support=2)
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["type_a"], r["type_b"], r["support"]) == ("click", "view", 2)
    all_pairs = analytics.frequent_itemsets(_events(rows), min_support=1)
    assert len(all_pairs) == 2  # (click,view):2 and (purchase,view):1


def test_benford_value(ray_session):
    vals = [1.0, 1.5, 2.0, 9.0, 0.0, -3.0]  # digits 1,1,2,9; zero/neg excluded
    rows = [(i + 1, 1, "a", "2024-01-01 10:00", v) for i, v in enumerate(vals)]
    out = analytics.benford_value(_events(rows))
    assert list(out["digit"]) == list(range(1, 10))
    assert list(out["n"]) == [2, 1, 0, 0, 0, 0, 0, 0, 1]
    assert out.iloc[0]["ratio"] == 0.5 and out.iloc[1]["ratio"] == 0.25
    assert out.iloc[0]["expected"] == 0.30103  # log10(2)


def test_anova_f(ray_session):
    # a: 1,2,3  b: 5,6,7 → SSB=24.0, SSW=4.0 (value²), F = 24/(4/4) = 24
    rows = [(i + 1, 1, t, "2024-01-01 10:00", v)
            for i, (t, v) in enumerate([("a", 1.0), ("a", 2.0), ("a", 3.0),
                                        ("b", 5.0), ("b", 6.0), ("b", 7.0)])]
    out = analytics.anova_f(_events(rows))
    r = out.iloc[0]
    assert r["n"] == 6 and r["k"] == 2
    assert r["ss_between"] == 24.0 and r["ss_within"] == 4.0
    assert r["f"] == 24.0


def test_kendall_hourly(ray_session):
    # "up" volume rises with hour, "down" falls → perfectly anti-ranked
    rows, eid = [], 0
    for h in range(24):
        for t, cnt in (("up", h), ("down", 23 - h)):
            for _ in range(cnt):
                eid += 1
                rows.append((eid, 1, t, f"2024-01-01 {h:02d}:30", 1.0))
    out = analytics.kendall_hourly(_events(rows), types=("down", "up"))
    r = out.iloc[0]
    assert (r["type_a"], r["type_b"]) == ("down", "up")
    assert r["concordant"] == 0 and r["discordant"] == 276
    assert r["tau"] == -1.0


def test_change_point(ray_session):
    # type "a": hourly counts 1,1,5,5 → level shift after hour 11 (pos 2)
    rows, eid = [], 0
    for hour, cnt in [(10, 1), (11, 1), (12, 5), (13, 5)]:
        for _ in range(cnt):
            eid += 1
            rows.append((eid, 1, "a", f"2024-01-01 {hour}:00", 1.0))
    rows.append((99, 1, "solo", "2024-01-01 10:00", 1.0))  # 1 bucket → omitted
    out = analytics.change_point(_events(rows))
    assert list(out["event_type"]) == ["a"]
    r = out.iloc[0]
    # S=[1,2,7,12]; dev=|4·S_i − i·12| = [8,16,8] → max at pos 2
    assert r["cp_pos"] == 2 and r["n_buckets"] == 4 and r["total"] == 12
    assert r["cp_hour"] == pd.Timestamp("2024-01-01 11:00").value // 10**9 // 3600
    assert r["stat"] == 0.333333  # 16/48 half-up fixed at 1e6


def test_autocorr_lag1(ray_session):
    # strictly increasing series → strong positive lag-1 correlation
    rows = [(i, 1, "up", f"2024-01-01 00:{i:02d}", float(i)) for i in range(20)]
    # alternating series → negative lag-1 correlation
    rows += [(40 + i, 1, "alt", f"2024-01-01 00:{i:02d}", float(i % 2)) for i in range(20)]
    out = analytics.autocorr_lag1(_events(rows))
    m = dict(zip(out["event_type"], out["r"]))
    assert m["up"] > 0.9
    assert m["alt"] < -0.9
    # constant series → NULL
    flat = [(i, 1, "flat", f"2024-01-01 00:{i:02d}", 3.0) for i in range(5)]
    o2 = analytics.autocorr_lag1(_events(flat))
    assert pd.isna(o2.iloc[0]["r"]) or o2.iloc[0]["r"] is None


def test_rfm_scores(ray_session):
    rows = []
    # user u: u events, each value u, latest ts grows with u
    for u in range(1, 6):
        for e in range(u):
            rows.append((u * 10 + e, u, "view", f"2024-01-0{u} 10:0{e}", float(u)))
    out = analytics.rfm_scores(_events(rows), n_tiles=5)
    # user 5 is best on every axis, user 1 worst
    top = out[out["user_id"] == 5].iloc[0]
    bot = out[out["user_id"] == 1].iloc[0]
    assert (top["r"], top["f"], top["m"]) == (5, 5, 5) and top["rfm"] == 555
    assert (bot["r"], bot["f"], bot["m"]) == (1, 1, 1) and bot["rfm"] == 111


def test_abc_classification(ray_session):
    # user 1 owns 80%, user 2 next 15%, user 3 the last 5%
    rows = [(1, 1, "v", "2024-01-01", 80.0), (2, 2, "v", "2024-01-01", 15.0), (3, 3, "v", "2024-01-01", 5.0)]
    out = analytics.abc_classification(_events(rows))
    m = {r["class"]: (r["n_keys"], r["value_micros"]) for _, r in out.iterrows()}
    assert m["A"] == (1, 80_000_000)
    assert m["B"] == (1, 15_000_000)
    assert m["C"] == (1, 5_000_000)
    assert list(out["class"]) == ["A", "B", "C"]


def test_extreme_events(ray_session):
    rows = [
        (1, 1, "a", "2024-01-01", 5.0),
        (2, 1, "a", "2024-01-01", 9.0),
        (3, 1, "a", "2024-01-01", 9.0),  # tie on max → smaller id wins
        (4, 1, "a", "2024-01-01", 1.0),
    ]
    out = analytics.extreme_events(_events(rows)).iloc[0]
    assert out["max_id"] == 2 and out["max_value"] == 9.0
    assert out["min_id"] == 4 and out["min_value"] == 1.0


def test_schema_profile(ray_session):
    import pyarrow as pa
    import ray.data as rd

    t = pa.table(
        {
            "a": pa.array([1, 1, 2, None], pa.int64()),
            "b": pa.array(["x", "y", "y", "y"]),
        }
    )
    out = analytics.schema_profile(rd.from_arrow(t).repartition(3), columns=("a", "b"))
    m = {r["column"]: r for _, r in out.iterrows()}
    assert m["a"]["n_total"] == 4 and m["a"]["n_null"] == 1 and m["a"]["n_distinct"] == 2
    assert m["b"]["n_null"] == 0 and m["b"]["n_distinct"] == 2
    assert list(out["column"]) == ["a", "b"]  # declared order preserved


def test_variable_width_histogram_negative_oracle(ray_session):
    # negative values make the centroid-update numerator negative: Python //
    # floors while DuckDB // truncates toward zero — the engine must mirror
    # truncation or 1e-6-fixed-point centroids diverge by 1 (ADVICE r3)
    import duckdb

    vals = [-8.87, -8.86, -8.85, -0.31, -0.29, 4.75, 4.77, 9.99]
    rows = [(i + 1, 1, "a", "2024-01-01 10:00", v) for i, v in enumerate(vals)]
    out = analytics.variable_width_histogram(_events(rows), k=4, iters=3)
    con = duckdb.connect()
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "ts", "value"])
    df["ts"] = pd.to_datetime(df["ts"])
    con.register("events", df)
    exp = con.execute(analytics.variable_width_histogram_sql("events", k=4, iters=3)).fetchdf()
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    assert (out["centroid"] < 0).any()


def test_anova_f_large_values_oracle(ray_session):
    # |value| > ~9e5: centi y*y exceeds 2^53, float64 bincount weights lose
    # integer exactness — the partials must accumulate Σy² with exact
    # integer arithmetic (ADVICE r3)
    import duckdb

    vals = [("a", 9_000_001.37), ("a", 9_000_003.91), ("a", 9_000_000.13),
            ("b", -9_000_002.71), ("b", -9_000_001.03), ("b", -9_000_004.59)]
    rows = [(i + 1, 1, t, "2024-01-01 10:00", v) for i, (t, v) in enumerate(vals)]
    out = analytics.anova_f(_events(rows))
    con = duckdb.connect()
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "ts", "value"])
    df["ts"] = pd.to_datetime(df["ts"])
    con.register("events", df)
    exp = con.execute(analytics.anova_f_sql("events")).fetchdf()
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    assert out.iloc[0]["f"] is not None


def test_hot_keys_oracle(ray_session):
    import duckdb

    rows = [(i + 1, i % 7 if i % 3 else 0, "a", "2024-01-01 10:00", 1.0)
            for i in range(120)]  # user 0 is hot (every 3rd event + its share)
    out = analytics.hot_keys(_events(rows), top_n=5)
    con = duckdb.connect()
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "ts", "value"])
    df["ts"] = pd.to_datetime(df["ts"])
    con.register("events", df)
    exp = con.execute(analytics.hot_keys_sql("events", top_n=5)).fetchdf()
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    assert out.iloc[0]["key"] == "0" and out.iloc[0]["salt"] > 1


def test_rate_limit_violations_oracle(ray_session):
    import duckdb

    rng = np.random.default_rng(5)
    n = 400
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 9, n),
        "event_type": "x",
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 30000, n), unit="s"),
        "value": 1.0,
    })
    df.loc[5:12, "ts"] = df.loc[5, "ts"]  # same-microsecond peers (RANGE frame)
    import ray.data as rd

    out = analytics.rate_limit_violations(
        rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)), max_events=3
    )
    con = duckdb.connect()
    con.register("events", df)
    exp = con.execute(
        analytics.rate_limit_violations_sql("events", max_events=3)
    ).fetchdf()
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    assert len(out) > 10
    # partition-independence
    again = analytics.rate_limit_violations(
        rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(7),
        max_events=3,
    )
    pd.testing.assert_frame_equal(out, again, check_dtype=False)


def test_touch_attribution_oracle(ray_session):
    import duckdb
    import ray.data as rd

    rng = np.random.default_rng(11)
    n = 500
    types = np.array(["click", "purchase", "view"])[rng.integers(0, 3, n)]
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 15, n),
        "event_type": types,
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 14 * 86400, n), unit="s"),
        "value": 1.0,
    })
    # same-microsecond touch+conversion pair: excluded on both sides
    df.loc[0, ["event_type", "ts"]] = ["click", df.loc[1, "ts"]]
    df.loc[1, "event_type"] = "purchase"
    df.loc[1, "user_id"] = df.loc[0, "user_id"]
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = analytics.touch_attribution(ds, window_us=3 * 86400 * 1_000_000)
    con = duckdb.connect()
    con.register("events", df)
    exp = con.execute(
        analytics.touch_attribution_sql("events", window_us=3 * 86400 * 1_000_000)
    ).fetchdf()
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    assert len(out) > 20
    assert (out["first_touch"] != out["last_touch"]).any()  # multi-touch exists
    again = analytics.touch_attribution(
        ds.repartition(7), window_us=3 * 86400 * 1_000_000
    )
    pd.testing.assert_frame_equal(out, again, check_dtype=False)


def test_retention_matrix_oracle(ray_session):
    import duckdb
    import ray.data as rd

    rng = np.random.default_rng(21)
    n = 600
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 30, n),
        "event_type": "x",
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 60 * 86400, n), unit="s"),
        "value": 1.0,
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = analytics.retention_matrix(ds)
    con = duckdb.connect()
    con.register("events", df)
    exp = con.execute(analytics.retention_matrix_sql("events")).fetchdf()
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    # offset-0 retention is 1 by construction
    z = out[out["week_offset"] == 0]
    assert (z["retention"] == 1.0).all() and len(z) >= 2
    assert (out["week_offset"] > 0).any()
    again = analytics.retention_matrix(ds.repartition(7))
    pd.testing.assert_frame_equal(out, again, check_dtype=False)


def test_seasonal_decompose_oracle(ray_session):
    import duckdb
    import ray.data as rd

    rng = np.random.default_rng(31)
    # strong diurnal pattern + linear trend + noise over 14 days
    rows, eid = [], 0
    for d in range(14):
        for h in range(24):
            lam = 3 + 2 * np.sin(2 * np.pi * h / 24) + 0.1 * d
            for _ in range(int(rng.poisson(max(lam, 0.1)))):
                eid += 1
                rows.append((eid, 1, "x", f"2024-01-{d + 1:02d} {h:02d}:30", 1.0))
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "ts", "value"])
    df["ts"] = pd.to_datetime(df["ts"])
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = analytics.seasonal_decompose(ds)
    con = duckdb.connect()
    con.register("events", df)
    exp = con.execute(analytics.seasonal_decompose_sql("events")).fetchdf()
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    # decomposition identity holds exactly in fixed point
    np.testing.assert_allclose(
        out["y"], out["seasonal"] + out["trend"] + out["remainder"], atol=1e-9
    )
    # the diurnal signal is captured: seasonal varies across phases
    assert out.groupby("phase")["seasonal"].first().std() > 0.5
    again = analytics.seasonal_decompose(ds.repartition(6))
    pd.testing.assert_frame_equal(out, again, check_dtype=False)


def test_ab_conversion_test_oracle(ray_session):
    import duckdb
    import ray.data as rd

    rng = np.random.default_rng(41)
    n = 800
    uid = rng.integers(0, 120, n)
    # variant 1 users convert more often
    conv_p = np.where(uid % 2 == 1, 0.25, 0.10)
    types = np.where(rng.random(n) < conv_p, "purchase", "view")
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": uid,
        "event_type": types,
        "ts": pd.to_datetime("2024-01-01"),
        "value": 1.0,
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = analytics.ab_conversion_test(ds)
    con = duckdb.connect()
    con.register("events", df)
    exp = con.execute(analytics.ab_conversion_test_sql("events")).fetchdf()
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    assert len(out) == 2 and out.iloc[0]["z"] > 2.0  # planted lift detected
    again = analytics.ab_conversion_test(ds.repartition(5))
    pd.testing.assert_frame_equal(out, again, check_dtype=False)
