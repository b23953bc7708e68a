import numpy as np
import pandas as pd
import pytest
import duckdb
import ray.data as rd

from harvester_ray.index import build, oracle, pipeline_aggs, query

QUERY = "kumo sabi"


def _corpus() -> pd.DataFrame:
    rng = np.random.default_rng(7)
    vocab = np.array([
        "kumo", "sabi", "tora", "yuki", "hana", "kaze", "mori", "umi",
        "sora", "hoshi", "tsuki", "ame", "niwa", "ishi", "kawa", "yama",
    ])
    n = 420
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(3, 12))))
        for _ in range(n)
    ]
    # timestamps over ~3 days so hourly buckets are plentiful and the
    # auto ladder picks a mid-rung interval
    base = np.datetime64("2024-03-01T00:00:00", "us")
    offs = rng.integers(0, 3 * 24 * 3600, size=n) * 1_000_000
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "ts": base + offs.astype("timedelta64[us]"),
        "conv_id": np.array([f"c{int(i)}" for i in rng.integers(0, 60, n)]),
        "tool": np.array([f"t{int(i)}" for i in rng.integers(0, 5, n)]),
    })


@pytest.fixture(scope="module")
def paidx(tmp_path_factory):
    df = _corpus()
    root = str(tmp_path_factory.mktemp("paidx"))
    build.build_index(
        rd.from_pandas(df), root, concurrency=2,
        attr_cols=["conv_id", "ts", "tool"],
    )
    return root, df


@pytest.fixture(scope="module")
def con(paidx):
    _, df = paidx
    c = duckdb.connect()
    c.register("tdocp", df)
    return c


def _cmp(got: pd.DataFrame, exp: pd.DataFrame):
    got = got.reset_index(drop=True)
    exp = exp.reset_index(drop=True)
    assert list(got.columns) == list(exp.columns)
    pd.testing.assert_frame_equal(
        got.astype({c: np.float64 for c in got.columns if got[c].dtype.kind == "f"}),
        exp.astype({c: np.float64 for c in exp.columns if exp[c].dtype.kind == "f"}),
        check_dtype=False,
    )


def test_moving_fn_oracle(paidx, con):
    root, _ = paidx
    r = query.IndexReader(root)
    got = pipeline_aggs.moving_fn(r, QUERY, window=3)
    exp = con.execute(oracle.moving_fn_sql("tdocp", QUERY, window=3)).fetchdf()
    _cmp(got, exp)
    assert len(got) > 5


def test_serial_diff_oracle(paidx, con):
    root, _ = paidx
    r = query.IndexReader(root)
    got = pipeline_aggs.serial_diff(r, QUERY, lag=2)
    exp = con.execute(oracle.serial_diff_sql("tdocp", QUERY, lag=2)).fetchdf()
    _cmp(got, exp)


def test_bucket_sort_oracle(paidx, con):
    root, _ = paidx
    r = query.IndexReader(root)
    got = pipeline_aggs.bucket_sort(r, QUERY, min_count=2, size=5)
    exp = con.execute(
        oracle.bucket_sort_sql("tdocp", QUERY, min_count=2, size=5)
    ).fetchdf()
    _cmp(got, exp)


def test_cumulative_cardinality_oracle(paidx, con):
    root, _ = paidx
    r = query.IndexReader(root)
    got = pipeline_aggs.cumulative_cardinality(r, QUERY, field="conv_id")
    exp = con.execute(
        oracle.cumulative_cardinality_sql("tdocp", QUERY, field="conv_id")
    ).fetchdf()
    _cmp(got, exp)
    # monotone, ends at the distinct count of matched convs
    assert got["cum_card"].is_monotonic_increasing


def test_weighted_avg_oracle(paidx, con):
    root, _ = paidx
    r = query.IndexReader(root)
    got = pipeline_aggs.weighted_avg(r, QUERY)
    exp = con.execute(oracle.weighted_avg_sql("tdocp", QUERY)).fetchdf()
    _cmp(got, exp)


def test_top_metrics_oracle(paidx, con):
    root, _ = paidx
    r = query.IndexReader(root)
    got = pipeline_aggs.top_metrics(r, QUERY, group="tool")
    exp = con.execute(oracle.top_metrics_sql("tdocp", QUERY, group="tool")).fetchdf()
    _cmp(got, exp)


def test_diversified_sampler_oracle(paidx, con):
    root, _ = paidx
    r = query.IndexReader(root)
    got = pipeline_aggs.diversified_sampler(
        r, QUERY, field="conv_id", max_per=1, k=10
    )
    exp = con.execute(
        oracle.diversified_sampler_sql("tdocp", QUERY, field="conv_id", max_per=1, k=10)
    ).fetchdf()
    _cmp(got, exp)
    # diversity invariant: no repeated key
    assert got["conv_id"].is_unique


def test_diversified_differs_from_plain(paidx):
    root, df = paidx
    r = query.IndexReader(root)
    got = pipeline_aggs.diversified_sampler(
        r, QUERY, field="conv_id", max_per=1, k=10
    )
    plain = r.search(QUERY, k=10, mode="or").to_pandas()
    convs = df.set_index("doc_id").loc[plain["doc_id"], "conv_id"]
    if convs.is_unique:
        pytest.skip("fixture produced no duplicate conv in plain top-k")
    assert list(got["doc_id"]) != list(plain["doc_id"])


def test_auto_date_histogram_oracle(paidx, con):
    root, _ = paidx
    r = query.IndexReader(root)
    got = pipeline_aggs.auto_date_histogram(r, QUERY, target_buckets=20)
    exp = con.execute(
        oracle.auto_date_histogram_sql("tdocp", QUERY, target_buckets=20)
    ).fetchdf()
    _cmp(got, exp)
    assert len(got) <= 20
    # 3-day span at <=20 buckets should choose the 3h or 12h rung,
    # never the 1-minute base or the 7-day cap
    iv = int(got["interval_us"].iloc[0])
    assert 3_600_000_000 <= iv <= 86_400_000_000


# --- bucket_script + normalize ---------------------------------------------


@pytest.fixture(scope="module")
def nulltool_idx(tmp_path_factory):
    """Corpus where ~half the rows have tool=NULL, so the bucket_script
    ratio actually varies (the shared fixture's tool is never null)."""
    rng = np.random.default_rng(11)
    df = _corpus().copy()
    mask = rng.random(len(df)) < 0.55
    df["tool"] = df["tool"].where(~mask, None)
    root = str(tmp_path_factory.mktemp("ntidx"))
    build.build_index(
        rd.from_pandas(df), root, concurrency=2,
        attr_cols=["conv_id", "ts", "tool"],
    )
    c = duckdb.connect()
    c.register("tdocp", df)
    return root, c


def test_bucket_script_matches_oracle(nulltool_idx):
    root, c = nulltool_idx
    got = pipeline_aggs.bucket_script(
        query.IndexReader(root), QUERY, tool_field="tool", ts_field="ts",
        mode="or",
    )
    exp = c.execute(
        oracle.bucket_script_sql("tdocp", QUERY, tool_col="tool", ts_col="ts", mode="or")
    ).fetchdf()
    _cmp(got, exp)
    # non-degenerate: the share varies and is strictly inside (0,1) somewhere
    assert got["tool_share"].nunique() > 1
    assert ((got["tool_share"] > 0) & (got["tool_share"] < 1)).any()


def test_normalize_matches_oracle(paidx, con):
    root, _ = paidx
    got = pipeline_aggs.normalize_agg(
        query.IndexReader(root), QUERY, ts_field="ts", mode="or"
    )
    exp = con.execute(
        oracle.normalize_agg_sql("tdocp", QUERY, ts_col="ts", mode="or")
    ).fetchdf()
    _cmp(got, exp)
    # percentages cover the whole histogram (fixed-point sum ≈ 100)
    assert abs(got["percent_of_sum"].sum() - 100.0) < 0.01
    assert (got["percent_of_sum"] > 0).all()


def test_moving_percentiles_matches_oracle(paidx, con):
    root, _ = paidx
    got = pipeline_aggs.moving_percentiles(
        query.IndexReader(root), QUERY, window=4, q=0.25, ts_field="ts"
    )
    exp = con.execute(
        oracle.moving_percentiles_sql("tdocp", QUERY, window=4, q=0.25, ts_col="ts")
    ).fetchdf()
    _cmp(got, exp)
    assert got["moving_pct"].notna().all()


def test_extended_stats_bucket_matches_oracle(paidx, con):
    root, _ = paidx
    got = pipeline_aggs.extended_stats_bucket(
        query.IndexReader(root), QUERY, ts_field="ts"
    )
    exp = con.execute(
        oracle.extended_stats_bucket_sql("tdocp", QUERY, ts_col="ts")
    ).fetchdf()
    _cmp(got, exp)
    r = got.iloc[0]
    assert r.variance >= 0 and r.min_count <= r.avg_count <= r.max_count


def test_bucket_selector_oracle(paidx, con):
    root, _ = paidx
    r = query.IndexReader(root)
    got = pipeline_aggs.bucket_selector(r, QUERY, min_docs=2)
    exp = con.execute(
        oracle.bucket_selector_sql("tdocp", QUERY, min_docs=2)
    ).fetchdf()
    _cmp(got, exp)
    # the predicate genuinely drops buckets (this corpus is all-tool rows,
    # so the share clause passes — min_docs does the filtering)
    full = pipeline_aggs.bucket_script(r, QUERY)
    assert 0 < len(got) < len(full)


def test_percentiles_bucket_oracle(paidx, con):
    root, _ = paidx
    r = query.IndexReader(root)
    got = pipeline_aggs.percentiles_bucket(r, QUERY)
    exp = con.execute(oracle.percentiles_bucket_sql("tdocp", QUERY)).fetchdf()
    _cmp(got, exp)
    assert got.iloc[0]["n_buckets"] > 5
    assert got.iloc[0]["p25"] <= got.iloc[0]["p50"] <= got.iloc[0]["p75"]


def test_percentiles_bucket_empty_matches_oracle(paidx, con):
    # a query matching no documents: the oracle's single aggregate SELECT
    # always yields one row (n_buckets=0, NULL percentiles) — the engine
    # must mirror that, not return a 0-row frame (ADVICE r3)
    root, _ = paidx
    r = query.IndexReader(root)
    got = pipeline_aggs.percentiles_bucket(r, "zzzznomatch")
    exp = con.execute(oracle.percentiles_bucket_sql("tdocp", "zzzznomatch")).fetchdf()
    _cmp(got, exp)
    assert len(got) == 1 and got.iloc[0]["n_buckets"] == 0
    assert np.isnan(got.iloc[0]["p50"])
